"""Int8 quantized matmul path for serving.

Beyond-parity speed: v5e's MXU runs int8 x int8 -> int32 at 2x the bf16
rate (394 vs 197 TOPS).  The FFN branches hold ~75% of ONE-PEACE's
FLOPs; quantizing them (weights offline per-output-channel, activations
dynamically per-row) trades ~1e-2 relative error for throughput.  Opt-in:
``EncoderConfig.quantize_ffn`` + ``quantize_ffn_params`` at load time.

Scheme: symmetric absmax.  y = (x_q @ w_q) * (sx * sw) + b, accumulated
in int32, rescaled in fp32.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """(in, out) weight -> int8 weight + per-output-channel fp32 scale."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": wq, "w_scale": scale[0]}


def _use_pallas_int8() -> bool:
    """XLA's int8 dot is the default: on the FFN-bound 8-layer PROXY it
    measured 968.6 vs 784.5 img/s (+23%); in the FULL 4B model the win
    is +8.7% image / +17.9% audio (r5 bench, PARITY.md) — XLA fuses the
    requant/dequant into neighbors.
    The Pallas kernel (quant_pallas.py) wins isolated K-heavy matmuls
    (41.4 vs 25.6 TFLOPs at K=6144) but loses in-model (890 img/s);
    ONE_PEACE_INT8_IMPL=pallas keeps it selectable for experiments."""
    import os

    return os.environ.get("ONE_PEACE_INT8_IMPL", "xla") == "pallas"


def quantized_linear(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: x (..., in) -> (..., out)."""
    orig_shape = x.shape
    xf = x.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    if _use_pallas_int8():
        from .quant_pallas import int8_matmul

        y = int8_matmul(xq, params["w_q"], sx[:, 0], params["w_scale"],
                        out_dtype=jnp.float32)
    else:
        acc = jax.lax.dot_general(
            xq, params["w_q"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * params["w_scale"][None, :]
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.reshape(orig_shape[:-1] + (params["w_q"].shape[1],)).astype(x.dtype)


def quantize_ffn_params(params, include_attn: bool = False):
    """Convert every stacked FFN projection (wi_0/wi_1/wo of each modality
    branch) in an encoder-wrapper param tree to int8.  Leaves the rest of
    the model in bf16/fp32.  Works on stacked (layers, in, out) weights by
    vmapping the per-layer quantizer.

    ``include_attn`` also converts the encoder self-attention projections
    (q/k/v/out_proj — another ~25% of the projection FLOPs); per-head
    gains / Magneto LN stay full precision."""

    def convert_lin(lin):
        quant = quantize_weight if lin["w"].ndim == 2 \
            else jax.vmap(quantize_weight)
        q = quant(lin["w"])
        newlin = {"w_q": q["w_q"], "w_scale": q["w_scale"]}
        if "b" in lin:
            newlin["b"] = lin["b"]
        return newlin

    def convert_block(block, names):
        out = dict(block)
        for name in names:
            if name in block:
                out[name] = convert_lin(block[name])
        return out

    def walk(tree):
        if isinstance(tree, dict):
            new = {}
            for k, v in tree.items():
                if k.endswith("_ffn") and isinstance(v, dict) and "wi_0" in v:
                    new[k] = convert_block(v, ("wi_0", "wi_1", "wo"))
                elif (include_attn and k == "self_attn"
                      and isinstance(v, dict) and "q_proj" in v):
                    new[k] = convert_block(
                        v, ("q_proj", "k_proj", "v_proj", "out_proj"))
                else:
                    new[k] = walk(v)
            return new
        return tree

    return walk(params)


def is_quantized(lin_params) -> bool:
    return isinstance(lin_params, dict) and "w_q" in lin_params
