"""Fusion transformer encoder.

40 identical layers over the concatenated modality sequence, each with:
sub-LN attention (optional Magneto LN before out-proj, optional post-attn LN),
per-modality GeGLU FFN branches selected by encoder type, LayerScale and
DropPath.  Behavioral spec: ref one_peace/models/transformer/
transformer_layer.py:91-228 and transformer_encoder.py:23-232.

TPU-first design:
- layer parameters are *stacked* (leading ``layers`` axis) and the depth
  loop is a single ``jax.lax.scan`` — one traced layer body, 40x less XLA
  program, and the natural layout for pjit parameter sharding;
- the relative-position bias is carried batch-independent (H, L, L) and
  combined with the (B, L) key-padding mask inside the attention op —
  the reference instead materializes a (B, 24, L, L) fp32 tensor per layer
  (transformer_encoder.py:148-162);
- per-modality FFN routing on the concatenated sequence uses static split
  points (the reference slices with dynamic seq lens,
  transformer_layer.py:210-217 — static per batch shape under jit);
- activation rematerialization via ``jax.checkpoint`` on the scan body.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..core.config import EncoderConfig
from ..ops.attention import multihead_attention
from .components import (
    dropout,
    drop_path,
    gelu,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    trunc_normal,
)


def init_encoder_layer(key, cfg: EncoderConfig, dtype=jnp.float32):
    """One layer's parameter tree.

    Linear weights use trunc_normal(0.02) — the reference re-initializes
    every nn.Linear via init_one_peace_params (ref one_peace_base.py:262-274)
    after module construction.
    """
    d, f = cfg.embed_dim, cfg.ffn_embed_dim
    keys = jax.random.split(key, 16)

    def tn_linear(k, din, dout, bias=True):
        p = {"w": trunc_normal(k, (din, dout), dtype=dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    attn = {
        "q_proj": tn_linear(keys[0], d, d),
        "k_proj": tn_linear(keys[1], d, d, bias=False),
        "v_proj": tn_linear(keys[2], d, d),
        "out_proj": tn_linear(keys[3], d, d),
    }
    if cfg.scale_heads:
        attn["c_attn"] = jnp.ones((cfg.attention_heads,), dtype)
    if cfg.magneto_scale_attn:
        attn["ln"] = init_layer_norm(d, dtype)

    params = {
        "self_attn": attn,
        "self_attn_layer_norm": init_layer_norm(d, dtype),
        "final_layer_norm": init_layer_norm(d, dtype),
    }
    if cfg.scale_attn:
        params["attn_ln"] = init_layer_norm(d, dtype)

    def geglu_ffn(k1, k2, k3):
        ffn = {
            "wi_0": tn_linear(k1, d, f, bias=False),
            "wi_1": tn_linear(k2, d, f, bias=False),
            "wo": tn_linear(k3, f, d),
        }
        if cfg.scale_fc:
            ffn["ffn_ln"] = init_layer_norm(f, dtype)
        return ffn

    if cfg.use_text_moe:
        params["text_ffn"] = geglu_ffn(keys[4], keys[5], keys[6])
    if cfg.use_image_moe:
        params["image_ffn"] = geglu_ffn(keys[7], keys[8], keys[9])
    if cfg.use_audio_moe:
        params["audio_ffn"] = geglu_ffn(keys[10], keys[11], keys[12])

    if cfg.use_layer_scale:
        params["gamma_1"] = jnp.full((d,), cfg.layer_scale_init_value, dtype)
        params["gamma_2"] = jnp.full((d,), cfg.layer_scale_init_value, dtype)
    return params


# NOTE: a fused-projection variant (qkv as ONE (d, 3d) matmul + GeGLU
# wi_0|wi_1 as ONE (d, 2f) matmul, packed-qkv Pallas reads) was gated on
# the real chip 2026-08-20 and REJECTED: bit-exact, but -7% proxy fwd
# (764.9 vs 824.6 img/s) and the per-step traced weight concats (jit
# arguments, scanned per layer — XLA cannot hoist them) OOMed the
# training graph.  Measurement record in PARITY.md.


def _attention(params, cfg: EncoderConfig, x, rel_bias, key_padding_mask,
               deterministic, rng):
    """ref: multihead_attention.py:68-126 (fused-qkv xformers path semantics:
    k_proj has no bias; fp32 softmax; optional per-head gain + Magneto LN).

    Projections dispatch to the int8 path when the params were converted
    by ops.quant.quantize_ffn_params(include_attn=True) (serving mode)."""
    from ..ops.quant import is_quantized, quantized_linear

    b, l, d = x.shape
    h = cfg.attention_heads
    hd = d // h
    from jax.ad_checkpoint import checkpoint_name

    lin = quantized_linear if is_quantized(params["q_proj"]) else linear
    # named so remat_policy='qkv' can save the projections across the
    # layer-scan checkpoint (the bwd replay then skips the three qkv
    # dots; the attention kernel still replays — its vjp residuals
    # include the fwd output/normalizer, which are not saved)
    q = checkpoint_name(lin(params["q_proj"], x), "qkv").reshape(b, l, h, hd)
    k = checkpoint_name(lin(params["k_proj"], x), "qkv").reshape(b, l, h, hd)
    v = checkpoint_name(lin(params["v_proj"], x), "qkv").reshape(b, l, h, hd)
    attn = multihead_attention(
        q, k, v, rel_bias, key_padding_mask, scaling=hd**-0.5,
        impl=cfg.attn_impl)
    attn = attn.reshape(b, l, d)
    if "c_attn" in params:
        attn = (attn.reshape(b, l, h, hd) * params["c_attn"][:, None]).reshape(b, l, d)
    if "ln" in params:
        attn = layer_norm(params["ln"], attn)
    lin_o = quantized_linear if is_quantized(params["out_proj"]) else linear
    return lin_o(params["out_proj"], attn)


def _geglu_ffn(params, x, act_dropout, deterministic, rng):
    """ref: transformer_layer.py:54-67,149-157.

    Projections dispatch to the int8 path when the params were converted
    by ops.quant.quantize_ffn_params (serving mode)."""
    from ..ops.quant import is_quantized, quantized_linear

    lin = quantized_linear if is_quantized(params["wi_0"]) else linear
    y = gelu(lin(params["wi_0"], x)) * lin(params["wi_1"], x)
    y = dropout(rng, y, act_dropout, deterministic)
    if "ffn_ln" in params:
        y = layer_norm(params["ffn_ln"], y)
    lin_o = quantized_linear if is_quantized(params["wo"]) else linear
    return lin_o(params["wo"], y)


def encoder_layer(
    params,
    cfg: EncoderConfig,
    x: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],
    rel_bias: Optional[jnp.ndarray],
    encoder_type: str,
    split_lens: Tuple[int, int, int],
    drop_path_rate,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
):
    """One transformer layer (ref: transformer_layer.py:165-228).

    ``split_lens`` = (text_len, image_len, audio_len) static split points for
    multi-modal FFN routing; ``drop_path_rate`` may be a traced scalar
    (scanned over the per-layer linspace).
    """
    text_len, image_len, audio_len = split_lens
    if rng is not None and not deterministic:
        rngs = list(jax.random.split(rng, 6))
    else:
        rngs = [None] * 6

    # --- self attention block
    residual = x
    y = layer_norm(params["self_attn_layer_norm"], x)
    y = _attention(params["self_attn"], cfg, y, rel_bias, key_padding_mask,
                   deterministic, rngs[0])
    if "attn_ln" in params:
        y = layer_norm(params["attn_ln"], y)
    y = dropout(rngs[1], y, cfg.dropout, deterministic)
    if "gamma_1" in params:
        y = y * params["gamma_1"]
    y = drop_path(rngs[2], y, drop_path_rate, deterministic)
    x = residual + y

    # --- FFN block (per-modality branch)
    residual = x
    y = layer_norm(params["final_layer_norm"], x)
    ffn = partial(_geglu_ffn, act_dropout=cfg.activation_dropout,
                  deterministic=deterministic, rng=rngs[3])
    if encoder_type == "text":
        y = ffn(params["text_ffn"], y)
    elif encoder_type == "image":
        y = ffn(params["image_ffn"], y)
    elif encoder_type == "audio":
        y = ffn(params["audio_ffn"], y)
    elif encoder_type == "vl":
        y = jnp.concatenate(
            [ffn(params["text_ffn"], y[:, :text_len]),
             ffn(params["image_ffn"], y[:, text_len:])], axis=1)
    elif encoder_type == "al":
        y = jnp.concatenate(
            [ffn(params["text_ffn"], y[:, :text_len]),
             ffn(params["audio_ffn"], y[:, text_len:])], axis=1)
    elif encoder_type == "val":
        y = jnp.concatenate(
            [ffn(params["text_ffn"], y[:, :text_len]),
             ffn(params["image_ffn"], y[:, text_len:text_len + image_len]),
             ffn(params["audio_ffn"], y[:, text_len + image_len:])], axis=1)
    else:
        raise NotImplementedError(encoder_type)
    y = dropout(rngs[4], y, cfg.dropout, deterministic)
    if "gamma_2" in params:
        y = y * params["gamma_2"]
    y = drop_path(rngs[5], y, drop_path_rate, deterministic)
    return residual + y


class FusionEncoder:
    """The shared multi-modal transformer (ref: transformer_encoder.py)."""

    def __init__(self, cfg: EncoderConfig, use_text_norm=True, use_image_norm=True,
                 use_audio_norm=True):
        self.cfg = cfg
        self.use_text_norm = cfg.use_text_moe and use_text_norm
        self.use_image_norm = cfg.use_image_moe and use_image_norm
        self.use_audio_norm = cfg.use_audio_moe and use_audio_norm
        # stochastic-depth schedule (ref: transformer_encoder.py:53)
        self.dpr = np.linspace(0, cfg.drop_path_rate, cfg.layers, dtype=np.float32)
        # pipeline parallelism (set via enable_pipeline; None = plain scan)
        self.pp_mesh = None
        self.pp_micro_batches = 1

    def enable_pipeline(self, mesh, num_micro_batches: int) -> None:
        """Route the layer stack through GPipe over the mesh's ``pp`` axis
        (parallel/pipeline.py).  The stacked layer params must be sharded
        P('pp', ...) on the leading axis (sharding.py param_specs(pp=True))."""
        assert self.cfg.layers % mesh.shape["pp"] == 0, (
            self.cfg.layers, mesh.shape["pp"])
        self.pp_mesh = mesh
        self.pp_micro_batches = num_micro_batches

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        layer_keys = jax.random.split(key, cfg.layers + 1)
        stacked = jax.vmap(
            lambda k: init_encoder_layer(k, cfg, dtype=dtype)
        )(layer_keys[: cfg.layers])
        params = {"layers": stacked}
        if self.use_text_norm:
            params["text_layer_norm"] = init_layer_norm(cfg.embed_dim, dtype)
        if self.use_image_norm:
            params["image_layer_norm"] = init_layer_norm(cfg.embed_dim, dtype)
        if self.use_audio_norm:
            params["audio_layer_norm"] = init_layer_norm(cfg.embed_dim, dtype)
        return params

    def __call__(
        self,
        params,
        x: jnp.ndarray,
        padding_mask: jnp.ndarray,
        rel_bias: Optional[jnp.ndarray],
        encoder_type: str,
        split_lens: Tuple[int, int, int],
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        return_all_hiddens: bool = False,
    ):
        """Run the layer stack.

        x: (B, L, D) concatenated modality sequence;
        padding_mask: (B, L) True at pads;
        rel_bias: (tables, H, L, L) or (tables, B, H, L, L) with
        tables in {1, layers}, or None.

        Returns (x, all_hiddens): final per-modality-LayerNormed output and,
        optionally, the per-layer hidden states stacked (layers, B, L, D).
        """
        cfg = self.cfg
        has_pads = padding_mask is not None
        if has_pads:
            # zero padded positions before the stack (ref encoder:139-142)
            x = x * (1.0 - padding_mask[..., None].astype(x.dtype))

        per_layer_bias = rel_bias is not None and rel_bias.shape[0] == cfg.layers
        shared_bias = None
        if rel_bias is not None and not per_layer_bias:
            shared_bias = rel_bias[0]

        dpr = jnp.asarray(self.dpr)
        use_rng = rng is not None and not deterministic
        layer_rngs = (
            jax.random.split(rng, cfg.layers)
            if use_rng
            else jnp.zeros((cfg.layers,), jnp.uint32)
        )

        # NOTE (r5 layout experiments, PARITY.md): the scan carry keeps
        # its XLA-chosen seq-major {2,0,1} layout, which lowers 3 of the
        # 4 attention projections as ~54%-efficient conv fusions.  A 2-D
        # (B*L, D) carry (forcing row-major) measured -6.8% — the forced
        # boundary reshapes cost more than the layout win — and an
        # optimization_barrier before the dots was a no-op; both removed.

        def body(carry, scanned):
            layer_params, layer_bias, layer_dpr, layer_rng = scanned
            bias = layer_bias if per_layer_bias else shared_bias
            out = encoder_layer(
                layer_params, cfg, carry, padding_mask if has_pads else None,
                bias, encoder_type, split_lens, layer_dpr,
                deterministic=deterministic,
                rng=layer_rng if use_rng else None,
            )
            if cfg.layerdrop > 0.0 and use_rng:
                # LayerDrop (ref transformer_encoder.py:48-51): skip whole
                # layers with prob p during training
                keep = jax.random.bernoulli(
                    jax.random.fold_in(layer_rng, 1), 1.0 - cfg.layerdrop)
                out = jnp.where(keep, out, carry)
            return out, (out if return_all_hiddens else None)

        if cfg.checkpoint_activations:
            policy = getattr(cfg, "remat_policy", "full")
            if policy == "qkv":
                # save the named qkv projections (+75 MB/layer at B=32,
                # L=257, d=1536 bf16): the bwd replay skips 3 of the 16
                # matmul-units per layer (measured +1.6% train at B=16,
                # OOM at B=32 single-chip — PARITY.md)
                body = jax.checkpoint(
                    body,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "qkv"))
            elif policy == "offload_qkv":
                # TPU-native analogue of the reference's offload_activations
                # (ref unify_model_config.py:208-213 checkpoints then saves
                # to CPU): the named qkv saves move to pinned host DRAM
                # instead of occupying HBM — same bwd-replay savings as
                # 'qkv' without its +75 MB/layer HBM cost, paid in
                # host<->device DMA that XLA overlaps with compute
                body = jax.checkpoint(
                    body,
                    policy=jax.checkpoint_policies
                    .save_and_offload_only_these_names(
                        names_which_can_be_saved=[],
                        names_which_can_be_offloaded=["qkv"],
                        offload_src="device", offload_dst="pinned_host"))
            else:
                body = jax.checkpoint(body)

        scanned = (
            params["layers"],
            rel_bias if per_layer_bias else jnp.zeros((cfg.layers,), x.dtype),
            dpr,
            layer_rngs,
        )
        use_pp = (self.pp_mesh is not None
                  and self.pp_mesh.shape.get("pp", 1) > 1
                  and not return_all_hiddens
                  # per-layer batched bias would need 2-axis micro-slicing
                  and not (per_layer_bias and rel_bias.ndim == 5))
        if use_pp:
            from ..parallel.pipeline import pipeline_forward

            bias_batched = shared_bias is not None and shared_bias.ndim == 4
            batch_aux = (padding_mask if has_pads else None,
                         shared_bias if bias_batched else None)
            broadcast_aux = shared_bias if (shared_bias is not None
                                            and not bias_batched) else None

            def pp_body(scanned_slice, carry, aux, bcast_bias):
                layer_params, layer_bias, layer_dpr, layer_rng = scanned_slice
                mask_mb, batched_bias_mb = aux
                if batched_bias_mb is not None:
                    bias = batched_bias_mb
                elif per_layer_bias:
                    bias = layer_bias
                else:
                    bias = bcast_bias  # (H, L, L) shared, replicated
                out = encoder_layer(
                    layer_params, cfg, carry, mask_mb, bias, encoder_type,
                    split_lens, layer_dpr, deterministic=deterministic,
                    rng=layer_rng if use_rng else None)
                if cfg.layerdrop > 0.0 and use_rng:
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(layer_rng, 1), 1.0 - cfg.layerdrop)
                    out = jnp.where(keep, out, carry)
                return out

            x = pipeline_forward(
                pp_body, scanned, x, self.pp_mesh, self.pp_micro_batches,
                batch_aux=batch_aux, broadcast_aux=broadcast_aux,
                checkpoint_stages=cfg.checkpoint_activations)
            hiddens = None
        else:
            # unroll>1 lets XLA fuse across layer boundaries but LOSES on
            # chip (proxy fwd B=32: 460.5 img/s at 1, 432.2 at 2, 341.5
            # at 4 — the bigger program blows VMEM locality); keep 1
            unroll = int(os.environ.get("ONE_PEACE_SCAN_UNROLL", "1"))
            x, hiddens = jax.lax.scan(body, x, scanned, unroll=unroll)

        # per-modality final LayerNorm (ref encoder:201-218)
        text_len, image_len, audio_len = split_lens

        def maybe_norm(name, seg):
            return layer_norm(params[name], seg) if name in params else seg

        if encoder_type == "text":
            x = maybe_norm("text_layer_norm", x)
        elif encoder_type == "image":
            x = maybe_norm("image_layer_norm", x)
        elif encoder_type == "audio":
            x = maybe_norm("audio_layer_norm", x)
        elif encoder_type == "vl":
            x = jnp.concatenate(
                [maybe_norm("text_layer_norm", x[:, :text_len]),
                 maybe_norm("image_layer_norm", x[:, text_len:])], axis=1)
        elif encoder_type == "al":
            x = jnp.concatenate(
                [maybe_norm("text_layer_norm", x[:, :text_len]),
                 maybe_norm("audio_layer_norm", x[:, text_len:])], axis=1)
        elif encoder_type == "val":
            x = jnp.concatenate(
                [maybe_norm("text_layer_norm", x[:, :text_len]),
                 maybe_norm("image_layer_norm",
                            x[:, text_len:text_len + image_len]),
                 maybe_norm("audio_layer_norm",
                            x[:, text_len + image_len:])], axis=1)
        return x, hiddens
