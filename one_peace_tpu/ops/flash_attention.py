"""Fused bias-aware attention kernel (Pallas / Mosaic TPU).

Replaces the reference's xFormers ``memory_efficient_attention`` + the
materialized per-layer ``(B, heads, L, L)`` rel-pos bias
(ref: multihead_attention.py:79-101, transformer_encoder.py:144-162).

Design notes (ONE-PEACE sequence lengths are short — text ~72, image 257
(256px) / 577 (384px), audio <= 752, VL concat <= 850):

- grid = (B, H, ceil(L/BLK_Q)); each program holds one query tile and the
  *entire* K/V for its (batch, head) in VMEM (worst case ~850x64 bf16
  ~ 110 KB each — far under the 16 MB VMEM budget).  No K-loop / online
  softmax needed at these lengths; the win over XLA is never touching a
  (B, H, L, L) HBM tensor and fusing bias + mask + softmax in one pass.
- logits/softmax accumulate in fp32 on the VPU; both matmuls hit the MXU
  with ``preferred_element_type=jnp.float32``.
- the rel-pos bias arrives batch-independent (H, L, L) — or batched
  (B, H, L, L) for the masked-pretraining path — and the key-padding mask
  as an additive (B, L) fp32 row; both are tiled straight into VMEM.
- backward: ``jax.custom_vjp`` recomputes attention with the plain XLA
  einsum formulation, so gradients (including d(bias) -> the rel-pos
  tables) are exact while the forward still avoids materializing biases.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLK_Q = 256


def _make_kernel(scaling: float, has_bias: bool, bias_batched: bool):
    def kernel(q_ref, k_ref, v_ref, bias_ref, kbias_ref, out_ref):
        q = q_ref[0, 0]  # (BLK_Q, D)
        k = k_ref[0, 0]  # (L, D)
        v = v_ref[0, 0]  # (L, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scaling
        if has_bias:
            bias = bias_ref[0, 0] if bias_batched else bias_ref[0]
            s = s + bias.astype(jnp.float32)
        # kbias ref holds the full (B, L) array; take this program's row
        row = kbias_ref[pl.ds(pl.program_id(0), 1), :]
        s = s + row.astype(jnp.float32)  # (1, L) broadcasts over rows
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        out = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out_ref[0, 0] = out.astype(out_ref.dtype)

    return kernel


def _flash_fwd(q, k, v, rel_bias, key_bias, scaling, blk_q=DEFAULT_BLK_Q):
    """q/k/v: (B, H, L, D); rel_bias: (H, L, L) | (B, H, L, L) | None;
    key_bias: (B, L) fp32 additive (0 or -inf).  Returns (B, H, L, D)."""
    b, h, l, d = q.shape
    # pad L to the 128-lane grain, then take the whole padded sequence as a
    # single q tile when it fits (<= 512): ONE-PEACE lengths (73/257/497...)
    # land just above a power of two, and two half-empty tiles waste ~2x
    lpad = -(-l // 128) * 128
    blk_q = lpad if lpad <= 512 else max(
        (blk for blk in (512, 256, 128) if lpad % blk == 0), default=128)
    lpad = -(-lpad // blk_q) * blk_q
    if lpad != l:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lpad - l), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lpad - l), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lpad - l), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, 0), (0, lpad - l)), constant_values=NEG_INF)
        if rel_bias is not None:
            pad = [(0, 0)] * (rel_bias.ndim - 2) + [(0, lpad - l), (0, lpad - l)]
            rel_bias = jnp.pad(rel_bias, pad)

    has_bias = rel_bias is not None
    bias_batched = has_bias and rel_bias.ndim == 4

    in_specs = [
        pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lpad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lpad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not has_bias:
        bias_arg = jnp.zeros((1, 8, 128), jnp.float32)
        in_specs.append(pl.BlockSpec((1, 8, 128), lambda bi, hi, qi: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    elif bias_batched:
        bias_arg = rel_bias
        in_specs.append(pl.BlockSpec((1, 1, blk_q, lpad),
                                     lambda bi, hi, qi: (bi, hi, qi, 0),
                                     memory_space=pltpu.VMEM))
    else:
        bias_arg = rel_bias
        in_specs.append(pl.BlockSpec((1, blk_q, lpad), lambda bi, hi, qi: (hi, qi, 0),
                                     memory_space=pltpu.VMEM))
    # full-array block: a (1, L) row block would violate the TPU (8, 128)
    # tile rule when B is not the row count
    in_specs.append(
        pl.BlockSpec((b, lpad), lambda bi, hi, qi: (0, 0), memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(scaling, has_bias, bias_batched),
        grid=(b, h, lpad // blk_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lpad, d), q.dtype),
    )(q, k, v, bias_arg, key_bias)
    return out[:, :, :l]


def _xla_reference(q, k, v, rel_bias, key_bias, scaling):
    """Plain einsum attention used for the backward pass (exact grads,
    including through rel_bias)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scaling
    if rel_bias is not None:
        logits = logits + (rel_bias if rel_bias.ndim == 4 else rel_bias[None])
    logits = logits + key_bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash_attention_core(q, k, v, rel_bias, key_bias, scaling):
    return _flash_fwd(q, k, v, rel_bias, key_bias, scaling)


def _core_fwd(q, k, v, rel_bias, key_bias, scaling):
    out = _flash_fwd(q, k, v, rel_bias, key_bias, scaling)
    return out, (q, k, v, rel_bias, key_bias)


def _core_bwd(scaling, res, g):
    q, k, v, rel_bias, key_bias = res
    has_bias = rel_bias is not None

    def f(q_, k_, v_, bias_):
        return _xla_reference(q_, k_, v_, bias_ if has_bias else None, key_bias, scaling)

    _, vjp = jax.vjp(f, q, k, v, rel_bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias if has_bias else None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_bias: Optional[jnp.ndarray],
    key_padding_mask: Optional[jnp.ndarray],
    scaling: float,
) -> jnp.ndarray:
    """Public entry; layouts match ops.attention.multihead_attention:
    q/k/v (B, L, H, D), rel_bias (H, L, L)/(B, H, L, L)/None, mask (B, L)."""
    b, l, h, d = q.shape
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if key_padding_mask is not None:
        key_bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    else:
        key_bias = jnp.zeros((b, l), jnp.float32)
    if rel_bias is not None:
        rel_bias = rel_bias.astype(jnp.float32)
    out = _flash_attention_core(qt, kt, vt, rel_bias, key_bias, scaling)
    return jnp.transpose(out, (0, 2, 1, 3))
