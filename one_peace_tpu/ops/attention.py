"""Bias-aware multi-head attention.

This op replaces both the reference's xFormers ``memory_efficient_attention``
call and its naive bmm fallback (ref: one_peace/models/transformer/
multihead_attention.py:79-115), *and* the materialized per-layer
``(B, heads, L, L)`` float bias the reference builds in
transformer_encoder.py:144-162.  Here the relative-position bias stays
batch-independent ``(heads, L, L)`` and the key-padding mask stays ``(B, L)``;
they are combined on the fly:

- ``xla`` path: plain einsum attention with fp32 softmax.  XLA fuses the
  bias add and mask into the softmax; for ONE-PEACE's short sequences
  (<= ~800) this is already strong on the MXU.
- ``pallas`` path: fused flash-attention kernel (ops/flash_attention.py)
  that streams K/V tiles through VMEM and adds bias/mask tiles inline —
  never materializing the (B, H, L, L) logits in HBM.

Shapes: q, k, v are ``(B, L, H, Dh)``; output ``(B, L, H, Dh)``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _combine_bias(
    rel_bias: Optional[jnp.ndarray],
    key_padding_mask: Optional[jnp.ndarray],
    batch: int,
    heads: int,
    q_len: int,
    k_len: int,
) -> Optional[jnp.ndarray]:
    """Materialize the full additive bias (B, H, Lq, Lk) in fp32.

    Only used by the XLA path; the reference materializes exactly this
    (transformer_encoder.py:148-162).  Padding positions get -inf.
    """
    bias = None
    if rel_bias is not None:
        bias = rel_bias.astype(jnp.float32)
        if bias.ndim == 3:
            bias = bias[None]
    if key_padding_mask is not None:
        pad = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0).astype(jnp.float32)
        bias = pad if bias is None else bias + pad
    return bias


def _pallas_supported() -> bool:
    """The fused kernel needs a real TPU backend; under a multi-device mesh
    pallas_call has no SPMD partitioning rule yet, so pjit graphs fall back
    to the XLA path (single-chip serving/bench take the kernel)."""
    try:
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    except Exception:  # backend not initialized yet
        return False


@partial(jax.jit, static_argnames=("scaling", "impl"))
def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_bias: Optional[jnp.ndarray],
    key_padding_mask: Optional[jnp.ndarray],
    scaling: float,
    impl: str = "pallas",
) -> jnp.ndarray:
    """Softmax attention with additive relative-position bias.

    Args:
      q/k/v: (B, L, H, Dh)
      rel_bias: (H, L, L) or (B, H, L, L) additive bias, or None
      key_padding_mask: (B, L) bool, True at padding positions, or None
      scaling: query scale (head_dim ** -0.5)
      impl: 'pallas' (fused kernel where supported, XLA otherwise) | 'xla'
    """
    if impl == "pallas" and _pallas_supported():
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, rel_bias, key_padding_mask, scaling)

    b, lq, h, _ = q.shape
    lk = k.shape[1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scaling
    bias = _combine_bias(rel_bias, key_padding_mask, b, h, lq, lk)
    if bias is not None:
        logits = logits + bias
    # fp32 softmax (ref uses utils.softmax in fp32: multihead_attention.py:112)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
