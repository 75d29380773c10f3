"""Ring attention: sequence-sharded exact attention over a mesh axis.

The reference has no sequence/context parallelism (SURVEY.md §2.3 "SP —
absent"); this provides the capability TPU-natively for long-context
scaling: Q/K/V are sharded along the sequence over a mesh axis, K/V blocks
rotate around the ring via ``lax.ppermute`` (ICI neighbor exchange), and
each device maintains an online-softmax accumulator — compute overlaps
communication and the full (L, L) score matrix never exists on any chip.

Supports the ONE-PEACE additive rel-pos bias: the (H, L, L) bias is kept
replicated (it is small) and each ring step slices the (q_rows, k_block)
tile.  Use under ``shard_map`` with the sequence axis bound to ``axis``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_bias: Optional[jnp.ndarray],
    key_padding_mask: Optional[jnp.ndarray],
    scaling: float,
    axis: str,
) -> jnp.ndarray:
    """Inside shard_map: q/k/v (B, Lc, H, D) local chunks (global L = Lc *
    ring size, sharded over ``axis``); rel_bias (H, L, L) and
    key_padding_mask (B, L) replicated.  Returns the local (B, Lc, H, D)
    output chunk."""
    n = jax.lax.psum(1, axis)
    my = jax.lax.axis_index(axis)
    b, lc, h, d = q.shape

    qf = q.astype(jnp.float32) * scaling
    o = jnp.zeros((b, lc, h, d), jnp.float32)
    m = jnp.full((b, h, lc), -jnp.inf, jnp.float32)
    denom = jnp.zeros((b, h, lc), jnp.float32)

    def compute_block(o, m, denom, k_blk, v_blk, s):
        src = (my - s) % n  # which chunk we currently hold
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        if rel_bias is not None:
            rows = jax.lax.dynamic_slice_in_dim(rel_bias, my * lc, lc, axis=1)
            tile = jax.lax.dynamic_slice_in_dim(rows, src * lc, lc, axis=2)
            logits = logits + tile[None]
        if key_padding_mask is not None:
            pad = jax.lax.dynamic_slice_in_dim(key_padding_mask, src * lc, lc, axis=1)
            logits = logits + jnp.where(pad[:, None, None, :], NEG_INF, 0.0)
        blk_max = jnp.max(logits, axis=-1)
        new_m = jnp.maximum(m, blk_max)
        correction = jnp.exp(m - new_m)
        p = jnp.exp(logits - new_m[..., None])
        new_denom = denom * correction + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
        new_o = o * jnp.transpose(correction, (0, 2, 1))[..., None] + pv
        return new_o, new_m, new_denom

    def step(carry, s):
        o, m, denom, k_blk, v_blk = carry
        o, m, denom = compute_block(o, m, denom, k_blk, v_blk, s)
        # rotate K/V to the next device (overlaps with the next step's math)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis, perm)
        v_next = jax.lax.ppermute(v_blk, axis, perm)
        return (o, m, denom, k_next, v_next), None

    # n-1 (compute + rotate) steps, then the last block WITHOUT the
    # rotation — a final ppermute's result is discarded by the scan
    # carry, one wasted full K/V ICI exchange per call
    if n > 1:
        (o, m, denom, k, v), _ = jax.lax.scan(
            step, (o, m, denom, k, v), jnp.arange(n - 1))
    o, m, denom = compute_block(o, m, denom, k, v, n - 1)
    out = o / jnp.transpose(denom, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(mesh, q, k, v, rel_bias, key_padding_mask,
                           scaling: float, axis: str = "tp"):
    """Convenience wrapper: shard the sequence dim over ``axis`` and run
    ring attention; q/k/v are global (B, L, H, D) arrays."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    bias_spec = P() if rel_bias is not None else None
    mask_spec = P() if key_padding_mask is not None else None

    fn = shard_map(
        partial(ring_attention, scaling=scaling, axis=axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), bias_spec, mask_spec),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(q, k, v, rel_bias, key_padding_mask)
