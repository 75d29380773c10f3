"""Fused bias-aware attention kernels (Pallas / Mosaic TPU), fwd + bwd.

Replaces the reference's xFormers ``memory_efficient_attention`` + the
materialized per-layer ``(B, heads, L, L)`` rel-pos bias
(ref: multihead_attention.py:79-101, transformer_encoder.py:144-162).

Design (v2 — transpose-free, lane-packed):

- q/k/v stay in their native ``(B, L, H*Dh)`` layout straight from the qkv
  projections; heads are addressed as 128-lane slices.  The v1 kernel's four
  HBM round-trip transposes to (B, H, L, D) — which ate the entire fusion
  win — are gone.
- heads are packed ``m`` per program so the lane-block ``m*Dh`` is a
  multiple of 128 (m=2 for ONE-PEACE's Dh=64); if no divisor of H aligns,
  the block covers all heads (full last axis is always legal).
- grid is ``(H/m, Lq-tiles, B)`` with **batch innermost**: the rel-pos bias
  block's index map is batch-invariant, so Mosaic keeps it resident in VMEM
  and fetches each bias tile exactly once per (head, q-tile) — total bias
  traffic is (H, L, L) once per layer instead of once per batch item.
- ONE-PEACE sequence lengths are short (text ~72, image 257/577, audio
  <= 752, VL concat <= 850): the whole padded K/V fits in VMEM, so there is
  no K-loop / online softmax; logits/softmax run in fp32 on the VPU, both
  matmuls hit the MXU with fp32 accumulation, and the (B, H, L, L) logits
  never touch HBM.
- backward is a second Pallas kernel with the same layout: it recomputes
  the softmax (flash-style), produces dq/dk/dv without materializing
  probabilities in HBM, and **accumulates d(bias) in VMEM across the
  batch-innermost grid** (the (H, L, L) cotangent the rel-pos tables need).
  Shapes whose backward would overflow VMEM fall back to the XLA einsum
  vjp (still exact, just materializing).
- arrays are passed UNPADDED (v3): block shapes keep the 128-lane grain
  but the L axis of q/k/v/bias/out stays at the logical length, so Mosaic's
  partial-block DMA replaces the three XLA ``jnp.pad`` copies per layer
  (measured 2.4 ms/layer = ~6% of the 4B image branch at L=257->384) and
  the out-slice copy.  Mosaic fills the out-of-bounds block region with
  UNINITIALIZED VMEM (measured on chip, not zeros), so when L is not a
  multiple of 128 the kernels mask in-kernel: key columns >= L get -inf
  scores before softmax, and every operand row >= L is zeroed before it
  can meet a zero weight (0 * NaN = NaN on the MXU).  The masks are
  static-shape selects that compile away entirely when L is aligned.
  ``ONE_PEACE_ATTN_PAD=1`` restores the v2 pad-outside behavior.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_BWD_VMEM_BUDGET = 13 * 1024 * 1024


import os

_HPACK = int(os.environ.get("ONE_PEACE_ATTN_HPACK", "0"))

# Run the kernels through the Pallas interpreter (CPU testing of the
# shard_map multi-device path; flip BEFORE the first trace).
INTERPRET = bool(int(os.environ.get("ONE_PEACE_PALLAS_INTERPRET", "0")))

# Opt-in bf16 softmax (ONE_PEACE_SOFTMAX=bf16): exp/normalize run in bf16
# on the VPU instead of fp32.  Trades parity-exact numerics for VPU
# throughput; the max subtraction stays fp32 so it is still safe.  The
# parity default is fp32 (ref softmax is fp32: multihead_attention.py:112).
# SCOPE: the flag affects the XLA path in ops/attention.py ONLY.  The
# Pallas kernels stay fp32 unconditionally — measured a no-op there
# (760.3 vs 756.3 img/s, fp32 exp already overlapped in VMEM), and the
# custom-vjp backward/fallbacks recompute the softmax in fp32, so a bf16
# forward would silently differentiate a different function.
_SOFTMAX_BF16 = os.environ.get("ONE_PEACE_SOFTMAX", "fp32") == "bf16"

# Legacy v2 behavior: pad L to the 128 grain with XLA jnp.pad outside the
# kernel instead of letting Mosaic DMA partial blocks (escape hatch only).
_FORCE_PAD = os.environ.get("ONE_PEACE_ATTN_PAD", "0") == "1"

# v3.0 q-tile rule (128-grain q rows) for A/B measurement.
_COARSE_Q = os.environ.get("ONE_PEACE_ATTN_COARSE_Q", "0") == "1"


def _heads_per_program(h: int, dh: int, target_lanes: int = 128,
                       bias_block_bytes: int = 0) -> int:
    """Divisor m of h with (m*dh) % 128 == 0 and m*dh nearest target_lanes,
    else all heads (full last axis is always a legal block).

    The forward prefers wider blocks (~384 lanes: contiguous 768-byte DMA
    rows, fewer programs — measured +4% over 128 lanes on the proxy); the
    backward stays minimal because its per-program VMEM carries two
    (m, L, L) fp32 bias blocks."""
    if _HPACK and h % _HPACK == 0 and (_HPACK * dh) % 128 == 0:
        return _HPACK
    valid = [m for m in range(1, h + 1)
             if h % m == 0 and (m * dh) % 128 == 0]
    if bias_block_bytes:
        # keep the double-buffered per-program bias under ~8 MB of VMEM
        fits = [m for m in valid if m * bias_block_bytes <= 8 * 1024 * 1024]
        valid = fits or valid[:1]
    if not valid:
        return h
    return min(valid, key=lambda m: abs(m * dh - target_lanes))


def _pick_blk_q(l: int, lpad: int) -> int:
    """q-tile rows: <= 512, at the 16-row bf16 sublane grain.  Only the
    lane (key) axis of the score tile needs the 128 grain; q rows are the
    MXU *streaming* dimension, so an L=257 image branch runs 272-row
    q-tiles instead of 384 — 29% less score/pv streaming.  Garbage rows
    in an overhanging final tile stay row-confined through the row-wise
    softmax and are never written back (out block is partial).
    ONE_PEACE_ATTN_COARSE_Q=1 restores the 128-grain v3.0 rule."""
    if _COARSE_Q:
        return lpad if lpad <= 512 else 512
    return min(512, -(-l // 16) * 16)


def _pad_inputs(q, k, v, rel_bias, key_bias):
    """Pad L to the 128-lane grain; -inf the key bias at padded columns."""
    b, l, hd = q.shape
    lpad = -(-l // 128) * 128
    if lpad != l:
        q = jnp.pad(q, ((0, 0), (0, lpad - l), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, lpad - l), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lpad - l), (0, 0)))
        if key_bias is None:
            # the padded columns must be -inf'd even on mask-free branches
            # (this legacy path has no in-kernel garbage masks)
            key_bias = jnp.zeros((b, l), jnp.float32)
        key_bias = jnp.pad(key_bias, ((0, 0), (0, lpad - l)),
                           constant_values=NEG_INF)
        if rel_bias is not None:
            pad = [(0, 0)] * (rel_bias.ndim - 2) + [(0, lpad - l), (0, lpad - l)]
            rel_bias = jnp.pad(rel_bias, pad)
    return q, k, v, rel_bias, key_bias, lpad


def _bias_spec(bias_batched: bool, has_bias: bool, m: int, blk_q: int,
               lpad: int, ngrid: int):
    """BlockSpec for the rel-pos bias under a (H/m, nq, B) [ngrid=3] or
    (H/m, B) [ngrid=2] grid.  The index map is batch-invariant for the
    shared (H, L, L) bias, so the block is fetched once per (head, q-tile)."""
    if not has_bias:
        if ngrid == 3:
            return pl.BlockSpec((1, 8, 128), lambda hi, qi, bi: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 8, 128), lambda hi, bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    if bias_batched:
        if ngrid == 3:
            return pl.BlockSpec((1, m, blk_q, lpad),
                                lambda hi, qi, bi: (bi, hi, qi, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, m, blk_q, lpad),
                            lambda hi, bi: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    if ngrid == 3:
        return pl.BlockSpec((m, blk_q, lpad), lambda hi, qi, bi: (hi, qi, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((m, blk_q, lpad), lambda hi, bi: (hi, 0, 0),
                        memory_space=pltpu.VMEM)


def _make_fwd_kernel(m, dh, scaling, has_bias, bias_batched, has_kb,
                     l, blk_q, lpad):
    masked = lpad != l  # OOB block region is uninitialized VMEM, not zeros

    def kernel(q_ref, k_ref, v_ref, bias_ref, kb_ref, o_ref):
        if has_kb:
            row = kb_ref[pl.ds(pl.program_id(2), 1), :].astype(jnp.float32)
        if masked:
            col_ok = jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, lpad), 1) < l
            vrow_ok = jax.lax.broadcasted_iota(
                jnp.int32, (lpad, dh), 0) < l
        outs = []
        for i in range(m):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scaling
            if has_bias:
                bias_i = bias_ref[0][i] if bias_batched else bias_ref[i]
                s = s + bias_i.astype(jnp.float32)
            if has_kb:  # mask-free branches compile the add away entirely
                s = s + row  # (1, Lk) broadcasts over query rows
            if masked:
                # key cols >= l carry garbage scores (incl. possible NaN
                # from garbage bias/kb reads): overwrite, don't add
                s = jnp.where(col_ok, s, NEG_INF)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_ref.dtype)
            v = v_ref[0][:, sl]
            if masked:
                # p is exactly 0 at cols >= l, but 0 * NaN = NaN on the
                # MXU and garbage v rows may hold NaN bit patterns
                v = jnp.where(vrow_ok, v, jnp.zeros_like(v))
            outs.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        out = outs[0] if m == 1 else jnp.concatenate(outs, axis=-1)
        o_ref[0] = out.astype(o_ref.dtype)

    return kernel


def _flash_fwd(q, k, v, rel_bias, key_bias, scaling, heads):
    """q/k/v: (B, L, H*Dh) UNPADDED; rel_bias (H, L, L) | (B, H, L, L) |
    None; key_bias (B, L) fp32 additive.  Returns (B, L, H*Dh).  Block
    shapes stay at the 128-lane grain (lpad); Mosaic DMAs the partial
    blocks and the kernel masks the garbage fill when lpad != L."""
    b, l, hdim = q.shape
    lpad = -(-l // 128) * 128
    dh = hdim // heads
    blk_q = _pick_blk_q(l, lpad)
    m = _heads_per_program(heads, dh, target_lanes=384,
                           bias_block_bytes=blk_q * lpad * 4 * 2)
    has_bias = rel_bias is not None
    bias_batched = has_bias and rel_bias.ndim == 4
    bias_arg = rel_bias if has_bias else jnp.zeros((1, 8, 128), jnp.float32)
    has_kb = key_bias is not None
    kb_arg = key_bias if has_kb else jnp.zeros((8, 128), jnp.float32)
    kb_spec = (pl.BlockSpec((b, lpad), lambda hi, qi, bi: (0, 0),
                            memory_space=pltpu.VMEM) if has_kb else
               pl.BlockSpec((8, 128), lambda hi, qi, bi: (0, 0),
                            memory_space=pltpu.VMEM))

    qkv_spec = lambda lblk: pl.BlockSpec(  # noqa: E731
        (1, lblk, m * dh),
        (lambda hi, qi, bi: (bi, qi, hi)) if lblk == blk_q
        else (lambda hi, qi, bi: (bi, 0, hi)),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_fwd_kernel(m, dh, scaling, has_bias, bias_batched, has_kb,
                         l, blk_q, lpad),
        grid=(heads // m, -(-l // blk_q), b),
        in_specs=[
            qkv_spec(blk_q),
            qkv_spec(lpad),
            qkv_spec(lpad),
            _bias_spec(bias_batched, has_bias, m, blk_q, lpad, 3),
            kb_spec,
        ],
        out_specs=pl.BlockSpec((1, blk_q, m * dh),
                               lambda hi, qi, bi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, hdim), q.dtype),
        interpret=INTERPRET,
    )(q, k, v, bias_arg, kb_arg)
    return out


def _make_bwd_kernel(m, dh, scaling, has_bias, bias_batched, has_kb,
                     l, lsub, lpad):
    # OOB block fill is uninitialized VMEM, not zeros.  q/g rows live on
    # the lsub (16-row) grain, k/v rows on the lpad (128-lane) grain —
    # s/p/ds are (lsub, lpad) so every matmul streams only ceil16(L) q rows.
    masked_q = lsub != l
    masked_kv = lpad != l

    def kernel(q_ref, k_ref, v_ref, g_ref, bias_ref, kb_ref,
               dq_ref, dk_ref, dv_ref, dbias_ref):
        bi = pl.program_id(1)
        if has_kb:
            row = kb_ref[pl.ds(bi, 1), :].astype(jnp.float32)
        if masked_q:
            # garbage q/g rows meet a zero weight somewhere downstream
            # (0 * NaN = NaN): zero them at load, and keep p exactly zero
            # at rows >= l (they saw garbage bias at valid cols)
            qrow_ok = jax.lax.broadcasted_iota(jnp.int32, (lsub, dh), 0) < l
            srow_ok = jax.lax.broadcasted_iota(jnp.int32, (lsub, lpad), 0) < l
        if masked_kv:
            row_ok = jax.lax.broadcasted_iota(jnp.int32, (lpad, dh), 0) < l
            scol_ok = jax.lax.broadcasted_iota(jnp.int32, (lsub, lpad), 1) < l
        dqs, dks, dvs, dss = [], [], [], []
        for i in range(m):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            v = v_ref[0][:, sl]
            g = g_ref[0][:, sl]
            if masked_q:
                q = jnp.where(qrow_ok, q, jnp.zeros_like(q))
                g = jnp.where(qrow_ok, g, jnp.zeros_like(g))
            if masked_kv:
                k = jnp.where(row_ok, k, jnp.zeros_like(k))
                v = jnp.where(row_ok, v, jnp.zeros_like(v))
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scaling
            if has_bias:
                bias_i = bias_ref[0][i] if bias_batched else bias_ref[i]
                s = s + bias_i.astype(jnp.float32)
            if has_kb:
                s = s + row
            if masked_kv:
                s = jnp.where(scol_ok, s, NEG_INF)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            p32 = e / jnp.sum(e, axis=-1, keepdims=True)
            if masked_q:
                # rows >= l saw garbage bias values at cols < l: p32 can
                # be non-finite there even with zeroed q
                p32 = jnp.where(srow_ok, p32, 0.0)
            p = p32.astype(v_ref.dtype)
            # dv = p^T @ g
            dvs.append(jax.lax.dot_general(
                p, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            # softmax vjp: ds = p * (dp - sum(dp*p))
            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dsum = jnp.sum(dp * p32, axis=-1, keepdims=True)
            ds32 = p32 * (dp - dsum)
            dss.append(ds32)
            dsc = (ds32 * scaling).astype(q_ref.dtype)
            dqs.append(jax.lax.dot_general(
                dsc, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dks.append(jax.lax.dot_general(
                dsc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))

        cat = (lambda xs: xs[0] if m == 1 else jnp.concatenate(xs, axis=-1))
        dq_ref[0] = cat(dqs).astype(dq_ref.dtype)
        dk_ref[0] = cat(dks).astype(dk_ref.dtype)
        dv_ref[0] = cat(dvs).astype(dv_ref.dtype)
        if has_bias:
            ds_all = dss[0][None] if m == 1 else jnp.stack(dss)
            if bias_batched:
                dbias_ref[0] = ds_all
            else:
                # batch is the innermost grid dim and this block's index map
                # is batch-invariant: accumulate the bias cotangent in VMEM
                @pl.when(bi == 0)
                def _():
                    dbias_ref[...] = ds_all

                @pl.when(bi > 0)
                def _():
                    dbias_ref[...] += ds_all

    return kernel


def _pick_lsub(l: int, lpad: int) -> int:
    """q/g row extent for the bwd whole-L blocks: the 16-row bf16 sublane
    grain (vs the 128 lane grain of the k/v axis).  Shrinks all four bwd
    matmuls' q-extent and the (lsub, lpad) transients by up to 29% at the
    image branch's L=257 (272 vs 384 rows)."""
    if _COARSE_Q:
        return lpad
    return -(-l // 16) * 16


def _bwd_vmem_bytes(b, lsub, lpad, m, dh, esize, bias_batched, has_bias):
    # q,g + dq on the lsub grain; k,v + dk,dv on lpad (double-buffered,
    # +1 lpad-array of slack mirrors the original conservative count)
    qkv = (3 * lsub + 5 * lpad) * m * dh * esize * 2
    bias = (2 * m * lsub * lpad * 4) if has_bias else 0  # bias in + dbias out
    transients = 4 * lsub * lpad * 4      # s/p32, dp, ds, stacked ds
    return qkv + bias + transients + b * lpad * 4


def _flash_bwd(q, k, v, g, rel_bias, key_bias, scaling, heads):
    b, l, hdim = q.shape
    lpad = -(-l // 128) * 128
    lsub = _pick_lsub(l, lpad)
    dh = hdim // heads
    m = _heads_per_program(heads, dh)
    has_bias = rel_bias is not None
    bias_batched = has_bias and rel_bias.ndim == 4
    bias_arg = rel_bias if has_bias else jnp.zeros((1, 8, 128), jnp.float32)
    has_kb = key_bias is not None
    kb_arg = key_bias if has_kb else jnp.zeros((8, 128), jnp.float32)
    kb_spec = (pl.BlockSpec((b, lpad), lambda hi, bi: (0, 0),
                            memory_space=pltpu.VMEM) if has_kb else
               pl.BlockSpec((8, 128), lambda hi, bi: (0, 0),
                            memory_space=pltpu.VMEM))

    def _spec(lblk):
        return pl.BlockSpec((1, lblk, m * dh),
                            lambda hi, bi: (bi, 0, hi),
                            memory_space=pltpu.VMEM)

    qg_spec = _spec(lsub)
    kv_spec = _spec(lpad)
    out_shapes = [
        jax.ShapeDtypeStruct((b, l, hdim), q.dtype),
        jax.ShapeDtypeStruct((b, l, hdim), q.dtype),
        jax.ShapeDtypeStruct((b, l, hdim), q.dtype),
    ]
    out_specs = [qg_spec, kv_spec, kv_spec]  # dq on lsub; dk, dv on lpad
    if has_bias:
        out_shapes.append(jax.ShapeDtypeStruct(rel_bias.shape, jnp.float32))
        out_specs.append(_bias_spec(bias_batched, True, m, lsub, lpad, 2))
    else:
        out_shapes.append(jax.ShapeDtypeStruct((1, 8, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda hi, bi: (0, 0, 0),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        _make_bwd_kernel(m, dh, scaling, has_bias, bias_batched, has_kb,
                         l, lsub, lpad),
        grid=(heads // m, b),
        in_specs=[
            qg_spec, _spec(lpad), _spec(lpad), qg_spec,
            _bias_spec(bias_batched, has_bias, m, lsub, lpad, 2),
            kb_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=INTERPRET,
    )(q, k, v, g, bias_arg, kb_arg)
    dq, dk, dv, dbias = res
    return dq, dk, dv, (dbias if has_bias else None)


def _xla_reference(q, k, v, rel_bias, key_bias, scaling, heads):
    """Plain einsum attention on the (B, L, H*Dh) layout; exact fallback."""
    b, l, hdim = q.shape
    dh = hdim // heads
    qh = q.reshape(b, l, heads, dh)
    kh = k.reshape(b, l, heads, dh)
    vh = v.reshape(b, l, heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scaling
    if rel_bias is not None:
        logits = logits + (rel_bias if rel_bias.ndim == 4 else rel_bias[None])
    if key_bias is not None:
        logits = logits + key_bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return out.reshape(b, l, hdim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_core(q, k, v, rel_bias, key_bias, scaling, heads):
    return _flash_fwd(q, k, v, rel_bias, key_bias, scaling, heads)


def _core_fwd(q, k, v, rel_bias, key_bias, scaling, heads):
    out = _flash_fwd(q, k, v, rel_bias, key_bias, scaling, heads)
    return out, (q, k, v, rel_bias, key_bias)


def _core_bwd(scaling, heads, res, g):
    q, k, v, rel_bias, key_bias = res
    b, l, hdim = q.shape
    lpad = -(-l // 128) * 128  # block geometry (and VMEM) is grain-padded
    lsub = _pick_lsub(l, lpad)
    m = _heads_per_program(heads, hdim // heads)
    has_bias = rel_bias is not None
    bias_batched = has_bias and rel_bias.ndim == 4
    vmem = _bwd_vmem_bytes(b, lsub, lpad, m, hdim // heads, q.dtype.itemsize,
                           bias_batched, has_bias)
    if vmem <= _BWD_VMEM_BUDGET:
        dq, dk, dv, dbias = _flash_bwd(q, k, v, g, rel_bias, key_bias,
                                       scaling, heads)
        return dq, dk, dv, dbias, None

    # VMEM overflow fallback: XLA einsum vjp (materializes, still exact)
    def f(q_, k_, v_, bias_):
        return _xla_reference(q_, k_, v_, bias_ if has_bias else None,
                              key_bias, scaling, heads)

    _, vjp = jax.vjp(f, q, k, v, rel_bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, (dbias if has_bias else None), None


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
    q/k/v (B, L, H, D), rel_bias (H, L, L)/(B, H, L, L)/None, mask (B, L).

    The (B, L, H, D) -> (B, L, H*D) reshapes are free (contiguous); no
    transposes touch HBM.
    """
    b, l, h, d = q.shape
    q3 = q.reshape(b, l, h * d)
    k3 = k.reshape(b, l, h * d)
    v3 = v.reshape(b, l, h * d)
    # mask-free branches (the image branch, L=257 headline path) thread
    # key_bias=None: the kernels specialize the (1, Lk) row add away and
    # skip the (B, lpad) VMEM fetch entirely
    if key_padding_mask is not None:
        key_bias = jnp.where(key_padding_mask, NEG_INF, 0.0).astype(jnp.float32)
    else:
        key_bias = None
    if rel_bias is not None:
        rel_bias = rel_bias.astype(jnp.float32)
    if _FORCE_PAD:  # legacy v2 escape hatch: XLA pad copies outside
        q3, k3, v3, rel_bias, key_bias, lpad = _pad_inputs(
            q3, k3, v3, rel_bias, key_bias)
        out = _flash_attention_core(q3, k3, v3, rel_bias, key_bias,
                                    scaling, h)
        return out[:, :l].reshape(b, l, h, d)
    out = _flash_attention_core(q3, k3, v3, rel_bias, key_bias, scaling, h)
    return out.reshape(b, l, h, d)


# NOTE on the rejected fused-projection variant: a packed-qkv kernel
# (q/k/v read from one (B, L, 3*H*Dh) buffer at lane-block offsets) was
# built and gated on chip 2026-08-20.  It was BIT-exact vs the separate
# arrays on real Mosaic partial blocks, but the fused (d, 3d) projection
# dot LOST 7% proxy fwd throughput (764.9 vs 824.6 img/s) and the
# per-step weight concats OOMed the 8-layer training graph — rejected
# and removed; see PARITY.md for the measurement record.
