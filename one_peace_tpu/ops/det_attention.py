"""Fused attention for the detection trunk's global layers (Pallas TPU).

The det backbone's global layers attend over the full stride-16 grid
(L = 4096 at 1024 px, 6400 at 1280 px).  The XLA path materializes the
(B, heads, L, L) fp32 logits AND a gathered (heads, L, L) shared bucket
bias — 1.6 GB each at 1024 px, 3.9 GB at 1280 px, which makes 1280 px
inference infeasible on a 16 GB chip (ref det/models/onepeace.py:276-303
pays exactly this: F.embedding over an L x L bucket map + full attn
logits).  This kernel never materializes either:

- **shared bucket bias** (ref onepeace.py:271,288-300): for grid (not
  CLS) positions the bucket index is (dy+B-1)*(2B-1) + (dx+B-1)
  (models/rel_pos.py:60-84) — the (L, L) bias is 2-level block-Toeplitz
  over the (2B-1, 2B-1) value grid.  We precompute the row-Toeplitz
  factor ``toep[h, dy, qx, kx] = grid[h, dy, qx-kx+W-1]`` — shape
  (heads, 2H-1, W, W), ~50 MB at 64x64 vs 1.6 GB materialized — and the
  kernel DMAs the (c+ck-1) dy-slabs a (q-tile, k-tile) pair needs from
  HBM and assembles the bias tile with static block concatenation.
- **decomposed rel pos** (ref onepeace.py:205-210, detectron2
  add_decomposed_rel_pos): bias(q, k) = bh[q, ky] + bw[q, kx] is
  separable; bh (B, heads, L, H) / bw (B, heads, L, W) are precomputed
  from the *unscaled* q with two small einsums and the kernel broadcasts
  them tile-wise.
- **online softmax** over k-tiles (flash-style): the (blk_q, L) logits
  row never exists; stats + fp32 accumulator live in VMEM scratch.

Backward: a Pallas two-pass backward (``_det_flash_bwd``, default) —
saved-LSE recompute, dkv pass then dq pass with in-VMEM accumulation —
makes 1024 px det *training* fit on one chip where the materializing XLA
vjp cannot even compile (fwd+bwd 46.3 ms vs 124.7 XLA at 64x64; see
CLAUDE.md).  ``ONE_PEACE_DET_BWD=xla`` forces the XLA einsum vjp
fallback (exact, materializing) for debugging at small grids.

Grid is (B, heads/m, q-tiles, k-tiles) with the k loop innermost; the
k/v/bias fetches double-buffer against the matmuls.  m packs heads so the
lane dim is m*dh = 128.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def toeplitz_tables(table: jnp.ndarray, src_bucket: int,
                    dst_bucket: int) -> jnp.ndarray:
    """Pretrain rel table ((2*src-1)^2+3, heads) -> Toeplitz factor
    (heads, 2*dst-1, dst, dst): toep[h, dyi, qx, kx] =
    grid[h, dyi, qx-kx+dst-1], where grid is the bicubic-interpolated
    (2*dst-1, 2*dst-1) value grid (CLS rows dropped — the det trunk has
    no CLS token)."""
    from ..vision.det_backbone import interpolate_rel_table

    d = 2 * dst_bucket - 1
    resized = interpolate_rel_table(table, src_bucket, dst_bucket)
    grid = resized[:-3].reshape(d, d, -1).transpose(2, 0, 1)  # (heads, d, d)
    qx = jnp.arange(dst_bucket)[:, None]
    kx = jnp.arange(dst_bucket)[None, :]
    idx = qx - kx + dst_bucket - 1  # (dst, dst) in [0, d)
    return grid[:, :, idx].astype(jnp.float32)  # (heads, d, dst, dst)


def _pick_rows(hg: int, wg: int, target: int = 512) -> Optional[int]:
    """Rows of the grid per tile: divisor c of hg with c*wg nearest target
    that satisfies Mosaic's tiling — blocks' minor dim (c*wg) must be a
    multiple of 128 and their second-minor (c, for the bh block) a
    multiple of 8 (or the full dim).  None when no divisor qualifies
    (caller falls back to XLA)."""
    valid = [c for c in range(1, hg + 1)
             if hg % c == 0 and (c * wg) % 128 == 0
             and (c % 8 == 0 or c == hg)]
    if not valid:
        return None
    return min(valid, key=lambda c: (abs(c * wg - target), c))


def _pick_rows_any(hg: int, wg: int, target: int = 512) -> int:
    """Unconstrained variant for the interpreter (tests on tiny grids)."""
    divs = [c for c in range(1, hg + 1) if hg % c == 0]
    return min(divs, key=lambda c: (abs(c * wg - target), c))


def _head_pack(heads: int, dh: int):
    """Lane-legal head pack: qkv blocks carry m*dh lanes, which Mosaic
    requires to be a 128-multiple (the m*dh minor dim is a strict slice of
    the H*dh axis, so the full-axis exemption never applies).  Measured
    default first (m=2 for dh 64/128), then the smallest legal wider pack
    (e.g. dh=96 -> m=4, 384 lanes); None when no divisor of ``heads``
    yields a legal block <= 512 lanes — the caller falls back to XLA."""
    m = 2 if (heads % 2 == 0 and dh * 2 <= 256 and (dh * 2) % 128 == 0) else 1
    if (dh * m) % 128 == 0:
        return m
    for m in range(2, heads + 1):
        if heads % m == 0 and (m * dh) % 128 == 0 and m * dh <= 512:
            return m
    return None


def _tiling(heads: int, dh: int, hg: int, wg: int, tq: int = 512,
            tk: int = 1024):
    """Shared tile selection for the fwd and bwd kernels: head pack m,
    q-tile rows c, k-tile rows ck, padded lane width wg_pad.

    Tile defaults measured on v5e (64x64 grid, toep+decomp): 512/512
    10.0 ms -> 512/2048 7.66 ms (fewer k-steps amortize bookkeeping) ->
    512/1024 + double-buffered slab prefetch 7.60 ms.  2048 with two
    slab slots exceeds the 16 MB scoped-VMEM budget, so 1024 it is."""
    m = _head_pack(heads, dh)
    if m is None:
        assert _interpret(), (heads, dh)  # gated by det_flash_supported
        m = 1
    c = _pick_rows(hg, wg, target=tq)
    ck = _pick_rows(hg, wg, target=tk)
    if c is None or ck is None:
        assert _interpret(), (hg, wg)  # gated by det_flash_supported on TPU
        c = c or _pick_rows_any(hg, wg, tq)
        ck = ck or _pick_rows_any(hg, wg, tk)
    wg_pad = max(-(-wg // 128) * 128, 128)
    return m, c, ck, wg_pad


def _make_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep, has_decomp,
                 nk, with_lse=False):
    blk_q, blk_k = c * wg, ck * wg

    def kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, toep_hbm, o_ref,
               *rest):
        if with_lse:
            lse_ref, acc_ref, mstat_ref, lstat_ref, slab_ref, sem = rest
        else:
            acc_ref, mstat_ref, lstat_ref, slab_ref, sem = rest
        hi = pl.program_id(1)
        qi = pl.program_id(2)
        ki = pl.program_id(3)

        def slab_copy(k_step, slot):
            # dy-slab a (q-tile, k-tile) pair needs: dy = qy - kh with
            # qy in [c*qi, c*qi+c), kh in [ck*k_step, ck*k_step+ck)
            start = c * qi - ck * k_step - (ck - 1) + (hg - 1)
            return pltpu.make_async_copy(
                toep_hbm.at[pl.ds(hi * m, m), pl.ds(start, c + ck - 1)],
                slab_ref.at[slot], sem.at[slot])

        slot = jax.lax.rem(ki, 2)
        if has_toep:
            # double-buffered prefetch: step ki's slab was issued by step
            # ki-1; each sequence cold-starts at ki == 0
            @pl.when(ki == 0)
            def _():
                slab_copy(0, 0).start()

        @pl.when(ki == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            mstat_ref[...] = jnp.full_like(mstat_ref, -jnp.inf)
            lstat_ref[...] = jnp.zeros_like(lstat_ref)

        if has_toep:
            slab_copy(ki, slot).wait()
            if nk > 1:
                @pl.when(ki + 1 < nk)
                def _():
                    slab_copy(ki + 1, jax.lax.rem(ki + 1, 2)).start()

        for i in range(m):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scaling
            s, _, _ = _bias_tile(
                i, s, slab_ref, slot, bh_ref, bw_ref, c, ck, wg, blk_k,
                has_toep, has_decomp)

            m_old = mstat_ref[i]  # (blk_q,)
            l_old = lstat_ref[i]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[:, None])
            corr = jnp.exp(m_old - m_new)
            l_new = l_old * corr + jnp.sum(p, axis=-1)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0][:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:, sl] = acc_ref[:, sl] * corr[:, None] + pv
            mstat_ref[i] = m_new
            lstat_ref[i] = l_new

        @pl.when(ki == nk - 1)
        def _():
            for i in range(m):
                sl = slice(i * dh, (i + 1) * dh)
                o_ref[0, :, sl] = (
                    acc_ref[:, sl] / lstat_ref[i][:, None]
                ).astype(o_ref.dtype)
            if with_lse:
                lse_ref[0, 0] = mstat_ref[...] + jnp.log(lstat_ref[...])

    return kernel


def _det_flash_fwd(q, k, v, toep, bh, bw, hw, scaling, heads,
                   with_lse=False):
    """q/k/v (B, L, H*dh); toep (H, 2hg-1, wg, wg) | None;
    bh (B, H, hg, L) | None; bw (B, H, L, wg) | None.
    With ``with_lse`` also returns the per-row softmax log-sum-exp
    (B, heads//m, m, L) fp32 — the residual the Pallas backward needs to
    re-materialize probabilities without an online max."""
    b, l, hdim = q.shape
    hg, wg = hw
    dh = hdim // heads
    import os

    m, c, ck, wg_pad = _tiling(
        heads, dh, hg, wg,
        tq=int(os.environ.get("ONE_PEACE_DET_BLKQ", "512")),
        tk=int(os.environ.get("ONE_PEACE_DET_BLKK", "1024")))
    blk_q, blk_k = c * wg, ck * wg
    nq, nk = l // blk_q, l // blk_k
    has_toep = toep is not None
    has_decomp = bh is not None

    qkv_spec = lambda lblk, imap: pl.BlockSpec(  # noqa: E731
        (1, lblk, m * dh), imap, memory_space=pltpu.VMEM)
    in_specs = [
        qkv_spec(blk_q, lambda bi, hi, qi, ki: (bi, qi, hi)),
        qkv_spec(blk_k, lambda bi, hi, qi, ki: (bi, ki, hi)),
        qkv_spec(blk_k, lambda bi, hi, qi, ki: (bi, ki, hi)),
    ]
    if has_decomp:
        in_specs.append(pl.BlockSpec(  # bh (B, H, hg, L): kh rows x q cols
            (1, m, ck, blk_q), lambda bi, hi, qi, ki: (bi, hi, ki, qi),
            memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(  # bw (B, H, L, wg)
            (1, m, blk_q, wg), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM))
        bh_arg, bw_arg = bh, bw
    else:
        in_specs.append(pl.BlockSpec((1, 1, 8, 128),
                                     lambda bi, hi, qi, ki: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, 8, 128),
                                     lambda bi, hi, qi, ki: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        bh_arg = jnp.zeros((1, 1, 8, 128), jnp.float32)
        bw_arg = jnp.zeros((1, 1, 8, 128), jnp.float32)
    if has_toep:
        # whole array in HBM; heads + dy slab manually DMA'd in-kernel.
        # Lane dim padded to the 128 tiling: DMA slices must be
        # tile-aligned along the minor dimension.
        if toep.shape[-1] != wg_pad:
            toep = jnp.pad(
                toep, ((0, 0), (0, 0), (0, 0), (0, wg_pad - toep.shape[-1])))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        toep_arg = toep
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        toep_arg = jnp.zeros((m, 1, 8, 128), jnp.float32)

    out_specs = [pl.BlockSpec((1, blk_q, m * dh),
                              lambda bi, hi, qi, ki: (bi, qi, hi),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b, l, hdim), q.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, 1, m, blk_q),
                                      lambda bi, hi, qi, ki: (bi, hi, 0, qi),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((b, heads // m, m, l), jnp.float32))
    res = pl.pallas_call(
        _make_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep,
                     has_decomp, nk, with_lse=with_lse),
        grid=(b, heads // m, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((blk_q, m * dh), jnp.float32),        # acc
            pltpu.VMEM((m, blk_q), jnp.float32),             # running max
            pltpu.VMEM((m, blk_q), jnp.float32),             # running sum
            pltpu.VMEM((2, m, c + ck - 1, wg, wg_pad), jnp.float32),  # 2-slot slab
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(q, k, v, bh_arg, bw_arg, toep_arg)
    return res if with_lse else res[0]


# ---------------------------------------------------------------------------
# Pallas backward: flash-style recompute from the saved LSE.  Neither the
# (B, H, L, L) probabilities nor dS ever exist — each pass re-assembles the
# bias tile exactly like the forward and consumes dS on the fly:
#
#   pass 1 (k innermost): dq  += ds @ K          (resident out block)
#                         dbh  = indicator @ ds  (one block per (qi, ki))
#                         dbw += ds @ tile_mat   (resident out block)
#                         dtoep: per-(b, h, qi) slab of length c+hg-1
#                                accumulated in VMEM scratch, DMA'd to an
#                                HBM partial at ki == nk-1
#   pass 2 (q innermost): dv  += P^T  @ dO       (resident out block)
#                         dk  += dS^T @ Q        (resident out block)
#
# The (heads, 2hg-1, wg, wg) dtoep then folds from the per-qi partials with
# nq overlapping adds in XLA (ranges [c*qi, c*qi + c+hg-1)).
# ---------------------------------------------------------------------------


def _bias_tile(i, s, slab_ref, slot, bh_ref, bw_ref, c, ck, wg, blk_k,
               has_toep, has_decomp):
    """Add the fwd's bias assembly for head-slot ``i`` onto logits ``s``;
    returns (s, expand, tile_mat) so the bwd can reuse the indicators."""
    expand = tile_mat = None
    if has_toep:
        t = jnp.where(slot == 0, slab_ref[0, i], slab_ref[1, i])
        rows = [
            jnp.concatenate(
                [t[a - b + ck - 1][:, :wg] for b in range(ck)], axis=-1)
            for a in range(c)
        ]
        s = s + jnp.concatenate(rows, axis=0)
    if has_decomp:
        kh_row = jax.lax.broadcasted_iota(jnp.int32, (ck, blk_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ck, blk_k), 1)
        expand = (col // wg == kh_row).astype(jnp.float32)
        s = s + jax.lax.dot_general(
            bh_ref[0, i].astype(jnp.float32), expand,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        row_w = jax.lax.broadcasted_iota(jnp.int32, (wg, blk_k), 0)
        col_w = jax.lax.broadcasted_iota(jnp.int32, (wg, blk_k), 1)
        tile_mat = (col_w % wg == row_w).astype(jnp.float32)
        s = s + jax.lax.dot_general(
            bw_ref[0, i].astype(jnp.float32), tile_mat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return s, expand, tile_mat


def _make_bwd_dq_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep,
                        has_decomp, nk):
    blk_q, blk_k = c * wg, ck * wg
    S = c + hg - 1  # dy span all k-tiles of one q-tile touch

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, bh_ref, bw_ref,
               toep_hbm, dq_ref, dbh_ref, dbw_ref, dtp_hbm,
               slab_ref, dtp_acc, sem, out_sem):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        qi = pl.program_id(2)
        ki = pl.program_id(3)

        def slab_copy(k_step, slot):
            start = c * qi - ck * k_step - (ck - 1) + (hg - 1)
            return pltpu.make_async_copy(
                toep_hbm.at[pl.ds(hi * m, m), pl.ds(start, c + ck - 1)],
                slab_ref.at[slot], sem.at[slot])

        slot = jax.lax.rem(ki, 2)
        if has_toep:
            @pl.when(ki == 0)
            def _():
                slab_copy(0, 0).start()

        @pl.when(ki == 0)
        def _():
            dq_ref[...] = jnp.zeros_like(dq_ref)
            if has_decomp:
                dbw_ref[...] = jnp.zeros_like(dbw_ref)
            if has_toep:
                dtp_acc[...] = jnp.zeros_like(dtp_acc)

        if has_toep:
            slab_copy(ki, slot).wait()
            if nk > 1:
                @pl.when(ki + 1 < nk)
                def _():
                    slab_copy(ki + 1, jax.lax.rem(ki + 1, 2)).start()

        for i in range(m):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scaling
            s, expand, tile_mat = _bias_tile(
                i, s, slab_ref, slot, bh_ref, bw_ref, c, ck, wg, blk_k,
                has_toep, has_decomp)
            p = jnp.exp(s - lse_ref[0, 0, i][:, None])
            dp = jax.lax.dot_general(
                do_ref[0][:, sl], v_ref[0][:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dl_ref[0, 0, i][:, None])  # (blk_q, blk_k) fp32
            dsc = ds.astype(q_ref.dtype)
            dq_ref[0, :, sl] += jax.lax.dot_general(
                dsc, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scaling
            if has_decomp:
                dbh_ref[0, i] = jax.lax.dot_general(
                    expand, ds, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dbw_ref[0, i] += jax.lax.dot_general(
                    ds, tile_mat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if has_toep:
                # scatter ds's (c x ck) wg-blocks onto the per-qi dy slabs:
                # global dy of (a, b) = (c*qi + a) - (ck*ki + b) + hg-1;
                # scratch offset drops the c*qi.  For a FIXED k-offset bb
                # the dy rows are contiguous in a, and slicing a lane
                # column of ds then splitting the leading (sublane) dim is
                # free — so this is ck slab RMWs of (c, wg, wg) instead of
                # c*ck row RMWs of (1, wg, wg).  Measured 64x64/16h: full
                # fwd+bwd 16.2 -> 15.9 ms — Mosaic was already coalescing
                # most of the row RMWs; the remaining toep overhead is the
                # slab DMA traffic + the bias-tile row assembly, not the
                # scatter.  Kept for the op-count reduction.
                for bb in range(ck):
                    base = i * S - bb + hg - 1 - ck * ki  # dy at a == 0
                    col = ds[:, bb * wg:(bb + 1) * wg]  # (c*wg, wg)
                    dtp_acc[pl.ds(base, c), :, 0:wg] += col.reshape(
                        c, wg, wg)

        if has_toep:
            @pl.when(ki == nk - 1)
            def _():
                copy = pltpu.make_async_copy(
                    dtp_acc, dtp_hbm.at[bi, hi, qi], out_sem)
                copy.start()
                copy.wait()

    return kernel


def _make_bwd_dkv_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep,
                         has_decomp, nq):
    blk_q, blk_k = c * wg, ck * wg

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, bh_ref, bw_ref,
               toep_hbm, dk_ref, dv_ref, slab_ref, sem):
        hi = pl.program_id(1)
        ki = pl.program_id(2)
        qi = pl.program_id(3)  # innermost

        def slab_copy(q_step, slot):
            start = c * q_step - ck * ki - (ck - 1) + (hg - 1)
            return pltpu.make_async_copy(
                toep_hbm.at[pl.ds(hi * m, m), pl.ds(start, c + ck - 1)],
                slab_ref.at[slot], sem.at[slot])

        slot = jax.lax.rem(qi, 2)
        if has_toep:
            @pl.when(qi == 0)
            def _():
                slab_copy(0, 0).start()

        @pl.when(qi == 0)
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)
            dv_ref[...] = jnp.zeros_like(dv_ref)

        if has_toep:
            slab_copy(qi, slot).wait()
            if nq > 1:
                @pl.when(qi + 1 < nq)
                def _():
                    slab_copy(qi + 1, jax.lax.rem(qi + 1, 2)).start()

        for i in range(m):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scaling
            s, _, _ = _bias_tile(
                i, s, slab_ref, slot, bh_ref, bw_ref, c, ck, wg, blk_k,
                has_toep, has_decomp)
            p = jnp.exp(s - lse_ref[0, 0, i][:, None])
            do = do_ref[0][:, sl]
            dv_ref[0, :, sl] += jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v_ref[0][:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - dl_ref[0, 0, i][:, None])
            dk_ref[0, :, sl] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scaling

    return kernel


def _det_flash_bwd(q, k, v, toep, bh, bw, out, dout, lse, hw, scaling,
                   heads):
    """Pallas backward.  Returns (dq, dk, dv, dtoep, dbh, dbw) — the first
    three in the input dtype, the bias cotangents fp32 (dbh/dbw/dtoep are
    None when the corresponding bias is absent)."""
    import os

    b, l, hdim = q.shape
    hg, wg = hw
    dh = hdim // heads
    # smaller k tile than fwd: the dq pass additionally keeps the dtoep
    # slab accumulator (m*(c+hg-1), wg, wg_pad fp32) resident in VMEM
    m, c, ck, wg_pad = _tiling(
        heads, dh, hg, wg,
        tq=int(os.environ.get("ONE_PEACE_DET_BLKQ", "512")),
        tk=int(os.environ.get("ONE_PEACE_DET_BWD_BLKK", "512")))
    blk_q, blk_k = c * wg, ck * wg
    nq, nk = l // blk_q, l // blk_k
    hm = heads // m
    S = c + hg - 1
    has_toep = toep is not None
    has_decomp = bh is not None

    # delta = rowsum(dO * O) per head, laid out (B, heads//m, m, L) like lse
    delta = jnp.einsum(
        "blhd,blhd->bhl",
        dout.astype(jnp.float32).reshape(b, l, heads, dh),
        out.astype(jnp.float32).reshape(b, l, heads, dh),
    ).reshape(b, hm, m, l)

    qkv_spec = lambda lblk, imap: pl.BlockSpec(  # noqa: E731
        (1, lblk, m * dh), imap, memory_space=pltpu.VMEM)

    def common_specs(q_inner: bool):
        # index maps: grid dims are (b, hm, outer, inner); for the dq pass
        # outer=qi/inner=ki, for the dkv pass outer=ki/inner=qi
        if q_inner:
            qi_of = lambda o, i: i  # noqa: E731
            ki_of = lambda o, i: o  # noqa: E731
        else:
            qi_of = lambda o, i: o  # noqa: E731
            ki_of = lambda o, i: i  # noqa: E731
        specs = [
            qkv_spec(blk_q, lambda bi, hi, o, i: (bi, qi_of(o, i), hi)),
            qkv_spec(blk_k, lambda bi, hi, o, i: (bi, ki_of(o, i), hi)),
            qkv_spec(blk_k, lambda bi, hi, o, i: (bi, ki_of(o, i), hi)),
            qkv_spec(blk_q, lambda bi, hi, o, i: (bi, qi_of(o, i), hi)),
            pl.BlockSpec((1, 1, m, blk_q),
                         lambda bi, hi, o, i: (bi, hi, 0, qi_of(o, i)),
                         memory_space=pltpu.VMEM),  # lse
            pl.BlockSpec((1, 1, m, blk_q),
                         lambda bi, hi, o, i: (bi, hi, 0, qi_of(o, i)),
                         memory_space=pltpu.VMEM),  # delta
        ]
        if has_decomp:
            specs.append(pl.BlockSpec(
                (1, m, ck, blk_q),
                lambda bi, hi, o, i: (bi, hi, ki_of(o, i), qi_of(o, i)),
                memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec(
                (1, m, blk_q, wg),
                lambda bi, hi, o, i: (bi, hi, qi_of(o, i), 0),
                memory_space=pltpu.VMEM))
            bh_arg, bw_arg = bh, bw
        else:
            specs.append(pl.BlockSpec((1, 1, 8, 128),
                                      lambda bi, hi, o, i: (0, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec((1, 1, 8, 128),
                                      lambda bi, hi, o, i: (0, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
            bh_arg = jnp.zeros((1, 1, 8, 128), jnp.float32)
            bw_arg = jnp.zeros((1, 1, 8, 128), jnp.float32)
        specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        if has_toep:
            tp = toep
            if tp.shape[-1] != wg_pad:
                tp = jnp.pad(
                    tp, ((0, 0), (0, 0), (0, 0), (0, wg_pad - tp.shape[-1])))
            toep_arg = tp
        else:
            toep_arg = jnp.zeros((m, 1, 8, 128), jnp.float32)
        return specs, bh_arg, bw_arg, toep_arg

    # ---- pass 1: dq (+ dbh, dbw, dtoep partials); k innermost ----
    in_specs, bh_arg, bw_arg, toep_arg = common_specs(q_inner=False)
    out_specs = [
        pl.BlockSpec((1, blk_q, m * dh), lambda bi, hi, o, i: (bi, o, hi),
                     memory_space=pltpu.VMEM),  # dq, resident over ki
    ]
    out_shapes = [jax.ShapeDtypeStruct((b, l, hdim), jnp.float32)]
    if has_decomp:
        out_specs.append(pl.BlockSpec(
            (1, m, ck, blk_q), lambda bi, hi, o, i: (bi, hi, i, o),
            memory_space=pltpu.VMEM))  # dbh: one block per (qi, ki)
        out_shapes.append(
            jax.ShapeDtypeStruct((b, heads, hg, l), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, m, blk_q, wg), lambda bi, hi, o, i: (bi, hi, o, 0),
            memory_space=pltpu.VMEM))  # dbw, resident over ki
        out_shapes.append(
            jax.ShapeDtypeStruct((b, heads, l, wg), jnp.float32))
    else:
        out_specs.append(pl.BlockSpec((1, 1, 8, 128),
                                      lambda bi, hi, o, i: (0, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, 1, 8, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 8, 128),
                                      lambda bi, hi, o, i: (0, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, 1, 8, 128), jnp.float32))
    out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
    if has_toep:
        out_shapes.append(jax.ShapeDtypeStruct(
            (b, hm, nq, m * S, wg, wg_pad), jnp.float32))
    else:
        out_shapes.append(jax.ShapeDtypeStruct((1, 1, 1, 1, 8, 128),
                                               jnp.float32))

    res1 = pl.pallas_call(
        _make_bwd_dq_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep,
                            has_decomp, nk),
        grid=(b, hm, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, m, c + ck - 1, wg, wg_pad), jnp.float32),
            pltpu.VMEM((m * S, wg, wg_pad), jnp.float32),  # dtoep slab acc
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        # the resident dtoep slab accumulator grows with the grid height
        # (m*(c+hg-1) rows); 80x80 needs ~19 MB scoped, over the 16 MB
        # default — v5e has 128 MB of VMEM, so raise the cap for this pass
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v, dout, lse, delta, bh_arg, bw_arg, toep_arg)
    dq, dbh, dbw, dtp_part = res1

    # ---- pass 2: dk, dv; q innermost ----
    in_specs, bh_arg, bw_arg, toep_arg = common_specs(q_inner=True)
    res2 = pl.pallas_call(
        _make_bwd_dkv_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep,
                             has_decomp, nq),
        grid=(b, hm, nk, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, blk_k, m * dh), lambda bi, hi, o, i: (bi, o, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, m * dh), lambda bi, hi, o, i: (bi, o, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, l, hdim), jnp.float32),
            jax.ShapeDtypeStruct((b, l, hdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, m, c + ck - 1, wg, wg_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(q, k, v, dout, lse, delta, bh_arg, bw_arg, toep_arg)
    dk, dv = res2

    dtoep = None
    if has_toep:
        # fold per-qi partials: (B, hm, nq, m*S, wg, wg_pad) -> sum batch,
        # unpack heads, then nq overlapping adds at offsets c*qi
        part = dtp_part.sum(0).reshape(hm, nq, m, S, wg, wg_pad)
        part = part.transpose(0, 2, 1, 3, 4, 5).reshape(
            heads, nq, S, wg, wg_pad)[..., :wg]
        dtoep = jnp.zeros((heads, 2 * hg - 1, wg, wg), jnp.float32)
        for qi in range(nq):
            dtoep = dtoep.at[:, c * qi:c * qi + S].add(part[:, qi])
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dtoep, dbh if has_decomp else None, dbw if has_decomp else None)


def _interpret() -> bool:
    from . import flash_attention as fa

    return fa.INTERPRET


def _xla_reference(q, k, v, toep, rel_h, rel_w, hw, scaling, heads):
    """Materializing reference path == det_backbone._det_attention math."""
    from ..vision.det_backbone import decomposed_rel_bias

    b, l, hdim = q.shape
    hg, wg = hw
    dh = hdim // heads
    qh = q.reshape(b, l, heads, dh)
    kh = k.reshape(b, l, heads, dh)
    vh = v.reshape(b, l, heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scaling
    if toep is not None:
        logits = logits + _bias_from_toeplitz(toep, hg, wg)[None]
    if rel_h is not None:
        logits = logits + decomposed_rel_bias(qh, rel_h, rel_w, hw
                                              ).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return out.reshape(b, l, hdim)


def _bias_from_toeplitz(toep: jnp.ndarray, hg: int, wg: int) -> jnp.ndarray:
    """(heads, 2hg-1, wg, wg) -> (heads, L, L) materialized (test/vjp path)."""
    qy = jnp.arange(hg)[:, None]
    ky = jnp.arange(hg)[None, :]
    rows = toep[:, qy - ky + hg - 1]          # (heads, hg, hg, wg, wg)
    bias = rows.transpose(0, 1, 3, 2, 4)      # (heads, hg, wg, hg, wg)
    return bias.reshape(toep.shape[0], hg * wg, hg * wg)


def _compute_decomp(qh, rel_h, rel_w, hw):
    """bh (B, H, hg, L) [kh-major for tile slicing] and bw (B, H, L, wg)
    from the unscaled q (detectron2 add_decomposed_rel_pos factors)."""
    hg, wg = hw
    b, l, heads, dh = qh.shape
    qg = qh.reshape(b, hg, wg, heads, dh)
    idx = jnp.arange(hg)[:, None] - jnp.arange(hg)[None, :] + hg - 1
    rh = rel_h[idx]  # (hg, hg, dh) [qy, ky]
    idxw = jnp.arange(wg)[:, None] - jnp.arange(wg)[None, :] + wg - 1
    rw = rel_w[idxw]
    bh = jnp.einsum("bhwnc,hkc->bnkhw", qg, rh.astype(qh.dtype))
    bh = bh.reshape(b, heads, hg, l).astype(jnp.float32)
    bw = jnp.einsum("bhwnc,wkc->bnhwk", qg, rw.astype(qh.dtype))
    bw = bw.reshape(b, heads, l, wg).astype(jnp.float32)
    return bh, bw


def _xla_core(q, k, v, toep, bh, bw, hw, scaling, heads):
    """Materializing path over the precomputed decomp factors bh/bw —
    the vjp fallback for the custom core (same math as _xla_reference)."""
    b, l, hdim = q.shape
    hg, wg = hw
    dh = hdim // heads
    qh = q.reshape(b, l, heads, dh)
    kh = k.reshape(b, l, heads, dh)
    vh = v.reshape(b, l, heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scaling
    if toep is not None:
        logits = logits + _bias_from_toeplitz(toep, hg, wg)[None]
    if bh is not None:
        # bh (B, H, hg, L) is [ky, q]-ordered; bw (B, H, L, wg)
        bias = bh.transpose(0, 1, 3, 2)[..., :, None] + bw[..., None, :]
        logits = logits + bias.reshape(b, heads, l, l)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return out.reshape(b, l, hdim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _det_attention_core(q, k, v, toep, bh, bw, hw, scaling, heads):
    return _det_flash_fwd(q, k, v, toep, bh, bw, hw, scaling, heads)


def _core_fwd(q, k, v, toep, bh, bw, hw, scaling, heads):
    out, lse = _det_flash_fwd(q, k, v, toep, bh, bw, hw, scaling, heads,
                              with_lse=True)
    return out, (q, k, v, toep, bh, bw, out, lse)


def _core_bwd(hw, scaling, heads, res, g):
    # Pallas two-pass flash backward by default: dq/dk/dv/dbh/dbw/dtoep
    # without materializing (B, H, L, L) anything.  toep gets a real
    # cotangent: the shared bucket table is trainable in det finetuning
    # and toeplitz_tables is itself differentiable, so d(table) flows
    # end-to-end.  ONE_PEACE_DET_BWD=xla selects the materializing
    # einsum-vjp fallback (exact, for A/B and small grids).
    import os

    q, k, v, toep, bh, bw, out, lse = res
    if os.environ.get("ONE_PEACE_DET_BWD", "pallas") != "xla":
        return _det_flash_bwd(q, k, v, toep, bh, bw, out, g, lse, hw,
                              scaling, heads)
    has_decomp = bh is not None
    has_toep = toep is not None

    def f(q_, k_, v_, toep_, bh_, bw_):
        return _xla_core(q_, k_, v_, toep_ if has_toep else None,
                         bh_ if has_decomp else None,
                         bw_ if has_decomp else None, hw, scaling, heads)

    _, vjp = jax.vjp(f, q, k, v, toep, bh, bw)
    dq, dk, dv, dtoep, dbh, dbw = vjp(g)
    return dq, dk, dv, (dtoep if has_toep else None), \
        (dbh if has_decomp else None), (dbw if has_decomp else None)


_det_attention_core.defvjp(_core_fwd, _core_bwd)


def _shard_map_det_flash(q, k, v, toep, rel_h, rel_w, hw, scaling):
    """shard_map wrapper for multi-chip det training: batch shards over
    the data axes (dp, fsdp); the bias tables are replicated, and
    shard_map's transpose inserts the psum over data axes for their
    cotangents (same pattern as ops/attention._shard_map_flash, verified
    by tests/test_det_attention.py::test_shard_map_*).  Returns None when
    the batch does not divide the mesh (caller falls back to XLA)."""
    from jax.sharding import PartitionSpec as P

    from .attention import _FLASH_MESH as mesh

    names = set(mesh.axis_names)
    data = tuple(a for a in ("dp", "fsdp") if a in names)
    if not data:
        return None
    ndata = 1
    for a in data:
        ndata *= mesh.shape[a]
    if q.shape[0] % max(ndata, 1):
        return None

    qkv_spec = P(data, None, None, None)
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    for t in (toep, rel_h, rel_w):
        if t is not None:
            in_specs.append(P(*([None] * t.ndim)))
            args.append(t)

    def local_fn(*xs):
        it = iter(xs)
        q_, k_, v_ = next(it), next(it), next(it)
        tp_ = next(it) if toep is not None else None
        rh_ = next(it) if rel_h is not None else None
        rw_ = next(it) if rel_w is not None else None
        return _det_flash_direct(q_, k_, v_, tp_, rh_, rw_, hw, scaling)

    return jax.shard_map(local_fn, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=qkv_spec, axis_names=set(data),
                         check_vma=False)(*args)


def _det_flash_direct(q, k, v, toep, rel_h, rel_w, hw, scaling):
    b, l, heads, dh = q.shape
    if rel_h is not None:
        bh, bw = _compute_decomp(q, rel_h, rel_w, hw)
    else:
        bh = bw = None
    out = _det_attention_core(
        q.reshape(b, l, heads * dh), k.reshape(b, l, heads * dh),
        v.reshape(b, l, heads * dh), toep, bh, bw, hw, scaling, heads)
    return out.reshape(b, l, heads, dh)


def det_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    toep: Optional[jnp.ndarray],
    rel_h: Optional[jnp.ndarray],
    rel_w: Optional[jnp.ndarray],
    hw: Tuple[int, int],
    scaling: float,
) -> jnp.ndarray:
    """Fused global-grid attention.  q/k/v (B, L, heads, dh) with
    L = hw[0]*hw[1]; toep from :func:`toeplitz_tables` (sliced to the
    actual grid); rel_h/rel_w the per-layer decomposed tables or None.

    The decomposed-bias factors are computed OUTSIDE the custom-vjp core
    (two small einsums over the unscaled q) so their backward — drel_h /
    drel_w and the decomp contribution to dq — is ordinary XLA AD chained
    onto the kernel's dbh/dbw cotangents.

    Under a registered multi-device mesh (ops.attention.set_flash_mesh)
    the kernel runs through shard_map with the batch sharded over the
    data axes — without it, multi-chip 1024px det training would fall
    back to the materializing XLA path, which cannot compile there."""
    from .attention import _flash_mode

    if _flash_mode() == "shard_map":
        out = _shard_map_det_flash(q, k, v, toep, rel_h, rel_w, hw, scaling)
        if out is not None:
            return out
    return _det_flash_direct(q, k, v, toep, rel_h, rel_w, hw, scaling)


def det_flash_supported(hw: Tuple[int, int], heads: int, dh: int) -> bool:
    """Grids with Mosaic-legal tiles on a real TPU — single chip, or any
    chip count with a registered mesh (the shard_map path) — or under the
    interpreter for tests, where tiling is not enforced."""
    from .attention import _flash_mode

    hg, wg = hw
    if _interpret():
        return hg >= 2 and wg >= 2
    if _flash_mode() == "off":
        return False
    return hg >= 2 and wg >= 2 and (dh % 8 == 0) \
        and _head_pack(heads, dh) is not None \
        and _pick_rows(hg, wg) is not None
