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

Forward only: the backward falls back to the XLA einsum vjp (exact,
materializing) — global-layer training at 1024 px fits with remat, and
the kernel's raison d'être is high-resolution inference + fwd memory.

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

from .flash_attention import INTERPRET as _FA_INTERPRET


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


def _make_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep, has_decomp, nk):
    blk_q, blk_k = c * wg, ck * wg

    def kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, toep_hbm, o_ref,
               acc_ref, mstat_ref, lstat_ref, slab_ref, sem):
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
            if has_toep:
                # both parity buffers load from VMEM; select the live one
                t = jnp.where(slot == 0, slab_ref[0, i], slab_ref[1, i])
                rows = [
                    jnp.concatenate(
                        [t[a - b + ck - 1][:, :wg] for b in range(ck)],
                        axis=-1)
                    for a in range(c)
                ]  # c x (wg, blk_k)
                s = s + jnp.concatenate(rows, axis=0)
            if has_decomp:
                bh = bh_ref[0, i].astype(jnp.float32)  # (ck, blk_q)
                bw = bw_ref[0, i].astype(jnp.float32)  # (blk_q, wg)
                # expand bh over each kh-slot's wg columns via a tiny MXU
                # matmul against a static block indicator (Mosaic cannot
                # shape-cast (blk_q, ck, wg) -> (blk_q, blk_k))
                kh_row = jax.lax.broadcasted_iota(jnp.int32, (ck, blk_k), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (ck, blk_k), 1)
                expand = (col // wg == kh_row).astype(jnp.float32)
                s = s + jax.lax.dot_general(
                    bh, expand, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # tile bw over the ck kh-slots with a second indicator
                # matmul ((blk_q, wg) @ (wg, blk_k)) — a lane concat of
                # ck 64-lane pieces would relayout on the VPU
                row_w = jax.lax.broadcasted_iota(jnp.int32, (wg, blk_k), 0)
                col_w = jax.lax.broadcasted_iota(jnp.int32, (wg, blk_k), 1)
                tile_mat = (col_w % wg == row_w).astype(jnp.float32)
                s = s + jax.lax.dot_general(
                    bw, tile_mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

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

    return kernel


def _det_flash_fwd(q, k, v, toep, bh, bw, hw, scaling):
    """q/k/v (B, L, H*dh); toep (H, 2hg-1, wg, wg) | None;
    bh (B, H, hg, L) | None; bw (B, H, L, wg) | None."""
    b, l, hdim = q.shape
    hg, wg = hw
    heads = (toep.shape[0] if toep is not None else bh.shape[1])
    dh = hdim // heads
    m = 2 if (heads % 2 == 0 and dh * 2 <= 256 and (dh * 2) % 128 == 0) else 1
    if (dh * m) % 128:
        m = 1
    import os

    # tile defaults measured on v5e (64x64 grid, toep+decomp): 512/512
    # 10.0 ms -> 512/2048 7.66 ms (fewer k-steps amortize bookkeeping) ->
    # 512/1024 + double-buffered slab prefetch 7.60 ms.  2048 with two
    # slab slots exceeds the 16 MB scoped-VMEM budget, so 1024 it is.
    tq = int(os.environ.get("ONE_PEACE_DET_BLKQ", "512"))
    tk = int(os.environ.get("ONE_PEACE_DET_BLKK", "1024"))
    c = _pick_rows(hg, wg, target=tq)
    ck = _pick_rows(hg, wg, target=tk)
    if c is None or ck is None:
        assert _interpret(), (hg, wg)  # gated by det_flash_supported on TPU
        c = c or _pick_rows_any(hg, wg, tq)
        ck = ck or _pick_rows_any(hg, wg, tk)
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
    wg_pad = max(-(-wg // 128) * 128, 128)
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

    out = pl.pallas_call(
        _make_kernel(m, dh, c, ck, hg, wg, wg_pad, scaling, has_toep, has_decomp, nk),
        grid=(b, heads // m, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_q, m * dh),
                               lambda bi, hi, qi, ki: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, hdim), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, m * dh), jnp.float32),        # acc
            pltpu.VMEM((m, blk_q), jnp.float32),             # running max
            pltpu.VMEM((m, blk_q), jnp.float32),             # running sum
            pltpu.VMEM((2, m, c + ck - 1, wg, wg_pad), jnp.float32),  # 2-slot slab
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(q, k, v, bh_arg, bw_arg, toep_arg)
    return out


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _det_attention_core(q, k, v, toep, rel_h, rel_w, hw, scaling, heads):
    if rel_h is not None:
        bh, bw = _compute_decomp(q.reshape(q.shape[:2] + (heads, -1)),
                                 rel_h, rel_w, hw)
    else:
        bh = bw = None
    return _det_flash_fwd(q, k, v, toep, bh, bw, hw, scaling)


def _core_fwd(q, k, v, toep, rel_h, rel_w, hw, scaling, heads):
    out = _det_attention_core(q, k, v, toep, rel_h, rel_w, hw, scaling, heads)
    return out, (q, k, v, toep, rel_h, rel_w)


def _core_bwd(hw, scaling, heads, res, g):
    # XLA einsum vjp: exact but materializing — training-capable at
    # 1024 px with remat; the fwd kernel is the memory/speed win.
    # toep gets a real cotangent (gather transpose): the shared bucket
    # table is trainable in det finetuning and toeplitz_tables is itself
    # differentiable, so d(table) flows end-to-end.
    q, k, v, toep, rel_h, rel_w = res
    has_rel = rel_h is not None
    has_toep = toep is not None

    def f(q_, k_, v_, toep_, rel_h_, rel_w_):
        return _xla_reference(q_, k_, v_, toep_ if has_toep else None,
                              rel_h_ if has_rel else None,
                              rel_w_ if has_rel else None,
                              hw, scaling, heads)

    _, vjp = jax.vjp(f, q, k, v, toep, rel_h, rel_w)
    dq, dk, dv, dtoep, drh, drw = vjp(g)
    return dq, dk, dv, (dtoep if has_toep else None), \
        (drh if has_rel else None), (drw if has_rel else None)


_det_attention_core.defvjp(_core_fwd, _core_bwd)


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
    actual grid); rel_h/rel_w the per-layer decomposed tables or None."""
    b, l, heads, dh = q.shape
    out = _det_attention_core(
        q.reshape(b, l, heads * dh), k.reshape(b, l, heads * dh),
        v.reshape(b, l, heads * dh), toep, rel_h, rel_w, hw, scaling, heads)
    return out.reshape(b, l, heads, dh)


def det_flash_supported(hw: Tuple[int, int], heads: int, dh: int) -> bool:
    """Grids with Mosaic-legal tiles on a real TPU (or under the
    interpreter for tests, where tiling is not enforced)."""
    hg, wg = hw
    try:
        on_tpu = jax.default_backend() == "tpu" and jax.device_count() == 1
    except Exception:
        return False
    if _interpret():
        return hg >= 2 and wg >= 2
    if not on_tpu:
        return False
    return hg >= 2 and wg >= 2 and (dh % 8 == 0) \
        and _pick_rows(hg, wg) is not None
