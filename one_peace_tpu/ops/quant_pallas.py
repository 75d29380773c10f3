"""Pallas int8 matmul — the double-rate MXU path.

XLA's int8 dot_general was measured at only +2% over bf16 on v5e
(CLAUDE.md r1): it converts the int32 accumulator through fp32 fusions
that dominate. This kernel keeps the int8 x int8 -> int32 accumulation in
VMEM across the K loop and applies the per-row activation scale and
per-channel weight scale in-register before the single bf16 store — the
only HBM traffic is x_q, w_q once and the bf16 output.

Layout: x_q (M, K) int8, w_q (K, N) int8, sx (1, M) f32, sw (1, N) f32.
Grid (M/bm, N/bn, K/bk) with K innermost; the output block index map is
K-invariant so the int32 accumulator lives in a VMEM scratch and the
store happens on the last K step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM, BN, BK = 256, 512, 512


def _interpret() -> bool:
    """Honor ONE_PEACE_PALLAS_INTERPRET like every other kernel in ops/
    (read at trace time through the flash_attention module attribute so
    tests can monkeypatch it)."""
    from . import flash_attention

    return flash_attention.INTERPRET


def _kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        sx = sx_ref[0][:, None]
        sw = sw_ref[0][None, :]
        o_ref[...] = (acc_ref[...].astype(jnp.float32) * sx * sw).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def int8_matmul(x_q: jnp.ndarray, w_q: jnp.ndarray, sx: jnp.ndarray,
                sw: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x_q (M, K) int8 @ w_q (K, N) int8 -> (M, N) out_dtype, scaled by
    sx (M,) per-row and sw (N,) per-channel fp32 scales."""
    m, k = x_q.shape
    n = w_q.shape[1]
    bm, bn, bk = min(BM, -(-m // 8) * 8), min(BN, n), min(BK, k)
    mp = -(-m // bm) * bm
    kp = -(-k // bk) * bk
    np_ = -(-n // bn) * bn
    if mp != m:
        x_q = jnp.pad(x_q, ((0, mp - m), (0, 0)))
        sx = jnp.pad(sx, (0, mp - m))
    if kp != k:
        x_q = jnp.pad(x_q, ((0, 0), (0, kp - k)))
        w_q = jnp.pad(w_q, ((0, kp - k), (0, 0)))
    if np_ != n:
        w_q = jnp.pad(w_q, ((0, 0), (0, np_ - n)))
        sw = jnp.pad(sw, (0, np_ - n))

    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, kk: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=_interpret(),
    )(x_q, w_q, sx.reshape(1, -1).astype(jnp.float32),
      sw.reshape(1, -1).astype(jnp.float32))
    return out[:m, :n]
