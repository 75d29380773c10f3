"""Multi-scale deformable attention — TPU-native.

Capability equivalent of the reference's MSDeformAttn CUDA op
(ref: one_peace_vision/seg/ops/src/cuda/ms_deform_im2col_cuda.cuh, with
the pytorch-core semantics in seg/ops/functions/ms_deform_attn_func.py:
49-72): for each query, P sampling points per level per head are read
from multi-scale value maps with bilinear interpolation
(align_corners=False, zero padding) and blended by attention weights.

On TPU the bilinear gather vectorizes cleanly in XLA (one_hot-free
gathers over flattened spatial maps + 4-tap lerp); no custom kernel is
needed for the sizes used by ViT-Adapter (the CUDA op exists because
torch's grid_sample was slow, not because the math is exotic).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(value_map: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    value_map: (H*W, D); x/y: (...,) pixel coordinates in grid_sample's
    align_corners=False convention (already scaled to pixel centers).
    Returns (..., D)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + jnp.clip(
            xi, 0, w - 1).astype(jnp.int32)
        vals = value_map[idx]
        return vals * inside[..., None].astype(vals.dtype)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    txe = tx[..., None]
    tye = ty[..., None]
    top = v00 * (1 - txe) + v01 * txe
    bot = v10 * (1 - txe) + v11 * txe
    return top * (1 - tye) + bot * tye


def ms_deform_attn_core(
    value: jnp.ndarray,
    value_spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Semantics of ms_deform_attn_core_pytorch (ref :49-72).

    value: (N, S, M, D) flattened multi-level value maps (S = sum H*W);
    sampling_locations: (N, Lq, M, L, P, 2) in [0, 1] (x, y);
    attention_weights: (N, Lq, M, L, P), softmaxed over L*P.
    Returns (N, Lq, M*D).
    """
    n, s, m, d = value.shape
    _, lq, _, levels, p, _ = sampling_locations.shape
    offsets = []
    off = 0
    for (h, w) in value_spatial_shapes:
        offsets.append(off)
        off += h * w

    outputs = []
    for lid, (h, w) in enumerate(value_spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(value, offsets[lid], h * w, axis=1)
        # grid_sample align_corners=False: grid g in [-1,1] maps to pixel
        # x = ((g + 1) * W - 1) / 2 with g = 2*loc - 1 -> x = loc*W - 0.5
        locs = sampling_locations[:, :, :, lid]  # (N, Lq, M, P, 2)
        x = locs[..., 0] * w - 0.5
        y = locs[..., 1] * h - 0.5

        def sample_one(vm, xx, yy):
            # vm: (HW, M, D) -> per-head maps; xx/yy: (Lq, M, P)
            def head(vm_h, x_h, y_h):
                return _bilinear_sample(vm_h, x_h, y_h, h, w)  # (Lq, P, D)

            return jax.vmap(head, in_axes=(1, 1, 1), out_axes=1)(
                vm, xx, yy)  # (Lq, M, P, D)

        sampled = jax.vmap(sample_one)(vmap_l, x, y)  # (N, Lq, M, P, D)
        outputs.append(sampled)

    stacked = jnp.stack(outputs, axis=3)  # (N, Lq, M, L, P, D)
    weighted = stacked * attention_weights[..., None]
    out = weighted.sum(axis=(3, 4))  # (N, Lq, M, D)
    return out.reshape(n, lq, m * d)
