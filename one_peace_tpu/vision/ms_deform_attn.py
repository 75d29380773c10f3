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


class MSDeformAttnModule:
    """The full deformable-attention layer (deformable-DETR form, as used
    by the reference's seg/ops/modules): value/offset/weight projections
    around the sampling core, with the channel ``ratio`` trick.

    params: value_proj (D, D*ratio), sampling_offsets (D, M*L*P*2),
    attention_weights (D, M*L*P), output_proj (D*ratio, D)."""

    def __init__(self, d_model: int, n_levels: int = 1, n_heads: int = 6,
                 n_points: int = 4, ratio: float = 1.0):
        self.d = d_model
        self.levels = n_levels
        self.heads = n_heads
        self.points = n_points
        self.ratio = ratio
        self.dv = int(d_model * ratio)

    def init(self, key, dtype=jnp.float32):
        import numpy as np

        from ..models.components import init_linear

        keys = jax.random.split(key, 4)
        params = {
            "value_proj": init_linear(keys[0], self.d, self.dv, dtype=dtype),
            "sampling_offsets": init_linear(
                keys[1], self.d, self.heads * self.levels * self.points * 2,
                dtype=dtype),
            "attention_weights": init_linear(
                keys[2], self.d, self.heads * self.levels * self.points,
                dtype=dtype),
            "output_proj": init_linear(keys[3], self.dv, self.d, dtype=dtype),
        }
        # deformable-DETR init: offsets weight zero, bias pointing at a
        # ring of directions scaled by point index
        thetas = np.arange(self.heads) * (2.0 * np.pi / self.heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, self.levels, self.points, 1))
        for p in range(self.points):
            grid[:, :, p] *= p + 1
        params["sampling_offsets"]["w"] = jnp.zeros_like(
            params["sampling_offsets"]["w"])
        params["sampling_offsets"]["b"] = jnp.asarray(
            grid.reshape(-1), dtype)
        params["attention_weights"]["w"] = jnp.zeros_like(
            params["attention_weights"]["w"])
        params["attention_weights"]["b"] = jnp.zeros_like(
            params["attention_weights"]["b"])
        return params

    def __call__(self, params, query, reference_points, value,
                 spatial_shapes) -> jnp.ndarray:
        """query (N, Lq, D); reference_points (N, L_total_q, 1_or_L, 2) in
        [0,1]; value (N, S, D) flattened levels; spatial_shapes: list of
        (H, W)."""
        from ..models.components import linear

        n, lq, _ = query.shape
        s = value.shape[1]
        m, levels, p = self.heads, self.levels, self.points
        v = linear(params["value_proj"], value).reshape(n, s, m, self.dv // m)
        offsets = linear(params["sampling_offsets"], query).reshape(
            n, lq, m, levels, p, 2)
        weights = linear(params["attention_weights"], query).reshape(
            n, lq, m, levels * p)
        weights = jax.nn.softmax(weights, axis=-1).reshape(n, lq, m, levels, p)

        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], jnp.float32)  # (L, 2)
        # reference_points (N, Lq, 1_or_L, 2) -> (N, Lq, 1, 1_or_L, 1, 2),
        # broadcast against offsets (N, Lq, M, L, P, 2)
        ref = reference_points[:, :, None, :, None, :]
        locs = ref + offsets / normalizer[None, None, None, :, None, :]
        out = ms_deform_attn_core(v, spatial_shapes, locs, weights)
        return linear(params["output_proj"], out)
