"""RoIAlign — region-of-interest feature pooling.

The core primitive of the reference's detection app (detectron2's
ROIAlignV2 under the cascade R-CNN heads).  TPU-native formulation:
fixed-shape bilinear sampling over an NHWC feature map — for each of the
``output_size x output_size`` bins, ``sampling_ratio**2`` regular sample
points are bilinearly interpolated (aligned=True half-pixel convention,
i.e. ROIAlignV2) and averaged.  Fully vectorized: (num_rois, S, S, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C); y/x (...,) continuous pixel coords.  Zero padding
    outside; returns (..., C).  Delegates to the canonical zero-padded
    4-tap sampler shared with the deformable-attention op."""
    from .ms_deform_attn import _bilinear_sample

    h, w, c = feat.shape
    return _bilinear_sample(feat.reshape(h * w, c), x, y, h, w)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_indices: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """features (B, H, W, C) NHWC; rois (N, 4) as (x0, y0, x1, y1) in input
    coordinates; batch_indices (N,) int.  Returns (N, S, S, C)."""
    s = output_size
    r = sampling_ratio
    x0 = rois[:, 0] * spatial_scale
    y0 = rois[:, 1] * spatial_scale
    x1 = rois[:, 2] * spatial_scale
    y1 = rois[:, 3] * spatial_scale
    bin_w = (x1 - x0) / s
    bin_h = (y1 - y0) / s

    # sample-point offsets inside a bin: (i + 0.5)/r for i in range(r)
    offs = (jnp.arange(r) + 0.5) / r
    # grid of (S*r) sample coordinates along each axis per roi
    grid = jnp.arange(s)[:, None] + offs[None, :]  # (S, r) in bin units
    grid = grid.reshape(-1)  # (S*r,)

    ys = y0[:, None] + grid[None, :] * bin_h[:, None]  # (N, S*r)
    xs = x0[:, None] + grid[None, :] * bin_w[:, None]
    # aligned=True (ROIAlignV2): coordinates are continuous with half-pixel
    # centers -> subtract 0.5 to index pixel centers
    ys = ys - 0.5
    xs = xs - 0.5

    def one_roi(b_idx, ys_i, xs_i):
        feat = features[b_idx]
        yy = jnp.repeat(ys_i, s * r).reshape(s * r, s * r)
        xx = jnp.tile(xs_i, (s * r, 1))
        sampled = _bilinear(feat, yy, xx)  # (S*r, S*r, C)
        c = sampled.shape[-1]
        pooled = sampled.reshape(s, r, s, r, c).mean(axis=(1, 3))
        return pooled

    return jax.vmap(one_roi)(batch_indices, ys, xs)
