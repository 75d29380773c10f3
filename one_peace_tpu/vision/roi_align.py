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

    # 4-tap bilinear over a batch-flattened feature map: one gather per
    # tap, never materializing a per-roi (H, W, C) copy (a vmap'd
    # features[b_idx] gather costs N full feature maps — gigabytes at
    # detection scale).  Border handling follows detectron2's
    # bilinear_interpolate exactly: samples beyond 1px outside the image
    # contribute zero; samples within (-1, 0] clamp to the edge row/col
    # (ROIAlign_cpu.cpp: `if (y <= 0) y = 0`), NOT zero-padded bilinear.
    b, h, w, c = features.shape
    n = rois.shape[0]
    flat = features.reshape(b * h * w, c)
    yy = ys[:, :, None]  # (N, S*r, 1) broadcasting rows
    xx = xs[:, None, :]  # (N, 1, S*r)
    inside = ((yy > -1.0) & (yy < h) & (xx > -1.0) & (xx < w))
    yy = jnp.clip(yy, 0.0, h - 1)
    xx = jnp.clip(xx, 0.0, w - 1)
    y0f = jnp.floor(yy)
    x0f = jnp.floor(xx)
    base = batch_indices.astype(jnp.int32)[:, None, None] * (h * w)
    acc = jnp.zeros((n, s * r, s * r, c), features.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0f + dy
            xi = x0f + dx
            wgt = ((1.0 - jnp.abs(yy - yi)) * (1.0 - jnp.abs(xx - xi)))
            wgt = jnp.where(inside, wgt, 0.0).astype(features.dtype)
            idx = base + (jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
                          + jnp.clip(xi, 0, w - 1).astype(jnp.int32))
            acc = acc + wgt[..., None] * flat[idx]
    return acc.reshape(n, s, r, s, r, c).mean(axis=(2, 4))


def multi_level_roi_align(
    features,
    strides,
    rois: jnp.ndarray,
    batch_indices: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """detectron2 ROIPooler over an FPN: each RoI pools from the level
    matching its scale (poolers.py assign_boxes_to_levels:
    ``floor(canonical_level + log2(sqrt(area)/canonical_box_size))``,
    clamped to the available levels).

    features: per-stride NHWC maps; strides: e.g. (4, 8, 16, 32).  Static
    shape: every level pools every RoI (4 cheap gathers) and a one-hot
    level mask selects the right one — no data-dependent partition.
    """
    import math

    areas = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    lvl = jnp.floor(
        canonical_level
        + jnp.log2(jnp.sqrt(jnp.maximum(areas, 0.0)) / canonical_box_size
                   + 1e-8))
    min_lvl = int(round(math.log2(strides[0])))
    assign = jnp.clip(lvl - min_lvl, 0, len(strides) - 1).astype(jnp.int32)
    out = None
    for li, (f, s) in enumerate(zip(features, strides)):
        pooled = roi_align(f, rois, batch_indices, output_size, 1.0 / s,
                           sampling_ratio)
        sel = (assign == li).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
