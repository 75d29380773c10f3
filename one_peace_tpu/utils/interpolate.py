"""torch-compatible bicubic interpolation as precomputed linear maps.

torch ``F.interpolate(mode='bicubic', align_corners=False)`` (used by the
reference for positional-embedding rescaling, ref: adapter/image.py:173-186,
294-305) is a separable linear operation: out = W_h @ img @ W_w^T.  Since all
sizes are static per config, we precompute the (dst, src) weight matrices in
numpy — on TPU the resize then runs as two small matmuls, exact to the
reference's cubic kernel (Catmull-Rom variant with A = -0.75).
"""

from __future__ import annotations

import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch/OpenCV cubic convolution kernel with A=-0.75."""
    absx = np.abs(x)
    absx2 = absx**2
    absx3 = absx**3
    w = np.where(
        absx <= 1.0,
        (a + 2.0) * absx3 - (a + 3.0) * absx2 + 1.0,
        np.where(
            absx < 2.0,
            a * absx3 - 5.0 * a * absx2 + 8.0 * a * absx - 4.0 * a,
            0.0,
        ),
    )
    return w


def bicubic_resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix M with out = M @ in along one axis, matching
    torch bicubic with align_corners=False (half-pixel centers, edge clamp,
    no antialias)."""
    scale = src / dst
    out_idx = np.arange(dst, dtype=np.float64)
    # half-pixel center mapping
    in_coord = (out_idx + 0.5) * scale - 0.5
    base = np.floor(in_coord).astype(np.int64)
    frac = in_coord - base
    M = np.zeros((dst, src), dtype=np.float64)
    for tap in range(-1, 3):
        w = _cubic_kernel(tap - frac)
        idx = np.clip(base + tap, 0, src - 1)
        for i in range(dst):
            M[i, idx[i]] += w[i]
    return M.astype(np.float32)


def resize_pos_embed_2d(pos: np.ndarray, src_size: int, dst_size: int) -> np.ndarray:
    """Resize a (src*src, D) 2-D positional table to (dst*dst, D) with
    torch-compatible bicubic (used host-side during checkpoint upgrade)."""
    d = pos.shape[-1]
    grid = pos.reshape(src_size, src_size, d)
    mh = bicubic_resize_matrix(src_size, dst_size)
    out = np.einsum("oi,ijd->ojd", mh, grid)
    out = np.einsum("pj,ojd->opd", mh, out)
    return out.reshape(dst_size * dst_size, d)
