"""MSDeformAttn vs the torch grid_sample reference formulation."""

import numpy as np
import pytest


def test_matches_torch_grid_sample():
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from one_peace_tpu.vision.ms_deform_attn import ms_deform_attn_core

    rs = np.random.RandomState(0)
    n, m, d = 2, 3, 8
    shapes = [(8, 8), (4, 4)]
    s = sum(h * w for h, w in shapes)
    lq, p = 5, 4
    levels = len(shapes)
    value = rs.randn(n, s, m, d).astype(np.float32)
    locs = rs.rand(n, lq, m, levels, p, 2).astype(np.float32)
    weights = rs.rand(n, lq, m, levels, p).astype(np.float32)
    weights = weights / weights.reshape(n, lq, m, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)))

    # torch reference (ref ms_deform_attn_func.py:49-72)
    tv = torch.tensor(value)
    tl = torch.tensor(locs)
    tw = torch.tensor(weights)
    value_list = tv.split([h * w for h, w in shapes], dim=1)
    grids = 2 * tl - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros", align_corners=False))
    aw = tw.transpose(1, 2).reshape(n * m, 1, lq, levels * p)
    want = ((torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1)
            .view(n, m * d, lq).transpose(1, 2)).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
