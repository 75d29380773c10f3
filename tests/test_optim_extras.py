"""Adan vs the reference torch implementation, and converter upgrades."""

import numpy as np
import pytest


def test_adan_matches_torch_reference():
    """Step the optax Adan and an independent torch re-implementation of
    the reference update rule (ref one_peace/optim/adan.py:146-223) on the
    same quadratic; parameters must track."""
    import jax
    import jax.numpy as jnp
    import torch

    from one_peace_tpu.optim.adan import adan

    lr = 1e-2
    wd = 0.05
    betas = (0.98, 0.92, 0.99)
    eps = 1e-8
    target = np.linspace(-1, 1, 8).astype(np.float32)

    # --- optax
    tx = adan(lambda _: lr, betas=betas, eps=eps, weight_decay=wd)
    p = jnp.zeros(8)
    state = tx.init(p)

    def loss(p):
        return jnp.sum((p - jnp.asarray(target)) ** 2)

    for _ in range(5):
        g = jax.grad(loss)(p)
        upd, state = tx.update(g, state, p)
        p = p + upd

    # --- torch reference math
    tp = torch.zeros(8)
    m = torch.zeros(8)
    v = torch.zeros(8)
    d = torch.zeros(8)
    prev = None
    b1, b2, b3 = betas
    for step in range(1, 6):
        g = 2 * (tp - torch.tensor(target))
        if prev is None:
            prev = g.clone()
        diff = g - prev
        update_in = g + b2 * diff
        m.mul_(b1).add_(g, alpha=1 - b1)
        d.mul_(b2).add_(diff, alpha=1 - b2)
        v.mul_(b3).addcmul_(update_in, update_in, value=1 - b3)
        bc1, bc2, bc3 = 1 - b1**step, 1 - b2**step, 1 - b3**step
        denom = (v.sqrt() / (bc3**0.5)).add_(eps)
        upd = (m / bc1 + b2 * d / bc2) / denom
        tp.add_(upd, alpha=-lr)
        tp.div_(1 + lr * wd)
        prev = g.clone()

    np.testing.assert_allclose(np.asarray(p), tp.numpy(), rtol=1e-4, atol=1e-5)


def test_bicubic_matrix_matches_torch():
    """utils.interpolate must equal F.interpolate bicubic exactly."""
    import torch
    import torch.nn.functional as F

    from one_peace_tpu.utils.interpolate import resize_pos_embed_2d

    rs = np.random.RandomState(0)
    pos = rs.randn(16 * 16, 4).astype(np.float32)
    got = resize_pos_embed_2d(pos, 16, 24)
    grid = torch.tensor(pos).reshape(1, 16, 16, 4).permute(0, 3, 1, 2)
    want = F.interpolate(grid, size=(24, 24), mode="bicubic")
    want = want.permute(0, 2, 3, 1).reshape(24 * 24, 4).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resolution_upgrade_through_converter():
    """Build params for 384px from a 256px-style state dict: pos tables
    must be interpolated to the larger grids."""
    import torch_fixture as tf
    from helpers import tiny_model_config
    from one_peace_tpu.utils.checkpoint_convert import convert_retrieval_model

    cfg_small = tiny_model_config(head_type="val")
    sd = tf.make_random_state_dict(cfg_small, seed=0)
    cfg_big = tiny_model_config(head_type="val")
    cfg_big.encoder.image_adapter.bucket_size = 3
    cfg_big.encoder.image_adapter.rel_bucket_size = 3
    params = convert_retrieval_model(sd, cfg_big)
    ia = params["encoder_wrapper"]["image_adapter"]
    assert ia["pos_embed"].shape[0] == 3 * 3 + 1
    assert ia["rel_pos_table"].shape[1] == (2 * 3 - 1) ** 2 + 3


def test_randaugment_runs():
    from PIL import Image

    from one_peace_tpu.data.randaugment import (
        GaussianBlur, RandomAugment, RandomDistortion)

    rs = np.random.RandomState(0)
    img = Image.fromarray(rs.randint(0, 255, (64, 64, 3), dtype=np.uint8))
    out = RandomAugment(2, 7, seed=1)(img)
    out = RandomDistortion(seed=1)(out)
    out = GaussianBlur(prob=1.0, seed=1)(out)
    assert out.size == (64, 64)
    assert np.asarray(out).dtype == np.uint8


def test_use_adan_selects_adan():
    """optimizer.use_adan must actually route build_optimizer to the Adan
    chain (it was silently ignored before r5) — detectable by the AdanState
    in the optimizer state and by finite, param-moving updates."""
    import jax
    import jax.numpy as jnp

    from one_peace_tpu.core.config import (
        OptimizationConfig, OptimizerConfig)
    from one_peace_tpu.optim.adamw import build_optimizer
    from one_peace_tpu.optim.adan import AdanState

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    cfg = OptimizerConfig(use_adan=True)
    tx = build_optimizer(cfg, OptimizationConfig(clip_norm=1.0),
                         lambda step: 1e-3, params)
    state = tx.init(params)
    assert any(isinstance(s, AdanState) for s in jax.tree.leaves(
        state, is_leaf=lambda x: isinstance(x, AdanState))), state
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    assert all(bool(jnp.isfinite(u).all()) for u in jax.tree.leaves(updates))
    assert float(jnp.abs(updates["w"]).max()) > 0
