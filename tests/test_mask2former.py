"""Mask2Former head: auction matcher exactness, set-prediction forward,
loss semantics, and the end-to-end ade20k_seg task with
``seg_head=mask2former`` (the reference's shipped ADE20K recipe,
ref seg/configs/ade20k/mask2former_onepeace_adapter_g_896_40k_ade20k)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_encoder_config


def test_auction_assign_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    from one_peace_tpu.vision.matching import auction_assign

    rs = np.random.RandomState(0)
    fn = jax.jit(auction_assign)
    for k, n in [(1, 8), (5, 12), (16, 20), (11, 40)]:
        cost = rs.randn(k, n).astype(np.float32) * rs.uniform(0.5, 10)
        col = np.asarray(fn(jnp.asarray(cost), jnp.ones((k,), bool)))
        assert len(set(col.tolist())) == k, "assignment must be injective"
        ri, ci = linear_sum_assignment(cost)
        np.testing.assert_allclose(cost[np.arange(k), col].sum(),
                                   cost[ri, ci].sum(), rtol=1e-5)


def test_auction_assign_padded_rows():
    from scipy.optimize import linear_sum_assignment

    from one_peace_tpu.vision.matching import auction_assign

    rs = np.random.RandomState(1)
    cost = rs.randn(8, 16).astype(np.float32)
    valid = np.array([True] * 5 + [False] * 3)
    col = np.asarray(jax.jit(auction_assign)(jnp.asarray(cost),
                                             jnp.asarray(valid)))
    assert len(set(col.tolist())) == 8
    ri, ci = linear_sum_assignment(cost[:5])
    np.testing.assert_allclose(cost[np.arange(5), col[:5]].sum(),
                               cost[ri, ci].sum(), rtol=1e-5)


def test_point_sample_matches_grid_sample():
    """point_sample must reproduce torch grid_sample align_corners=False
    (zero padding) — the contract mmcv's point losses rely on."""
    import torch
    import torch.nn.functional as F

    from one_peace_tpu.vision.mask2former_loss import point_sample

    rs = np.random.RandomState(2)
    mask = rs.randn(5, 9).astype(np.float32)
    pts = rs.rand(31, 2).astype(np.float32)  # (x, y) in [0, 1]
    got = np.asarray(point_sample(jnp.asarray(mask), jnp.asarray(pts)))
    grid = torch.from_numpy(pts * 2 - 1)[None, :, None, :]  # (1, P, 1, 2)
    want = F.grid_sample(torch.from_numpy(mask)[None, None], grid,
                         align_corners=False)[0, 0, :, 0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_m2f():
    from one_peace_tpu.vision.zoo import OnePeaceMask2FormerSegmenter

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    seg = OnePeaceMask2FormerSegmenter(
        cfg, num_classes=5, feat_channels=32, num_queries=12, dec_layers=3,
        dec_heads=4, pixel_layers=2, pixel_heads=4, conv_inplane=8,
        deform_num_heads=4, init_values=0.5)
    params = seg.init(jax.random.PRNGKey(0))
    return seg, params


@pytest.mark.slow
def test_mask2former_forward_shapes(tiny_m2f):
    seg, params = tiny_m2f
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 3, 64, 64),
                       jnp.float32)
    all_cls, all_masks = jax.jit(seg.forward_sets)(params, imgs)
    # 1 initial + 3 decoder-layer predictions; masks at stride 4
    assert all_cls.shape == (4, 2, 12, 6)
    assert all_masks.shape == (4, 2, 12, 16, 16)
    assert bool(jnp.isfinite(all_cls).all())
    assert bool(jnp.isfinite(all_masks).all())
    sem = jax.jit(seg.logits)(params, imgs)
    assert sem.shape == (2, 16, 16, 5)
    assert bool(jnp.isfinite(sem).all())


def test_mask2former_loss_prefers_correct_predictions(tiny_m2f):
    """GT-aligned set predictions must score a (much) lower loss than
    anti-aligned ones — matching + CE + mask/dice all pulling together."""
    from one_peace_tpu.vision.mask2former_loss import mask2former_loss

    rs = np.random.RandomState(3)
    b, q, c, h = 2, 8, 5, 16
    # blocky GT (8px blocks): bilinear point sampling of {0,1} masks is
    # fractional at class boundaries, so a salt-and-pepper GT would pay
    # BCE at every point even for perfect predictions
    tgt = np.kron(rs.randint(0, 4, (b, 2, 2)), np.ones((8, 8), int))
    gt_masks = np.stack([[(tgt[i] == k).astype(np.float32) for k in range(4)]
                         for i in range(b)])
    gt_labels = np.tile(np.arange(4), (b, 1))
    gt_valid = gt_masks.sum((-1, -2)) > 0

    def build(aligned):
        cls = np.full((1, b, q, c + 1), -4.0, np.float32)
        masks = np.full((1, b, q, h, h), -8.0, np.float32)
        cls[0, :, :, c] = 4.0  # default: every query predicts no-object
        for i in range(b):
            for k in range(4):
                if not gt_valid[i, k]:
                    continue  # absent class: its query stays no-object
                cls[0, i, k, c] = -4.0
                if aligned:
                    cls[0, i, k, gt_labels[i, k]] = 4.0
                    masks[0, i, k] = np.where(gt_masks[i, k] > 0, 8.0, -8.0)
                else:
                    cls[0, i, k, (gt_labels[i, k] + 1) % c] = 4.0
                    masks[0, i, k] = np.where(gt_masks[i, k] > 0, -8.0, 8.0)
        return jnp.asarray(cls), jnp.asarray(masks)

    args = (jnp.asarray(gt_masks), jnp.asarray(gt_labels),
            jnp.asarray(gt_valid), jax.random.PRNGKey(0))
    fn = jax.jit(lambda c_, m_, *a: mask2former_loss(c_, m_, *a,
                                                     num_points=64))
    good, gm = fn(*build(True), *args)
    bad, _ = fn(*build(False), *args)
    assert float(good) < 0.2 * float(bad), (float(good), float(bad))
    # matching must recover the aligned queries: cls CE is then ~0
    assert float(gm["m2f_cls"]) < 0.05, float(gm["m2f_cls"])


def test_sine_positional_encoding_properties():
    from one_peace_tpu.vision.mask2former import sine_positional_encoding

    pos = sine_positional_encoding(6, 4, 32)
    assert pos.shape == (24, 32)
    assert np.abs(pos).max() <= 1.0 + 1e-6
    # rows vary along y in the first half, along x in the second half
    grid = pos.reshape(6, 4, 32)
    assert not np.allclose(grid[0, 0, :16], grid[1, 0, :16])
    assert np.allclose(grid[0, 0, :16], grid[0, 1, :16])
    assert not np.allclose(grid[0, 0, 16:], grid[0, 1, 16:])
    assert np.allclose(grid[0, 0, 16:], grid[1, 0, 16:])


@pytest.mark.slow
def test_slide_inference(tiny_m2f):
    """slide_logits (ref test_cfg mode='slide') must equal the direct
    forward (bilinearly upsampled to input resolution, mmseg
    slide_inference resize semantics) when one window covers the image,
    and tile/average cleanly when it doesn't — with the scanned
    single-dispatch path exactly matching the per-window host loop."""
    import os

    seg, params = tiny_m2f
    imgs = np.random.RandomState(5).rand(1, 3, 64, 64).astype(np.float32)
    direct = np.asarray(jax.jit(seg.logits)(params, jnp.asarray(imgs)))
    direct_up = np.asarray(jax.image.resize(
        jnp.asarray(direct), (1, 64, 64, direct.shape[-1]),
        method="bilinear"))
    whole = seg.slide_logits(params, imgs, crop=64, stride=64)
    np.testing.assert_allclose(whole, direct_up, atol=1e-5)
    # image larger than the model's crop: the exact case slide exists for
    big = np.random.RandomState(6).rand(1, 3, 96, 96).astype(np.float32)
    tiled = seg.slide_logits(params, big, crop=64, stride=32)
    assert tiled.shape == (1, 96, 96, 5)
    assert np.isfinite(tiled).all()
    # scan-vs-host equivalence on a real multi-window grid (incl. the
    # shifted-back tail windows) and on the smaller-than-crop case
    host = seg._slide_logits_host(params, big, crop=64, stride=32)
    np.testing.assert_allclose(tiled, host, atol=1e-5)
    small = np.random.RandomState(7).rand(1, 3, 48, 40).astype(np.float32)
    np.testing.assert_allclose(
        seg.slide_logits(params, small, crop=64, stride=32),
        seg._slide_logits_host(params, small, crop=64, stride=32),
        atol=1e-5)
    # the env escape hatch routes through the host loop
    os.environ["ONE_PEACE_SLIDE_IMPL"] = "host"
    try:
        np.testing.assert_allclose(
            seg.slide_logits(params, big, crop=64, stride=32), host,
            atol=1e-6)
    finally:
        del os.environ["ONE_PEACE_SLIDE_IMPL"]
    # the canvas-budget auto-fallback routes slide_scores itself through
    # the host loop (the seg eval protocol calls slide_scores directly)
    old_budget = type(seg).SLIDE_CANVAS_BUDGET_BYTES
    type(seg).SLIDE_CANVAS_BUDGET_BYTES = 1
    try:
        np.testing.assert_allclose(
            np.asarray(seg.slide_scores(params, big, crop=64, stride=32)),
            host, atol=1e-6)
    finally:
        type(seg).SLIDE_CANVAS_BUDGET_BYTES = old_budget


@pytest.mark.slow
def test_ade20k_mask2former_trains(tmp_path):
    """End-to-end: the ade20k_seg task with seg_head=mask2former builds,
    trains (loss decreases) and evaluates through the standard stack."""
    import json
    import os

    from PIL import Image

    from test_vision_tasks import _common_overrides, _loss_decreases
    from one_peace_tpu.core.config import load_config

    root = tmp_path
    img_dir = root / "images"
    ann_dir = root / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()
    rs = np.random.RandomState(4)
    for i in range(8):
        lab = rs.randint(1, 5, (48, 64)).astype(np.uint8)
        lab[:4] = 0
        arr = rs.randint(0, 255, (48, 64, 3), dtype=np.uint8)
        arr[..., 0] = lab * 50
        Image.fromarray(arr).save(img_dir / f"s{i}.jpg")
        Image.fromarray(lab).save(ann_dir / f"s{i}.png")

    cfg = load_config(None, _common_overrides(root) + [
        "task._name=ade20k_seg",
        f"task.data={img_dir}:{ann_dir}",
        f"task.valid_data={img_dir}:{ann_dir}",
        "task.image_size=64", "task.num_classes=4",
        "task.seg_head=mask2former", "task.num_queries=8",
        "task.seg_feat_channels=32", "task.seg_num_points=32",
        "task.seg_max_instances=4",
        # tiny depths: the default 9+6 unrolled attention layers compile
        # for tens of minutes on the 1-core CI host
        "task.seg_dec_layers=3", "task.seg_pixel_layers=1",
        "optimization.clip_norm=1.0", "lr_scheduler.warmup_updates=6",
        "optimization.max_update=20",
    ])
    task, model, trainer = _loss_decreases(cfg, n_steps=12)
    assert model.is_mask2former
    task.load_dataset("valid")
    task.begin_valid_epoch(model, trainer.params)
    vitr = task.get_batch_iterator("valid", 8, ensure_equal_batch=False)
    for batch in vitr.next_epoch_itr():
        task.valid_step(model, trainer.params, batch)
    stats = task.merge_results()
    assert "miou" in stats and 0.0 <= stats["miou"] <= 100.0


@pytest.mark.slow
def test_ms_flip_logits(tiny_m2f):
    """ms_flip_logits (ref seg/test.py:143-148 --aug-test) must reduce to
    softmax(slide_logits) for ratios=(1.0,) no-flip, and average softmaxed
    per-view scores (each resized back to input resolution) in general."""
    seg, params = tiny_m2f
    imgs = np.random.RandomState(7).rand(1, 3, 64, 64).astype(np.float32)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    base = softmax(seg.slide_logits(params, imgs, crop=64, stride=64))
    single = seg.ms_flip_logits(params, imgs, crop=64, stride=64,
                                ratios=(1.0,), flip=False)
    np.testing.assert_allclose(single, base, atol=1e-6)

    # independently composed expectation for ratios=(0.5, 1.0) + flip
    views = [base]
    fl = seg.slide_logits(params, np.ascontiguousarray(imgs[:, :, :, ::-1]),
                          crop=64, stride=64)
    views.append(softmax(fl[:, :, ::-1, :]))
    small = np.asarray(jax.image.resize(jnp.asarray(imgs), (1, 3, 32, 32),
                                        method="bilinear"))
    for v, unflip in ((small, False), (small[:, :, :, ::-1], True)):
        sc = seg.slide_logits(params, np.ascontiguousarray(v),
                              crop=64, stride=64)
        if unflip:
            sc = sc[:, :, ::-1, :]
        sc = np.asarray(jax.image.resize(jnp.asarray(sc), (1, 64, 64, 5),
                                         method="bilinear"))
        views.append(softmax(sc))
    expected = np.mean(views, axis=0)
    got = seg.ms_flip_logits(params, imgs, crop=64, stride=64,
                             ratios=(0.5, 1.0), flip=True)
    np.testing.assert_allclose(got, expected, atol=1e-5)
    # averaged probabilities stay a distribution
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
