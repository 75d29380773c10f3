"""Segmentation stack: SpatialPriorModule, Injector/Extractor, UperNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_encoder_config


def test_spatial_prior_module():
    from one_peace_tpu.vision.adapter import SpatialPriorModule

    spm = SpatialPriorModule(inplanes=8, embed_dim=32)
    params = spm.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    c1, c2, c3, c4 = spm(params, imgs)
    assert c1.shape == (2, 16, 16, 32)  # 1/4, spatial
    assert c2.shape == (2, 8 * 8, 32)
    assert c3.shape == (2, 4 * 4, 32)
    assert c4.shape == (2, 2 * 2, 32)


@pytest.mark.slow
def test_injector_extractor_roundtrip():
    from one_peace_tpu.vision.adapter import (
        Extractor, Injector, get_reference_points)

    dim = 32
    b = 2
    vit_shape = (4, 4)  # 1/16 tokens
    prior_shapes = [(8, 8), (4, 4), (2, 2)]
    n_priors = sum(h * w for h, w in prior_shapes)

    rs = np.random.RandomState(0)
    vit_tokens = jnp.asarray(rs.randn(b, 16, dim), jnp.float32)
    priors = jnp.asarray(rs.randn(b, n_priors, dim), jnp.float32)

    inj = Injector(dim, num_heads=4, n_levels=3, init_values=0.5)
    ip = inj.init(jax.random.PRNGKey(1))
    ref_vit = jnp.asarray(np.tile(get_reference_points([vit_shape]), (b, 1, 1, 1)))
    out_tokens = inj(ip, vit_tokens, ref_vit, priors, prior_shapes)
    assert out_tokens.shape == vit_tokens.shape
    assert np.isfinite(np.asarray(out_tokens)).all()

    ext = Extractor(dim, num_heads=4, n_levels=1)
    ep = ext.init(jax.random.PRNGKey(2))
    ref_priors = jnp.asarray(np.tile(get_reference_points(prior_shapes), (b, 1, 1, 1)))
    out_priors = ext(ep, priors, ref_priors, out_tokens, [vit_shape], prior_shapes)
    assert out_priors.shape == priors.shape
    assert np.isfinite(np.asarray(out_priors)).all()


@pytest.mark.slow
def test_upernet_head():
    from one_peace_tpu.vision.upernet import UperNetHead

    head = UperNetHead(in_channels=[32, 32, 32, 32], channels=16, num_classes=7)
    params = head.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(2, s, s, 32), jnp.float32)
             for s in (16, 8, 4, 2)]
    logits = head(params, feats)
    assert logits.shape == (2, 16, 16, 7)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_adapter_backbone_end_to_end():
    from one_peace_tpu.vision.adapter import OnePeaceAdapterBackbone
    from one_peace_tpu.vision.upernet import UperNetHead

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    bb = OnePeaceAdapterBackbone(cfg, conv_inplane=8, deform_num_heads=4,
                                 init_values=0.5)
    import jax

    params = bb.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64), jnp.float32)
    feats = bb(params, imgs)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()

    head = UperNetHead([cfg.embed_dim] * 4, channels=16, num_classes=5)
    hp = head.init(jax.random.PRNGKey(1))
    logits = head(hp, feats)
    assert logits.shape == (1, 16, 16, 5)


def test_miou_metric():
    from one_peace_tpu.metrics import MIoU

    m = MIoU(num_classes=3)
    m.initialize()
    pred = np.array([[0, 0], [1, 2]])
    target = np.array([[0, 1], [1, 255]])  # one ignored pixel
    m.compute(pred, target)
    out = m.merge_results()
    # class0: i=1 u=2 (pred 2, tgt 1, overlap 1); class1: i=1 u=2; class2 absent in tgt&pred-valid: pred has c2 at ignored pixel -> excluded
    assert out["miou"] == pytest.approx(100 * (0.5 + 0.5) / 2)


def test_seg_end_to_end_miou():
    """Backbone -> UperNet -> argmax -> mIoU: the full seg eval flow."""
    import jax

    from one_peace_tpu.metrics import MIoU
    from one_peace_tpu.vision.backbone import VisionBackbone
    from one_peace_tpu.vision.upernet import UperNetHead

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    bb = VisionBackbone(cfg)
    bparams = bb.init(jax.random.PRNGKey(0))
    head = UperNetHead([cfg.embed_dim] * 4, channels=16, num_classes=5)
    hparams = head.init(jax.random.PRNGKey(1))

    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64), jnp.float32)
    pyr = bb.pyramid(bparams, imgs)
    logits = head(hparams, [pyr["p4"], pyr["p8"], pyr["p16"], pyr["p32"]])
    pred = np.asarray(logits).argmax(-1)
    metric = MIoU(num_classes=5)
    metric.initialize()
    target = np.random.RandomState(1).randint(0, 5, pred.shape)
    metric.compute(pred, target)
    out = metric.merge_results()
    assert 0.0 <= out["miou"] <= 100.0


@pytest.mark.slow
def test_seg_cross_entropy_trains():
    from one_peace_tpu.vision.upernet import UperNetHead, seg_cross_entropy
    import jax
    import optax

    head = UperNetHead([16] * 4, channels=8, num_classes=4)
    params = head.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(1, s, s, 16), jnp.float32) for s in (8, 4, 2, 1)]
    labels = rs.randint(0, 4, (1, 32, 32))
    labels[0, :4] = 255  # ignored band

    def loss_fn(p):
        logits = head(p, feats)
        return seg_cross_entropy(logits, jnp.asarray(labels))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(optax.global_norm(grads)) > 0


def test_adaptive_avg_pool_torch_parity():
    """mmseg's PPM pools with torch AdaptiveAvgPool2d; our matrix
    formulation must match it exactly, including uneven bins (7->3)."""
    import torch
    import torch.nn.functional as F

    from one_peace_tpu.vision.upernet import adaptive_avg_pool

    rs = np.random.RandomState(0)
    x = rs.randn(2, 7, 11, 3).astype(np.float32)
    for s in (1, 2, 3, 6):
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), s, s))
        ref = (F.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), s)
            .permute(0, 2, 3, 1).numpy())
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
