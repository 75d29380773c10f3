"""Detector training objective: FCOS + cascade + mask, end to end."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from one_peace_tpu.vision.det_train import detector_training_loss, fcos_loss
from one_peace_tpu.vision.zoo import OnePeaceDetector


def _tiny_detector():
    return OnePeaceDetector(
        num_classes=4, image_size=64, fpn_channels=16,
        embed_dim=32, ffn_embed_dim=64, heads=4, layers=2,
        pretrain_bucket_size=4, window_size=2, global_period=2,
        checkpoint_activations=False, attn_impl="xla")


def _batch(rs, b=2, m=3, size=64):
    imgs = rs.randn(b, 3, size, size).astype(np.float32)
    x0 = rs.uniform(0, size / 2, (b, m))
    y0 = rs.uniform(0, size / 2, (b, m))
    w = rs.uniform(8, size / 2, (b, m))
    h = rs.uniform(8, size / 2, (b, m))
    boxes = np.stack([x0, y0, np.minimum(x0 + w, size - 1),
                      np.minimum(y0 + h, size - 1)], -1).astype(np.float32)
    labels = rs.randint(0, 4, (b, m))
    valid = np.ones((b, m), bool)
    valid[1, -1] = False  # padded GT slot
    masks = np.zeros((b, m, size, size), np.float32)
    for bi in range(b):
        for mi in range(m):
            x0_, y0_, x1_, y1_ = boxes[bi, mi].astype(int)
            masks[bi, mi, y0_:y1_, x0_:x1_] = 1.0
    return (jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(valid), jnp.asarray(masks))


@pytest.mark.slow
def test_fcos_loss_prefers_correct_predictions():
    """Loss must drop when the head is trained; sanity: positive count > 0
    and all terms finite."""
    det = _tiny_detector()
    params = det.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    imgs, boxes, labels, valid, _ = _batch(rs)
    f16 = det.backbone(params["backbone"], imgs)
    pyr = det.fpn(params["fpn"], f16)
    feats = [pyr[k] for k in det.PYRAMID_KEYS]
    loss, metrics = fcos_loss(det.proposer, params["proposer"], feats,
                              boxes, labels, valid)
    assert np.isfinite(float(loss))
    assert float(metrics["fcos_pos"]) > 0


@pytest.mark.slow
def test_detector_training_step_decreases_loss():
    det = _tiny_detector()
    params = det.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    batch = _batch(rs)

    # 1e-3 oscillates on this 2-layer toy even with a fixed objective
    # (FCOS normalization swings as the positive set changes); 1e-4
    # decreases monotonically
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            return detector_training_loss(det, p, *batch, rng=rng)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, metrics, grads

    # one fixed jitter rng: per-step jitter makes the objective stochastic
    # and a 6-step decrease assertion flaky on a 2-layer model at 1e-3
    rng = jax.random.PRNGKey(2)
    losses = []
    for i in range(6):
        params, opt, loss, metrics, grads = step(params, opt, rng)
        losses.append(float(loss))
        assert np.isfinite(losses[-1]), metrics
    # grads reach every component
    for comp in ("backbone", "fpn", "proposer", "box_head", "mask_head"):
        gnorm = optax.global_norm(grads[comp])
        assert float(gnorm) > 0, comp
    assert losses[-1] < losses[0], losses
    assert "mask_loss" in metrics and "cls_loss" in metrics
