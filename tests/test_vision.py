"""Vision transfer components: backbone pyramid + video classifier."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_encoder_config


def test_backbone_pyramid():
    from one_peace_tpu.vision.backbone import VisionBackbone

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4  # 64px inputs -> 4x4 patch grid
    cfg.image_adapter.rel_bucket_size = 4
    bb = VisionBackbone(cfg)
    params = bb.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 3, 64, 64), jnp.float32)
    f16 = bb(params, imgs)
    assert f16.shape == (2, 4, 4, cfg.embed_dim)
    pyr = bb.pyramid(params, imgs)
    assert pyr["p4"].shape == (2, 16, 16, cfg.embed_dim)
    assert pyr["p8"].shape == (2, 8, 8, cfg.embed_dim)
    assert pyr["p32"].shape == (2, 2, 2, cfg.embed_dim)
    for v in pyr.values():
        assert np.isfinite(np.asarray(v)).all()


def test_video_classifier():
    from one_peace_tpu.vision.backbone import VideoClassifier

    cfg = tiny_encoder_config()
    model = VideoClassifier(cfg, num_classes=7)
    params = model.init(jax.random.PRNGKey(0))
    frames = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3, 32, 32), jnp.float32)
    logits = model(params, frames)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_fcos_detection_head():
    from one_peace_tpu.vision.detection import FCOSHead, batched_nms

    head = FCOSHead(in_channels=32, num_classes=5, channels=16, num_convs=2,
                    strides=(8, 16))
    params = head.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32),
             jnp.asarray(rs.randn(2, 4, 4, 32), jnp.float32)]
    outs = head(params, feats)
    assert outs[0][0].shape == (2, 8, 8, 5)   # cls
    assert outs[0][1].shape == (2, 8, 8, 4)   # box (positive distances)
    assert np.all(np.asarray(outs[0][1]) > 0)
    dets = head.decode(outs, score_thresh=0.0, max_dets=10)
    assert len(dets) == 2
    assert dets[0]["boxes"].shape[1] == 4
    assert len(dets[0]["scores"]) <= 10

    # NMS suppresses overlapping same-class boxes, keeps other classes
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([0, 0, 1])
    keep = batched_nms(boxes, scores, labels)
    assert set(keep.tolist()) == {0, 2}
