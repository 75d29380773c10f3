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
