"""Vision-branch backbone for dense-prediction transfer.

The reference's det/seg/video apps (SURVEY.md §2.4) all wrap the
vision-branch ViT (one_peace_vision/classification/models_vit.py — the
image adapter + image-FFN-only encoder re-exported as a timm-style
backbone).  Here the same capability: run the framework's image branch and
return (a) the final patch-feature map and (b) a *parameterless* pyramid
(bilinear up / maxpool down from the stride-16 map) as a lightweight
default.  The reference-grade detection trunk — windowed attention with
interleaved global layers and the *learned* ViTDet SimpleFeaturePyramid
(ConvTranspose up / LN lateral convs) — lives in det_backbone.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.config import EncoderConfig
from ..models.one_peace import ModelWrapper


class VisionBackbone:
    """Image branch as a feature extractor (use head_type='image')."""

    def __init__(self, cfg: EncoderConfig):
        cfg.use_text_moe = False
        cfg.use_audio_moe = False
        cfg.use_image_moe = True
        self.cfg = cfg
        self.wrapper = ModelWrapper(cfg, use_text_norm=False,
                                    use_image_norm=True, use_audio_norm=False,
                                    num_rel_tables=cfg.layers)

    def init(self, key, dtype=jnp.float32):
        return self.wrapper.init(key, dtype=dtype)

    def __call__(self, params, images: jnp.ndarray,
                 deterministic: bool = True, rng=None) -> jnp.ndarray:
        """images (B, 3, H, W) -> stride-16 feature map (B, H/16, W/16, D)."""
        _, image_f, _ = self.wrapper(
            params, src_images=images, encoder_type="image",
            deterministic=deterministic, rng=rng)
        b = image_f.shape[0]
        grid = images.shape[2] // 16
        return image_f[:, 1:].reshape(b, grid, grid, self.cfg.embed_dim)

    def pyramid(self, params, images: jnp.ndarray,
                deterministic: bool = True, rng=None) -> Dict[str, jnp.ndarray]:
        """Parameterless pyramid: {p4, p8, p16, p32} NHWC maps via bilinear
        up / maxpool down.  For the reference recipe's learned pyramid use
        det_backbone.SimpleFeaturePyramid."""
        f16 = self(params, images, deterministic, rng)
        b, h, w, d = f16.shape
        f8 = jax.image.resize(f16, (b, h * 2, w * 2, d), "bilinear")
        f4 = jax.image.resize(f16, (b, h * 4, w * 4, d), "bilinear")
        f32 = jax.lax.reduce_window(
            f16, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return {"p4": f4, "p8": f8, "p16": f16, "p32": f32}


class VideoClassifier:
    """K400-style video recognition: per-frame vision features, temporal
    mean pooling over CLS, linear classifier (the capability of the
    reference's mmaction2 recognizer, one_peace_vision/video/)."""

    def __init__(self, cfg: EncoderConfig, num_classes: int):
        cfg.use_text_moe = False
        cfg.use_audio_moe = False
        self.cfg = cfg
        self.num_classes = num_classes
        self.wrapper = ModelWrapper(cfg, use_text_norm=False,
                                    use_image_norm=True, use_audio_norm=False,
                                    num_rel_tables=cfg.layers)

    def init(self, key, dtype=jnp.float32):
        from ..models.components import init_linear

        k1, k2 = jax.random.split(key)
        return {
            "encoder_wrapper": self.wrapper.init(k1, dtype=dtype),
            "head": init_linear(k2, self.cfg.embed_dim, self.num_classes,
                                dtype=dtype),
        }

    def __call__(self, params, frames: jnp.ndarray,
                 deterministic: bool = True, rng=None) -> jnp.ndarray:
        """frames (B, T, 3, H, W) -> (B, num_classes) logits."""
        from ..models.components import linear

        b, t = frames.shape[:2]
        flat = frames.reshape((b * t,) + frames.shape[2:])
        _, image_f, _ = self.wrapper(
            params["encoder_wrapper"], src_images=flat, encoder_type="image",
            deterministic=deterministic, rng=rng)
        cls = image_f[:, 0].reshape(b, t, -1).mean(axis=1)
        return linear(params["head"], cls)
