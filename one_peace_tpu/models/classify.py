"""ONE-PEACE classification model: encoder wrapper + classify head.

Behavioral spec: ref one_peace/models/one_peace/one_peace_classify.py:
49-207 — head-type-gated modality branches, attention/CLS pooling head,
optional second image (NLVR2), ``freeze_finetune_updates`` (the encoder
runs under stop_gradient until that many updates; the head always trains),
``use_image_features`` routing for VL tasks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from .one_peace import ClassifyHead, ModelWrapper


@MODELS.register("one_peace_classify")
class OnePeaceClassifyModel:
    def __init__(
        self,
        cfg: ModelConfig,
        num_classes: int,
        head_scale_ratio: float = 1.0,
        use_pooler: bool = False,
        pooler_dropout: float = 0.0,
        attn_pooling: bool = False,
        use_two_images: bool = False,
        use_image_features: bool = False,
        freeze_finetune_updates: int = 0,
    ):
        self.cfg = cfg
        enc = cfg.encoder
        head = cfg.head_type
        enc.use_text_moe = head in ("text", "vl", "al")
        enc.use_image_moe = head in ("image", "vl")
        enc.use_audio_moe = head in ("audio", "al")
        self.head_type = head
        self.use_image_features = use_image_features
        self.freeze_finetune_updates = freeze_finetune_updates
        self.num_updates = freeze_finetune_updates  # unfrozen by default
        self.wrapper = ModelWrapper(
            enc,
            use_text_norm=enc.use_text_moe,
            use_image_norm=enc.use_image_moe,
            use_audio_norm=enc.use_audio_moe,
            num_rel_tables=enc.layers,
        )
        self.head = ClassifyHead(
            attn_pooling=attn_pooling,
            use_pooler=use_pooler,
            pooler_dropout=pooler_dropout,
            input_dim=enc.embed_dim,
            num_heads=enc.attention_heads,
            head_scale_ratio=head_scale_ratio,
            num_classes=num_classes,
            use_two_images=use_two_images,
        )

    def enable_pipeline(self, mesh, num_micro_batches: int) -> None:
        self.wrapper.enable_pipeline(mesh, num_micro_batches)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 2)
        return {
            "encoder_wrapper": self.wrapper.init(keys[0], dtype=dtype),
            "classify_head": self.head.init(keys[1], dtype=dtype),
        }

    def set_num_updates(self, num_updates: int):
        self.num_updates = num_updates

    def __call__(
        self,
        params,
        src_tokens=None,
        src_images=None,
        src_images_2=None,
        src_audios=None,
        audio_padding_masks=None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        num_updates=None,
    ):
        rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
        if num_updates is not None and self.freeze_finetune_updates:
            # traced freeze: the update count is a jitted-step argument, so
            # the window flips inside one compiled train step — a Python
            # bool here would be baked in at trace time and never change
            unfrozen = (jnp.asarray(num_updates)
                        >= self.freeze_finetune_updates)

            def maybe_freeze(x):
                if x is None:
                    return None
                sg = jax.lax.stop_gradient(x)
                return sg + unfrozen.astype(x.dtype) * (x - sg)
        elif self.num_updates < self.freeze_finetune_updates:
            def maybe_freeze(x):
                return jax.lax.stop_gradient(x) if x is not None else None
        else:
            def maybe_freeze(x):
                return x

        def run(p, imgs, second, r):
            return self.wrapper(
                p, src_tokens=src_tokens, src_images=imgs,
                is_second_image=second, src_audios=src_audios,
                audio_padding_masks=audio_padding_masks,
                encoder_type=self.head_type, deterministic=deterministic,
                rng=r, return_padding_mask=True)

        text_f, image_f, audio_f, text_pad, image_pad, audio_pad = run(
            params["encoder_wrapper"], src_images, False, rngs[0])
        text_f, image_f, audio_f = (maybe_freeze(text_f),
                                    maybe_freeze(image_f),
                                    maybe_freeze(audio_f))

        feats_2 = None
        if src_images_2 is not None:
            t2, i2, a2, *_ = run(params["encoder_wrapper"], src_images_2, True, rngs[1])
            feats_2 = (maybe_freeze(t2), maybe_freeze(i2), maybe_freeze(a2))

        if text_f is not None and not self.use_image_features:
            feats, pad = text_f, text_pad
            f2 = feats_2[0] if feats_2 else None
        elif image_f is not None:
            feats, pad = image_f, image_pad
            f2 = feats_2[1] if feats_2 else None
        elif audio_f is not None:
            feats, pad = audio_f, audio_pad
            f2 = feats_2[2] if feats_2 else None
        else:
            raise NotImplementedError
        return self.head(params["classify_head"], feats, f2, pad,
                         deterministic=deterministic, rng=rngs[2])
