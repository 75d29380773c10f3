"""Shared tiny-model fixtures."""

from one_peace_tpu.core.config import (
    AudioAdapterConfig,
    EncoderConfig,
    ImageAdapterConfig,
    ModelConfig,
    TextAdapterConfig,
)


def tiny_encoder_config(**kw) -> EncoderConfig:
    cfg = EncoderConfig(
        embed_dim=32,
        ffn_embed_dim=64,
        layers=2,
        attention_heads=4,
        text_adapter=TextAdapterConfig(vocab_size=100, bucket_size=8),
        image_adapter=ImageAdapterConfig(bucket_size=2, rel_bucket_size=2),
        audio_adapter=AudioAdapterConfig(
            feature_encoder_spec=((16, 4, 2), (16, 2, 2)),
            feature_embed_dim=16,
            bucket_size=8,
            conv_pos_depth=2,
            conv_pos_width=6,
            conv_pos_groups=4,
        ),
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def tiny_model_config(**kw) -> ModelConfig:
    cfg = ModelConfig(encoder=tiny_encoder_config())
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg
