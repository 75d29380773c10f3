"""Batch-embedding CLI end to end: texts + images + flac audio."""

import numpy as np
import pytest
from PIL import Image

ASSETS = "/root/reference/assets"

TINY_OVERRIDES = [
    "model._name=one_peace_retrieval",
    "model.head_type=val",
    "model.encoder.embed_dim=32",
    "model.encoder.ffn_embed_dim=64",
    "model.encoder.layers=2",
    "model.encoder.attention_heads=4",
    "model.encoder.image_adapter.bucket_size=2",
    "model.encoder.image_adapter.rel_bucket_size=2",
    "model.encoder.text_adapter.bucket_size=8",
    "model.encoder.audio_adapter.bucket_size=8",
    "model.encoder.audio_adapter.conv_pos_depth=2",
    "model.encoder.audio_adapter.conv_pos_width=6",
    "model.encoder.audio_adapter.conv_pos_groups=4",
    "model.encoder.audio_adapter.feature_encoder_spec=((16,10,5),(16,8,8),(16,8,8))",
]


def test_embed_cli(tmp_path):
    import torch_fixture as tf
    from helpers import tiny_model_config
    from one_peace_tpu.cli.embed import main
    from one_peace_tpu.utils.checkpoint_convert import convert_retrieval_model
    from one_peace_tpu.utils.native_checkpoint import save_params

    cfg = tiny_model_config(head_type="val")
    cfg.encoder.text_adapter.vocab_size = 50264
    cfg.encoder.audio_adapter.feature_encoder_spec = (
        (16, 10, 5), (16, 8, 8), (16, 8, 8))
    sd = tf.make_random_state_dict(cfg, seed=0)
    ckpt = tmp_path / "model.npz"
    save_params(str(ckpt), convert_retrieval_model(sd, cfg))

    texts = tmp_path / "texts.txt"
    texts.write_text("a dog barking\na cow in a field\n")
    img = tmp_path / "img.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (48, 48, 3), dtype=np.uint8)
    ).save(img)

    out = tmp_path / "emb.npz"
    rc = main([
        "--path", str(ckpt), "--output", str(out),
        "--texts", str(texts), "--images", str(img),
        "--audios", f"{ASSETS}/dog.flac",
        "--batch-size", "2", "--dtype", "float32",
        "--patch-image-size", "32",
    ] + TINY_OVERRIDES)
    assert rc == 0
    with np.load(out) as data:
        assert data["text"].shape == (2, 32)
        assert data["image"].shape == (1, 32)
        assert data["audio"].shape == (1, 32)
        for k in ("text", "image", "audio"):
            np.testing.assert_allclose(
                np.linalg.norm(data[k], axis=-1), 1.0, rtol=1e-4)
