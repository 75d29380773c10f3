"""Hub interface end-to-end: preprocess real assets (reference-bundled
image/audio files) and extract embeddings with a converted checkpoint."""

import os

import numpy as np
import pytest

ASSETS = "/root/reference/assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets unavailable")


@pytest.fixture(scope="module")
def hub(tmp_path_factory):
    import torch_fixture as tf
    from helpers import tiny_model_config

    from one_peace_tpu.hub import OnePeaceHubInterface
    from one_peace_tpu.core.config import TaskConfig
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.utils.checkpoint_convert import convert_retrieval_model, to_jax

    cfg = tiny_model_config(head_type="val")
    cfg.encoder.text_adapter.vocab_size = 50264  # real BPE dict
    # a spec with ~real total stride (320x) so 5-15 s clips fit the
    # 1024-position rel table
    cfg.encoder.audio_adapter.feature_encoder_spec = (
        (16, 10, 5), (16, 8, 8), (16, 8, 8))
    sd = tf.make_random_state_dict(cfg, seed=0)
    model = OnePeaceRetrievalModel(cfg)
    params = to_jax(convert_retrieval_model(sd, cfg))
    task = TaskConfig(patch_image_size=32)
    return OnePeaceHubInterface(cfg, task, model, params)


def test_text_pipeline(hub):
    tokens = hub.process_text(["a cow mooing", "a dog barking"])
    assert tokens.shape[0] == 2
    emb = hub.extract_text_features(tokens)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb, np.float32), axis=-1), 1.0, rtol=1e-4)


def test_image_pipeline(hub):
    imgs = hub.process_image([f"{ASSETS}/dog.JPEG", f"{ASSETS}/elephant.JPEG"])
    assert imgs.shape == (2, 3, 32, 32)
    emb = hub.extract_image_features(imgs)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb, np.float32)).all()


def test_audio_pipeline_flac(hub):
    """Exercises the native FLAC decoder + waveform LayerNorm + conv-length
    padding arithmetic end to end."""
    wavs, masks = hub.process_audio([f"{ASSETS}/cow.flac", f"{ASSETS}/dog.flac"])
    assert wavs.shape[0] == 2
    # 5-second clips at 16 kHz
    assert wavs.shape[1] == 5 * 16000
    # normalized waveform: ~zero mean, ~unit var over non-padded region
    w0 = np.asarray(wavs[0], np.float32)
    assert abs(w0.mean()) < 0.01
    assert 0.9 < w0.std() < 1.1
    emb = hub.extract_audio_features(wavs, masks)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb, np.float32)).all()


def test_text_image_similarity_api(hub):
    """The retrieval-scoring path the reference README demos."""
    (imgs, _w, _h), tokens = hub.process_image_text_pairs(
        [(f"{ASSETS}/dog.JPEG", "a photo of a dog")], return_image_sizes=True)
    t = np.asarray(hub.extract_text_features(tokens), np.float32)
    i = np.asarray(hub.extract_image_features(imgs), np.float32)
    sim = (t @ i.T)[0, 0]
    assert -1.0 <= sim <= 1.0


def test_classify_model_from_converted_checkpoint(tmp_path):
    """VGGSound-style flow: classify checkpoint -> hub -> audio logits."""
    import torch_fixture as tf
    from helpers import tiny_model_config

    from one_peace_tpu.core.config import TaskConfig
    from one_peace_tpu.models.classify import OnePeaceClassifyModel
    from one_peace_tpu.utils.checkpoint_convert import convert_classify_model, to_jax
    import jax.numpy as jnp

    cfg = tiny_model_config(head_type="al")
    cfg._name = "one_peace_classify"
    cfg.encoder.audio_adapter.feature_encoder_spec = (
        (16, 10, 5), (16, 8, 8), (16, 8, 8))
    sd = tf.make_random_state_dict(cfg, seed=0)
    tf.add_classify_head_state(sd, cfg, num_classes=6, attn_pooling=True)
    model = OnePeaceClassifyModel(cfg, num_classes=6, attn_pooling=True)
    params = to_jax(convert_classify_model(sd, cfg))

    rs = np.random.RandomState(1)
    tokens = jnp.asarray(rs.randint(5, 99, (2, 6)))
    wav = jnp.asarray(rs.randn(2, 3200), jnp.float32)
    from one_peace_tpu.models.adapters.audio import conv_output_length

    t = conv_output_length(3200, cfg.encoder.audio_adapter.feature_encoder_spec)
    pad = jnp.zeros((2, t + 1), bool)
    logits = model(params, src_tokens=tokens, src_audios=wav,
                   audio_padding_masks=pad)
    assert logits.shape == (2, 6)
    assert np.isfinite(np.asarray(logits)).all()


def test_process_image_ndarray_inputs(hub):
    """ndarray inputs (pre-resized [0,1] float) work on both the host and
    on-device paths (regression: hasattr probes mistook ndarrays for PIL
    because ndarray.size/.resize exist)."""
    rs = np.random.RandomState(0)
    arr = rs.rand(32, 32, 3).astype(np.float32)  # patch_image_size of cfg
    out = hub.process_image([arr])
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    out_dev = hub.process_image([arr], on_device=True)
    assert out_dev.shape == (1, 3, 32, 32)
    # float [0,1] must NOT be truncated to zeros by a uint8 cast
    assert float(np.abs(np.asarray(out_dev, np.float32)).max()) > 0.1
