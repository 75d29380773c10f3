"""The optional fbank audio frontend (BASELINE.json north-star item),
selected by ``audio_adapter.frontend: fbank`` — the waveform conv stack
stays the parity default (ref adapter/audio.py:35-55 has no fbank; the
wiring style mirrors how the frontend feeds the adapter there)."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_model_config
from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel


def _fbank_cfg():
    cfg = tiny_model_config(head_type="al")
    ad = cfg.encoder.audio_adapter
    ad.frontend = "fbank"
    ad.fbank_n_mels = 8
    ad.fbank_n_fft = 64
    ad.fbank_hop = 32
    return cfg


def test_fbank_adapter_shapes():
    from one_peace_tpu.models.adapters.audio import AudioAdapter
    from one_peace_tpu.ops.preprocess import LogMelFbank

    cfg = _fbank_cfg().encoder
    adapter = AudioAdapter(cfg.audio_adapter, cfg.embed_dim,
                           cfg.attention_heads)
    params = adapter.init(jax.random.PRNGKey(0))
    assert "fbank_proj" in params and "feature_extractor" not in params
    t = 400
    wav = jnp.asarray(np.random.RandomState(0).randn(2, t), jnp.float32)
    feats = adapter.extract_features(params, wav)
    expect = LogMelFbank(n_fft=64, hop=32, n_mels=8).num_frames(t)
    assert adapter.output_length(t) == expect
    assert feats.shape == (2, expect, cfg.embed_dim)


def test_fbank_model_forward_end_to_end():
    cfg = _fbank_cfg()
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    t = 512
    wav = jnp.asarray(np.random.RandomState(1).randn(2, t), jnp.float32)
    n_frames = model.wrapper.audio_adapter.output_length(t)
    masks = np.zeros((2, n_frames + 1), bool)
    masks[1, n_frames // 2:] = True  # second clip half-padded
    emb = model(params, src_audios=wav,
                audio_padding_masks=jnp.asarray(masks),
                encoder_type="audio")
    assert emb.shape == (2, cfg.encoder.embed_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_waveform_default_unchanged():
    """The parity default must not grow fbank params."""
    cfg = tiny_model_config(head_type="al")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ap = params["encoder_wrapper"]["audio_adapter"]
    assert "fbank_proj" not in ap and "feature_extractor" in ap
