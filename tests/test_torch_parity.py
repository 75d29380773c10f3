"""Golden numerics parity: fairseq-style state dict -> converter -> JAX
forward must match the independent torch fixture to fp32 tolerance.

This is the layer-by-layer drift harness from SURVEY.md §7 "hard parts" #1:
it exercises the checkpoint converter (naming, transposes, stacking) and
every nonlinearity/normalization placement across all modalities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_fixture as tf
from helpers import tiny_model_config

from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
from one_peace_tpu.models.adapters.audio import conv_output_length
from one_peace_tpu.utils.checkpoint_convert import convert_retrieval_model, to_jax


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(head_type="val")
    sd = tf.make_random_state_dict(cfg, seed=0)
    model = OnePeaceRetrievalModel(cfg)
    params = to_jax(convert_retrieval_model(sd, cfg))
    return cfg, sd, model, params


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_converted_params_load(setup):
    """Converted tree must be structurally identical to a fresh init."""
    cfg, sd, model, params = setup
    ref = model.init(jax.random.PRNGKey(0))
    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
    assert ref_shapes == got_shapes


def test_text_parity(setup):
    cfg, sd, model, params = setup
    tokens = np.array([[5, 6, 7, 1, 1], [8, 9, 10, 11, 12]])
    want = tf.retrieval_forward(sd, cfg, "text", src_tokens=tokens).numpy()
    got = np.asarray(model(params, src_tokens=jnp.asarray(tokens), encoder_type="text"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert _cos(got, want) > 1 - 1e-6


def test_image_parity(setup):
    cfg, sd, model, params = setup
    imgs = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
    want = tf.retrieval_forward(sd, cfg, "image", src_images=imgs).numpy()
    got = np.asarray(model(params, src_images=jnp.asarray(imgs), encoder_type="image"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert _cos(got, want) > 1 - 1e-6


def test_audio_parity(setup):
    cfg, sd, model, params = setup
    t_in = 100
    wav = np.random.RandomState(2).randn(2, t_in).astype(np.float32)
    t_out = conv_output_length(t_in, cfg.encoder.audio_adapter.feature_encoder_spec)
    pad = np.zeros((2, t_out + 1), bool)
    pad[1, -4:] = True
    want = tf.retrieval_forward(sd, cfg, "audio", src_audios=wav,
                                audio_padding_masks=pad).numpy()
    got = np.asarray(model(params, src_audios=jnp.asarray(wav),
                           audio_padding_masks=jnp.asarray(pad), encoder_type="audio"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert _cos(got, want) > 1 - 1e-6


def test_vl_parity(setup):
    """Multi-modal concat path: block-diagonal bias + per-modality FFN."""
    cfg, sd, model, params = setup
    tokens = np.array([[5, 6, 7, 1, 1]])
    imgs = np.random.RandomState(3).randn(1, 3, 32, 32).astype(np.float32)
    # fixture returns the raw encoder output for 'vl'
    want = tf.retrieval_forward(sd, cfg, "vl", src_tokens=tokens, src_images=imgs).numpy()
    text_f, image_f, _ = model.wrapper(
        params["encoder_wrapper"], src_tokens=jnp.asarray(tokens),
        src_images=jnp.asarray(imgs), encoder_type="vl")
    got = np.concatenate([np.asarray(text_f), np.asarray(image_f)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_per_layer_rel_tables():
    """copy_rel_pos_table=True: one rel table per layer flows through."""
    cfg = tiny_model_config(head_type="val", copy_rel_pos_table=True)
    sd = tf.make_random_state_dict(cfg, seed=4)
    model = OnePeaceRetrievalModel(cfg)
    params = to_jax(convert_retrieval_model(sd, cfg))
    assert params["encoder_wrapper"]["text_adapter"]["rel_pos_table"].shape[0] == cfg.encoder.layers
    tokens = np.array([[5, 6, 7, 1]])
    want = tf.retrieval_forward(sd, cfg, "text", src_tokens=tokens).numpy()
    got = np.asarray(model(params, src_tokens=jnp.asarray(tokens), encoder_type="text"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_legacy_single_table_broadcast():
    """Legacy checkpoints carry one shared table; upgrade must broadcast it
    per layer when copy_rel_pos_table=True (ref text.py:173-178)."""
    cfg_single = tiny_model_config(head_type="val")
    sd = tf.make_random_state_dict(cfg_single, seed=5)
    cfg = tiny_model_config(head_type="val", copy_rel_pos_table=True)
    params = to_jax(convert_retrieval_model(sd, cfg))
    rel = params["encoder_wrapper"]["text_adapter"]["rel_pos_table"]
    assert rel.shape[0] == cfg.encoder.layers
    np.testing.assert_array_equal(np.asarray(rel[0]), np.asarray(rel[1]))


def test_alternate_attention_flags_parity():
    """The non-released flag combo (scale_heads + post-attn LN, no magneto,
    no layer scale) must also match torch — covers the c_attn and attn_ln
    branches (ref multihead_attention.py:118-123, transformer_layer.py:
    130,192)."""
    cfg = tiny_model_config(head_type="val")
    cfg.encoder.magneto_scale_attn = False
    cfg.encoder.scale_attn = True
    cfg.encoder.scale_heads = True
    cfg.encoder.use_layer_scale = False
    sd = tf.make_random_state_dict(cfg, seed=7)
    model = OnePeaceRetrievalModel(cfg)
    params = to_jax(convert_retrieval_model(sd, cfg))
    tokens = np.array([[5, 6, 7, 1, 1], [8, 9, 10, 11, 12]])
    want = tf.retrieval_forward(sd, cfg, "text", src_tokens=tokens).numpy()
    got = np.asarray(model(params, src_tokens=jnp.asarray(tokens), encoder_type="text"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_layer_by_layer_diff_harness(setup):
    """Per-layer hidden states must track torch layer-by-layer (the drift
    harness from SURVEY.md §7), and the harness localizes divergence."""
    from one_peace_tpu.utils.diff_harness import diff_layer_states, first_divergence

    cfg, sd, model, params = setup
    tokens = np.array([[5, 6, 7, 1, 1]])
    # torch per-layer states
    x, pad, biases = tf.text_adapter_forward(sd, cfg, tokens)
    want = tf.encoder_layer_states(sd, cfg, x, pad, biases, "text",
                                   (x.shape[1], 0, 0))
    # jax per-layer states
    wrapper = model.wrapper
    tp = params["encoder_wrapper"]
    xj, padj, biasj = wrapper.text_adapter(
        tp["text_adapter"], jnp.asarray(tokens))
    out, hiddens = wrapper.fusion(
        tp["fusion"], xj, padj, biasj, "text", (xj.shape[1], 0, 0),
        return_all_hiddens=True)
    got = [np.asarray(hiddens[i]) for i in range(cfg.encoder.layers)]
    report = diff_layer_states(got, [w.numpy() for w in want])
    assert first_divergence(report) is None, report
    assert all(r["cosine"] > 1 - 1e-6 for r in report)


def test_attention_pooling_matches_torch():
    """MultiheadAttentionPooling (ref one_peace_base.py:146-172): single
    query, no scaling, padding masked."""
    import torch
    import torch.nn.functional as F

    from one_peace_tpu.models.one_peace import (
        attention_pooling, init_attention_pooling)

    d, heads, b, l = 16, 4, 2, 5
    params = init_attention_pooling(jax.random.PRNGKey(0), d, heads)
    x = np.random.RandomState(0).randn(b, l, d).astype(np.float32)
    pad = np.zeros((b, l), bool)
    pad[1, -2:] = True
    got = np.asarray(attention_pooling(
        params, jnp.asarray(x), jnp.asarray(pad), heads))

    # torch re-derivation
    hd = d // heads
    xt = torch.tensor(x).transpose(0, 1)  # (L, B, D) like the reference
    k_w = torch.tensor(np.asarray(params["k_proj"]["w"])).T
    v_w = torch.tensor(np.asarray(params["v_proj"]["w"])).T
    v_b = torch.tensor(np.asarray(params["v_proj"]["b"]))
    o_w = torch.tensor(np.asarray(params["out_proj"]["w"])).T
    o_b = torch.tensor(np.asarray(params["out_proj"]["b"]))
    q = torch.tensor(np.asarray(params["q"]))
    q = q.expand(1, b, -1, -1).reshape(1, b * heads, hd).transpose(0, 1)
    k = F.linear(xt, k_w).view(l, b * heads, hd).transpose(0, 1)
    v = F.linear(xt, v_w, v_b).view(l, b * heads, hd).transpose(0, 1)
    attn_w = torch.bmm(q, k.transpose(1, 2)).view(b, heads, 1, l)
    attn_w = attn_w.masked_fill(torch.tensor(pad).view(b, 1, 1, l), float("-inf"))
    probs = F.softmax(attn_w.float(), dim=-1).view(b * heads, 1, l)
    attn = torch.bmm(probs, v).reshape(b, d)
    want = F.linear(attn, o_w, o_b).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
