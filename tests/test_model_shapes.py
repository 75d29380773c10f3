"""Shape/smoke tests for adapters, encoder and retrieval model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_peace_tpu.models.one_peace import ModelWrapper, OnePeaceRetrievalModel
from one_peace_tpu.models.adapters.audio import conv_output_length

from helpers import tiny_encoder_config, tiny_model_config


@pytest.fixture(scope="module")
def wrapper_and_params():
    cfg = tiny_encoder_config()
    wrapper = ModelWrapper(cfg)
    params = wrapper.init(jax.random.PRNGKey(0))
    return cfg, wrapper, params


def _audio_inputs(cfg, bsz, t):
    spec = cfg.audio_adapter.feature_encoder_spec
    t_out = conv_output_length(t, spec)
    src_audios = jnp.asarray(np.random.RandomState(0).randn(bsz, t), jnp.float32)
    pad = jnp.zeros((bsz, t_out + 1), bool)
    return src_audios, pad


def test_text_forward(wrapper_and_params):
    cfg, wrapper, params = wrapper_and_params
    tokens = jnp.array([[5, 6, 7, 1, 1], [8, 9, 10, 11, 1]])
    text_f, image_f, audio_f = wrapper(params, src_tokens=tokens, encoder_type="text")
    assert text_f.shape == (2, 6, cfg.embed_dim)
    assert image_f is None and audio_f is None
    assert np.isfinite(np.asarray(text_f)).all()


def test_image_forward(wrapper_and_params):
    cfg, wrapper, params = wrapper_and_params
    images = jnp.asarray(np.random.RandomState(1).randn(2, 3, 32, 32), jnp.float32)
    _, image_f, _ = wrapper(params, src_images=images, encoder_type="image")
    assert image_f.shape == (2, 5, cfg.embed_dim)  # (32/16)^2 + 1
    assert np.isfinite(np.asarray(image_f)).all()


def test_audio_forward(wrapper_and_params):
    cfg, wrapper, params = wrapper_and_params
    src_audios, pad = _audio_inputs(cfg, 2, 64)
    _, _, audio_f = wrapper(
        params, src_audios=src_audios, audio_padding_masks=pad, encoder_type="audio")
    assert audio_f.shape[0] == 2 and audio_f.shape[2] == cfg.embed_dim
    assert np.isfinite(np.asarray(audio_f)).all()


def test_vl_forward_matches_split(wrapper_and_params):
    cfg, wrapper, params = wrapper_and_params
    tokens = jnp.array([[5, 6, 7, 1, 1], [8, 9, 10, 11, 1]])
    images = jnp.asarray(np.random.RandomState(1).randn(2, 3, 32, 32), jnp.float32)
    text_f, image_f, _ = wrapper(
        params, src_tokens=tokens, src_images=images, encoder_type="vl")
    assert text_f.shape == (2, 6, cfg.embed_dim)
    assert image_f.shape == (2, 5, cfg.embed_dim)


def test_al_forward(wrapper_and_params):
    cfg, wrapper, params = wrapper_and_params
    tokens = jnp.array([[5, 6, 7, 1, 1], [8, 9, 10, 11, 1]])
    src_audios, pad = _audio_inputs(cfg, 2, 64)
    text_f, _, audio_f = wrapper(
        params, src_tokens=tokens, src_audios=src_audios,
        audio_padding_masks=pad, encoder_type="al")
    assert text_f.shape == (2, 6, cfg.embed_dim)
    assert audio_f is not None


def test_padding_invariance(wrapper_and_params):
    """Extending a sequence with padding must not change unpadded outputs."""
    cfg, wrapper, params = wrapper_and_params
    tokens_short = jnp.array([[5, 6, 7]])
    tokens_long = jnp.array([[5, 6, 7, 1, 1, 1]])
    f_short, _, _ = wrapper(params, src_tokens=tokens_short, encoder_type="text")
    f_long, _, _ = wrapper(params, src_tokens=tokens_long, encoder_type="text")
    np.testing.assert_allclose(
        np.asarray(f_short[:, :4]), np.asarray(f_long[:, :4]), rtol=2e-5, atol=2e-5)


def test_retrieval_model():
    cfg = tiny_model_config(head_type="val")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jnp.array([[5, 6, 7, 1]])
    emb = model(params, src_tokens=tokens, encoder_type="text")
    assert emb.shape == (1, cfg.encoder.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5)
    scale = model.logit_scale_exp(params)
    np.testing.assert_allclose(float(scale), 1 / 0.07, rtol=1e-5)


def test_training_mode_runs():
    cfg = tiny_encoder_config(dropout=0.1, drop_path_rate=0.2)
    wrapper = ModelWrapper(cfg)
    params = wrapper.init(jax.random.PRNGKey(0))
    tokens = jnp.array([[5, 6, 7, 1, 1]])
    out, _, _ = wrapper(
        params, src_tokens=tokens, encoder_type="text",
        deterministic=False, rng=jax.random.PRNGKey(42))
    assert np.isfinite(np.asarray(out)).all()


def test_audio_fixed_pos_type():
    """abs_pos_type='fixed' (the pretrain decoder's mode) on the encoder
    side: learned table positions instead of the conv stack."""
    from one_peace_tpu.models.adapters.audio import AudioAdapter, conv_output_length

    cfg = tiny_encoder_config()
    cfg.audio_adapter.abs_pos_type = "fixed"
    adapter = AudioAdapter(cfg.audio_adapter, cfg.embed_dim,
                           cfg.attention_heads, num_rel_tables=1)
    import jax

    params = adapter.init(jax.random.PRNGKey(0))
    assert "embed_positions" in params and "pos_convs" not in params
    # the decoder path: scatter preserved embeds + fixed positions
    import numpy as np

    rs = np.random.RandomState(0)
    seq_len = 5
    preserve = np.array([[0, 2, -1]])
    pres_embed = rs.randn(1, 3, cfg.embed_dim).astype(np.float32)
    mask_token = rs.randn(1, cfg.embed_dim).astype(np.float32)
    pad = np.zeros((1, seq_len), bool)
    x, _, _ = adapter(params, jnp.zeros((1, 16)), jnp.asarray(pad),
                      preserve_ids=jnp.asarray(preserve),
                      preserve_embed=jnp.asarray(pres_embed),
                      mask_token=jnp.asarray(mask_token))
    assert x.shape == (1, seq_len, cfg.embed_dim)
    assert np.isfinite(np.asarray(x)).all()


def test_adapter_config_variants():
    """Config branches off the released path: layernorm_embedding,
    add_type_embedding, shrink_alpha, conv_pos_pre_ln."""
    cfg = tiny_encoder_config()
    cfg.text_adapter.layernorm_embedding = True
    cfg.text_adapter.add_type_embedding = True
    cfg.text_adapter.shrink_alpha = 0.5
    cfg.image_adapter.layernorm_embedding = True
    cfg.image_adapter.add_type_embedding = True
    cfg.audio_adapter.conv_pos_pre_ln = True
    cfg.audio_adapter.layernorm_embedding = True
    wrapper = ModelWrapper(cfg)
    params = wrapper.init(jax.random.PRNGKey(0))
    assert "layernorm_embedding" in params["text_adapter"]
    assert "type_embedding" in params["text_adapter"]
    assert "pos_pre_ln" in params["audio_adapter"]

    tokens = jnp.array([[5, 6, 7, 1]])
    images = jnp.asarray(np.random.RandomState(0).randn(1, 3, 32, 32), jnp.float32)
    text_f, image_f, _ = wrapper(params, src_tokens=tokens, src_images=images,
                                 encoder_type="vl")
    assert np.isfinite(np.asarray(text_f)).all()
    src_audios, pad = _audio_inputs(cfg, 1, 64)
    _, _, audio_f = wrapper(params, src_audios=src_audios,
                            audio_padding_masks=pad, encoder_type="audio")
    assert np.isfinite(np.asarray(audio_f)).all()

    # second-image type embedding (NLVR2 path)
    _, image_f2, _ = wrapper(params, src_images=images, encoder_type="image",
                             is_second_image=True)
    # type_embedding_2 initialized to zeros -> same output as first image
    _, image_f1, _ = wrapper(params, src_images=images, encoder_type="image")
    np.testing.assert_allclose(np.asarray(image_f1), np.asarray(image_f2),
                               rtol=1e-5, atol=1e-6)


def test_val_trimodal_forward(wrapper_and_params):
    """encoder_type='val' concatenates all three modalities, routes each
    segment through its own FFN/final-LN, and slices features back out
    (ref one_peace_base.py:89-124; the reference accepts 'val' too)."""
    cfg, wrapper, params = wrapper_and_params
    tokens = jnp.array([[5, 6, 7, 1, 1], [8, 9, 10, 11, 1]])
    images = jnp.asarray(np.random.RandomState(1).randn(2, 3, 32, 32),
                         jnp.float32)
    src_audios, pad = _audio_inputs(cfg, 2, 64)
    text_f, image_f, audio_f = wrapper(
        params, src_tokens=tokens, src_images=images, src_audios=src_audios,
        audio_padding_masks=pad, encoder_type="val")
    assert text_f.shape == (2, 6, cfg.embed_dim)
    assert image_f.shape == (2, 5, cfg.embed_dim)
    assert audio_f is not None and audio_f.shape[2] == cfg.embed_dim
    for f in (text_f, image_f, audio_f):
        assert np.isfinite(np.asarray(f)).all()


@pytest.mark.slow
def test_remat_policies_identical_grads():
    """checkpoint_activations with remat_policy 'full' vs 'qkv'
    (save-named-qkv across the layer-scan checkpoint) must produce
    bit-identical losses and gradients — remat changes scheduling, never
    math; this guards the checkpoint_name plumbing in the encoder."""
    import copy

    cfg = tiny_encoder_config()
    base = ModelWrapper(cfg)
    params = base.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.random.RandomState(0).randint(5, 90, (2, 7)))

    def grads_for(policy):
        c = copy.deepcopy(cfg)
        c.checkpoint_activations = True
        c.remat_policy = policy
        wrapper = ModelWrapper(c)

        def loss(p):
            out, _, _ = wrapper(p, src_tokens=tokens, encoder_type="text")
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.value_and_grad(loss)(params)

    l_full, g_full = grads_for("full")
    l_qkv, g_qkv = grads_for("qkv")
    assert float(l_full) == float(l_qkv)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_qkv)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # host-offloaded saves (the reference's offload_activations analogue):
    # same math, saves parked in pinned host memory
    l_off, g_off = grads_for("offload_qkv")
    assert float(l_full) == float(l_off)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_off)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
