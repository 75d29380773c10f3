"""Masked-denoising pretraining end-to-end: encoder + decoder + DCL/ITC
criterions with realistic preserve-id batches, gradients finite and
flowing through all branches."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from helpers import tiny_model_config
from one_peace_tpu.core.config import CriterionConfig, decoder_default_config
from one_peace_tpu.criterions import build_criterion
from one_peace_tpu.data.collate import collate
from one_peace_tpu.data.masking import (
    compute_block_mask_1d,
    nested_subset_mask,
    random_patch_mask,
    superset_patch_mask,
    to_preserve_ids,
    with_cls,
)
from one_peace_tpu.models.pretrain import OnePeacePretrainModel


def _tiny_pretrain_cfg(audio=False):
    cfg = tiny_model_config(head_type="vl")
    cfg._name = "one_peace_pretrain"
    enc = cfg.encoder
    enc.use_audio_moe = audio
    enc.use_image_moe = not audio
    dec = decoder_default_config()
    dec.embed_dim = 16
    dec.ffn_embed_dim = 32
    dec.layers = 2
    dec.attention_heads = 2
    dec.use_audio_moe = audio
    dec.use_image_moe = not audio
    dec.text_adapter.vocab_size = enc.text_adapter.vocab_size
    cfg.decoder = dec
    if audio:
        enc.audio_adapter.feature_encoder_spec = ((8, 4, 2), (8, 2, 2))
    return cfg


def _vl_batch(rng, bsz=2, tok_len=6, num_patches=4):
    samples = []
    for _ in range(bsz):
        text = rng.randint(5, 99, tok_len - 1)
        text_mask = np.zeros(tok_len - 1, bool)
        text_mask[rng.choice(tok_len - 1, 2, replace=False)] = True
        vl_text_mask = nested_subset_mask(rng, text_mask, 0.5)
        image_mask = random_patch_mask(rng, num_patches, 0.75)
        vl_image_mask = superset_patch_mask(rng, image_mask, 0.6875)
        text_full = np.concatenate([text, [2]])
        tm = with_cls(text_mask, trailing_false=True)
        vtm = with_cls(vl_text_mask, trailing_false=True)
        im = with_cls(image_mask)
        vim = with_cls(vl_image_mask)
        samples.append({
            "id": 0,
            "source_text": text_full,
            "text_mask_indices": tm,
            "text_preserve_ids": to_preserve_ids(tm),
            "source_image": rng.randn(3, 32, 32).astype(np.float32),
            "image_mask_indices": im,
            "image_preserve_ids": to_preserve_ids(im),
            "vl_text_mask_indices": vtm,
            "vl_text_preserve_ids": to_preserve_ids(vtm),
            "vl_image_mask_indices": vim,
            "vl_image_preserve_ids": to_preserve_ids(vim),
        })
    return collate(samples, pad_idx=1)


@pytest.mark.slow
def test_vl_pretrain_step():
    cfg = _tiny_pretrain_cfg(audio=False)
    model = OnePeacePretrainModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    crit_cfg = CriterionConfig(_name="image_text_pretrain_loss",
                               label_smoothing=0.1)
    criterion = build_criterion(crit_cfg)
    batch = _vl_batch(np.random.RandomState(0))
    batch = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in batch.items()}

    def loss_fn(p):
        return criterion(model, p, batch, rng=jax.random.PRNGKey(1),
                         deterministic=True)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for key in ("itc_loss", "dcl_text_loss", "dcl_image_loss",
                "dcl_vl_text_loss", "dcl_vl_image_loss"):
        assert np.isfinite(float(metrics[key])), key
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # the decoder and mask heads must receive gradient
    assert float(optax.global_norm(grads["decoder_wrapper"])) > 0
    assert float(optax.global_norm(grads["text_mask_head"])) > 0
    assert float(optax.global_norm(grads["image_mask_head"])) > 0


def _al_batch(rng, spec, bsz=2, tok_len=6, wav_len=64):
    from one_peace_tpu.models.adapters.audio import conv_output_length

    t = conv_output_length(wav_len, spec)
    samples = []
    for _ in range(bsz):
        text = rng.randint(5, 99, tok_len - 1)
        al_text_mask = np.zeros(tok_len - 1, bool)
        al_text_mask[rng.choice(tok_len - 1, 2, replace=False)] = True
        audio_mask = compute_block_mask_1d(rng, t, 0.55, 2, 0.1)
        al_audio_mask = compute_block_mask_1d(rng, t, 0.45, 2, 0.1)
        am = with_cls(audio_mask)
        alam = with_cls(al_audio_mask)
        altm = with_cls(al_text_mask, trailing_false=True)
        samples.append({
            "id": 0,
            "source_text": np.concatenate([text, [2]]),
            "source_audio": rng.randn(wav_len).astype(np.float32),
            "audio_padding_mask": np.zeros(t + 1, bool),
            "audio_mask_indices": am,
            "audio_preserve_ids": to_preserve_ids(am),
            "al_text_mask_indices": altm,
            "al_text_preserve_ids": to_preserve_ids(altm),
            "al_audio_mask_indices": alam,
            "al_audio_preserve_ids": to_preserve_ids(alam),
        })
    return collate(samples, pad_idx=1)


@pytest.mark.slow
def test_al_pretrain_step_stage2():
    cfg = _tiny_pretrain_cfg(audio=True)
    model = OnePeacePretrainModel(cfg, stage2_pretrain=True)
    params = model.init(jax.random.PRNGKey(0))
    crit_cfg = CriterionConfig(_name="audio_text_pretrain_loss")
    criterion = build_criterion(crit_cfg)
    batch = _al_batch(np.random.RandomState(0),
                      cfg.encoder.audio_adapter.feature_encoder_spec)
    batch = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in batch.items()}

    def loss_fn(p):
        return criterion(model, p, batch, rng=jax.random.PRNGKey(1),
                         deterministic=True)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for key in ("atc_loss", "dcl_audio_loss", "dcl_al_text_loss",
                "dcl_al_audio_loss"):
        assert np.isfinite(float(metrics[key])), key
    # stage-2 mask: audio branch trainable, text adapter frozen
    mask = model.trainable_mask(params)
    enc_mask = mask["encoder_wrapper"]
    assert all(jax.tree.leaves(enc_mask["audio_adapter"]))
    assert not any(jax.tree.leaves(enc_mask["text_adapter"]))
    assert all(jax.tree.leaves(enc_mask["fusion"]["layers"]["audio_ffn"]))
    assert not any(jax.tree.leaves(enc_mask["fusion"]["layers"]["text_ffn"]))


def test_stage2_upgrade_from_stage1_checkpoint():
    """Stage-1 (VL) -> stage-2 (AL) checkpoint migration
    (ref one_peace_pretrain.py:181-198 + pretrain_al_3B.yaml): shared
    branches carry over, the audio branch is fresh, logit_scale resets."""
    cfg1 = _tiny_pretrain_cfg(audio=False)
    m1 = OnePeacePretrainModel(cfg1)
    p1 = m1.init(jax.random.PRNGKey(0))
    p1["logit_scale"] = p1["logit_scale"] + 1.0  # make the reset observable

    cfg2 = _tiny_pretrain_cfg(audio=True)
    cfg2.stage2_pretrain = True
    cfg2.reset_logit_scale = True
    m2 = OnePeacePretrainModel(cfg2)
    assert m2.stage2_pretrain  # flag flows from the config, no kwarg needed

    p2 = m2.upgrade_stage1_params(p1, seed=7)
    fresh = m2.init(jax.random.PRNGKey(7))

    # tree structure matches the stage-2 model exactly (image branch gone)
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(fresh))
    # shared text adapter carried over bit-for-bit from stage 1
    for a, b in zip(jax.tree.leaves(p2["encoder_wrapper"]["text_adapter"]),
                    jax.tree.leaves(p1["encoder_wrapper"]["text_adapter"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # audio branch freshly initialized (absent from the stage-1 tree)
    for a, b in zip(jax.tree.leaves(p2["encoder_wrapper"]["audio_adapter"]),
                    jax.tree.leaves(fresh["encoder_wrapper"]["audio_adapter"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # logit_scale keeps the fresh init, not the perturbed checkpoint value
    assert float(p2["logit_scale"]) == float(fresh["logit_scale"])
    assert float(p2["logit_scale"]) != float(p1["logit_scale"])


def test_pretrain_al_recipe_parses():
    """The shipped stage-2 AL recipe must express the reference's flags
    (ref pretrain_al_3B.yaml model.{stage2_pretrain,reset_logit_scale})."""
    import os

    from one_peace_tpu.core.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, stage2 in (("pretrain_al_4b.yaml", True),
                         ("pretrain_vl_4b.yaml", False)):
        cfg = load_config(os.path.join(root, "recipes/pretrain", name))
        assert cfg.model._name == "one_peace_pretrain"
        assert cfg.model.stage2_pretrain is stage2
        assert cfg.model.reset_logit_scale is stage2
    assert cfg.task._name == "image_text_pretrain"
