"""Training criterions.

Each criterion is a pure callable ``(model, params, batch, rng) ->
(loss, metrics_dict)`` jit-compatible under pjit; all seven of the
reference's criterions are covered (SURVEY.md §2.1 "Criterions"):

- image/audio-text pretrain (ITC + DCL denoising terms)
- image/audio-text retrieval (ITC only)
- classify (CE / multi-label BCE / soft targets)
- refcoco grounding (L1 + GIoU)
- hinge (AQA multiple choice)

The reference computes contrastive losses per-rank against no-grad
all-gathered negatives with rank-offset targets; under pjit the loss is
written over the global batch, which yields identical gradients
(see losses.py docstring).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..core.config import CriterionConfig
from ..core.registry import CRITERIONS
from .losses import (
    bce_with_logits_loss,
    cross_entropy_loss,
    dcl_loss,
    hinge_loss,
    itc_loss,
    refcoco_loss,
    soft_target_ce_loss,
)


@CRITERIONS.register("image_text_retrieval_criterion")
class ImageTextRetrievalCriterion:
    """ITC over (image, text) pairs (ref image_text_retrieval_loss.py)."""

    def __init__(self, cfg: CriterionConfig):
        self.label_smoothing = cfg.label_smoothing

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
        text_logits = model(params, src_tokens=batch["src_tokens"],
                            encoder_type="text", deterministic=deterministic,
                            rng=rngs[0])
        image_logits = model(params, src_images=batch["src_images"],
                             encoder_type="image", deterministic=deterministic,
                             rng=rngs[1])
        if isinstance(text_logits, tuple):  # pretrain model returns (logits, feats)
            text_logits, image_logits = text_logits[0], image_logits[0]
        scale = model.logit_scale_exp(params)
        loss, m = itc_loss(image_logits, text_logits, scale, self.label_smoothing)
        bsz = text_logits.shape[0]
        metrics = {
            "loss": loss,
            "logit_scale_exp": scale,
            "i2t_accuracy": 100.0 * m["a2b_ncorrect"] / bsz,
            "t2i_accuracy": 100.0 * m["b2a_ncorrect"] / bsz,
        }
        return loss, metrics


@CRITERIONS.register("audio_text_retrieval_criterion")
class AudioTextRetrievalCriterion:
    """ITC over (audio, text) pairs (ref audio_text_retrieval_loss.py)."""

    def __init__(self, cfg: CriterionConfig):
        self.label_smoothing = cfg.label_smoothing

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
        text_logits = model(params, src_tokens=batch["src_tokens"],
                            encoder_type="text", deterministic=deterministic,
                            rng=rngs[0])
        audio_logits = model(params, src_audios=batch["src_audios"],
                             audio_padding_masks=batch["audio_padding_masks"],
                             encoder_type="audio", deterministic=deterministic,
                             rng=rngs[1])
        if isinstance(text_logits, tuple):
            text_logits, audio_logits = text_logits[0], audio_logits[0]
        scale = model.logit_scale_exp(params)
        loss, m = itc_loss(audio_logits, text_logits, scale, self.label_smoothing)
        bsz = text_logits.shape[0]
        metrics = {
            "loss": loss,
            "logit_scale_exp": scale,
            "a2t_accuracy": 100.0 * m["a2b_ncorrect"] / bsz,
            "t2a_accuracy": 100.0 * m["b2a_ncorrect"] / bsz,
        }
        return loss, metrics


@CRITERIONS.register("image_text_pretrain_loss")
class ImageTextPretrainCriterion:
    """ITC + 4 DCL terms (ref image_text_pretrain_loss.py:77-166).

    Pass order matches the reference exactly: text teacher, image teacher,
    no-grad VL teacher, three student (masked) passes through the decoder.
    """

    def __init__(self, cfg: CriterionConfig):
        self.cfg = cfg

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        c = self.cfg
        rngs = jax.random.split(rng, 6) if rng is not None else [None] * 6
        src_tokens = batch["src_tokens"]
        src_images = batch["src_images"]

        text_logits, teacher_text = model(
            params, src_tokens=src_tokens, encoder_type="text",
            deterministic=deterministic, rng=rngs[0])
        image_logits, teacher_image = model(
            params, src_images=src_images, encoder_type="image",
            deterministic=deterministic, rng=rngs[1])
        teacher_vl_text, teacher_vl_image = jax.lax.stop_gradient(model(
            params, src_tokens=src_tokens, src_images=src_images,
            encoder_type="vl", deterministic=deterministic, rng=rngs[2]))

        student_text, _, _ = model(
            params, src_tokens=src_tokens,
            text_preserve_ids=batch["text_preserve_ids"], encoder_type="text",
            deterministic=deterministic, rng=rngs[3])
        _, student_image, _ = model(
            params, src_images=src_images,
            image_preserve_ids=batch["image_preserve_ids"], encoder_type="image",
            deterministic=deterministic, rng=rngs[4])
        student_vl_text, student_vl_image, _ = model(
            params, src_tokens=src_tokens,
            text_preserve_ids=batch["vl_text_preserve_ids"],
            src_images=src_images,
            image_preserve_ids=batch["vl_image_preserve_ids"], encoder_type="vl",
            deterministic=deterministic, rng=rngs[5])

        scale = model.logit_scale_exp(params)
        padding = src_tokens == 1

        dcl_text = dcl_loss(student_text, teacher_text,
                            batch["text_mask_indices"], padding,
                            c.dcl_logit_scale, c.label_smoothing,
                            gallery_chunks=getattr(c, 'dcl_gallery_chunks', 1))
        dcl_image = dcl_loss(student_image, teacher_image,
                             batch["image_mask_indices"], None,
                             c.dcl_logit_scale, c.label_smoothing,
                            gallery_chunks=getattr(c, 'dcl_gallery_chunks', 1))
        dcl_vl_text = dcl_loss(student_vl_text, teacher_vl_text,
                               batch["vl_text_mask_indices"], padding,
                               c.dcl_logit_scale, c.label_smoothing,
                            gallery_chunks=getattr(c, 'dcl_gallery_chunks', 1))
        dcl_vl_image = dcl_loss(student_vl_image, teacher_vl_image,
                                batch["vl_image_mask_indices"], None,
                                c.dcl_logit_scale, c.label_smoothing,
                            gallery_chunks=getattr(c, 'dcl_gallery_chunks', 1))
        itc, m = itc_loss(image_logits, text_logits, scale)

        loss = (itc + c.dcl_text_alpha * dcl_text + c.dcl_image_alpha * dcl_image
                + c.dcl_vl_text_alpha * dcl_vl_text
                + c.dcl_vl_image_alpha * dcl_vl_image)
        bsz = src_tokens.shape[0]
        metrics = {
            "loss": loss, "itc_loss": itc,
            "dcl_text_loss": dcl_text, "dcl_image_loss": dcl_image,
            "dcl_vl_text_loss": dcl_vl_text, "dcl_vl_image_loss": dcl_vl_image,
            "logit_scale_exp": scale,
            "i2t_accuracy": 100.0 * m["a2b_ncorrect"] / bsz,
            "t2i_accuracy": 100.0 * m["b2a_ncorrect"] / bsz,
        }
        return loss, metrics


@CRITERIONS.register("audio_text_pretrain_loss")
class AudioTextPretrainCriterion:
    """ATC + 3 DCL terms (ref audio_text_pretrain_loss.py:73-150).

    Pass structure matches the reference exactly: no-grad text teacher
    (the text branch is frozen in stage 2), audio teacher (ATC side),
    no-grad AL teacher, unimodal audio student, AL student (both text and
    audio masked).  Note both audio DCL terms score against the *AL*
    teacher features (ref :125-135), not the unimodal audio teacher.
    """

    def __init__(self, cfg: CriterionConfig):
        self.cfg = cfg

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        c = self.cfg
        rngs = jax.random.split(rng, 5) if rng is not None else [None] * 5
        src_tokens = batch["src_tokens"]
        src_audios = batch["src_audios"]
        pad_masks = batch["audio_padding_masks"]

        text_logits, _ = jax.lax.stop_gradient(model(
            params, src_tokens=src_tokens, encoder_type="text",
            deterministic=deterministic, rng=rngs[0]))
        audio_logits, _ = model(
            params, src_audios=src_audios, audio_padding_masks=pad_masks,
            encoder_type="audio", deterministic=deterministic, rng=rngs[1])
        teacher_al_text, teacher_al_audio = jax.lax.stop_gradient(model(
            params, src_tokens=src_tokens, src_audios=src_audios,
            audio_padding_masks=pad_masks, encoder_type="al",
            deterministic=deterministic, rng=rngs[2]))

        _, _, student_audio = model(
            params, src_audios=src_audios, audio_padding_masks=pad_masks,
            audio_preserve_ids=batch["audio_preserve_ids"], encoder_type="audio",
            deterministic=deterministic, rng=rngs[3])
        student_al_text, _, student_al_audio = model(
            params, src_tokens=src_tokens,
            text_preserve_ids=batch["al_text_preserve_ids"],
            src_audios=src_audios, audio_padding_masks=pad_masks,
            audio_preserve_ids=batch["al_audio_preserve_ids"],
            encoder_type="al", deterministic=deterministic, rng=rngs[4])

        scale = model.logit_scale_exp(params)
        text_padding = src_tokens == 1
        dcl_audio = dcl_loss(student_audio, teacher_al_audio,
                             batch["audio_mask_indices"], pad_masks,
                             c.dcl_logit_scale, c.label_smoothing,
                            gallery_chunks=getattr(c, 'dcl_gallery_chunks', 1))
        dcl_al_text = dcl_loss(student_al_text, teacher_al_text,
                               batch["al_text_mask_indices"], text_padding,
                               c.dcl_logit_scale, c.label_smoothing,
                            gallery_chunks=getattr(c, 'dcl_gallery_chunks', 1))
        dcl_al_audio = dcl_loss(student_al_audio, teacher_al_audio,
                                batch["al_audio_mask_indices"], pad_masks,
                                c.dcl_logit_scale, c.label_smoothing,
                            gallery_chunks=getattr(c, 'dcl_gallery_chunks', 1))
        atc, m = itc_loss(audio_logits, text_logits, scale)
        loss = (atc + c.dcl_audio_alpha * dcl_audio
                + c.dcl_al_text_alpha * dcl_al_text
                + c.dcl_al_audio_alpha * dcl_al_audio)
        bsz = src_tokens.shape[0]
        metrics = {
            "loss": loss, "atc_loss": atc,
            "dcl_audio_loss": dcl_audio, "dcl_al_text_loss": dcl_al_text,
            "dcl_al_audio_loss": dcl_al_audio,
            "logit_scale_exp": scale,
            "a2t_accuracy": 100.0 * m["a2b_ncorrect"] / bsz,
            "t2a_accuracy": 100.0 * m["b2a_ncorrect"] / bsz,
        }
        return loss, metrics


@CRITERIONS.register("classify_criterion")
class ClassifyCriterion:
    """CE / BCE multi-label / soft targets (ref classify_loss.py:40-73)."""

    def __init__(self, cfg: CriterionConfig, use_multi_label: Optional[bool] = None):
        self.label_smoothing = cfg.label_smoothing
        # config-driven (criterion.use_multi_label — the FSD50K/VQA
        # recipes need BCE, ref run_scripts/{fsd50k,vqa}/base.yaml:16);
        # the kwarg stays for direct construction
        if use_multi_label is None:
            use_multi_label = getattr(cfg, "use_multi_label", False)
        self.use_multi_label = use_multi_label

    def __call__(self, model, params, batch, rng=None, deterministic=False,
                 num_updates=None):
        kw = {}
        if num_updates is not None and getattr(
                model, "freeze_finetune_updates", 0):
            # thread the traced update count through so the encoder's
            # stop_gradient window (freeze_finetune_updates) can flip
            # inside the one compiled train step
            kw["num_updates"] = num_updates
        logits = model(params, **batch["net_input"], deterministic=deterministic,
                       rng=rng, **kw)
        targets = batch["target"]
        bsz = logits.shape[0]
        if self.use_multi_label:
            loss = bce_with_logits_loss(logits, targets)
            pred = jnp.argmax(logits, axis=1)
            ncorrect = jnp.sum(jnp.take_along_axis(targets, pred[:, None], axis=1))
        elif targets.ndim == 2:
            loss = soft_target_ce_loss(logits, targets)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            ncorrect = jnp.sum(probs * targets)
        else:
            loss = cross_entropy_loss(logits, targets, self.label_smoothing)
            ncorrect = jnp.sum(jnp.argmax(logits, axis=1) == targets)
        loss = loss / bsz
        return loss, {"loss": loss, "accuracy": 100.0 * ncorrect / bsz}


@CRITERIONS.register("refcoco_criterion")
class RefCOCOCriterion:
    """Grounding box regression (ref refcoco_loss.py:20-54)."""

    def __init__(self, cfg: CriterionConfig):
        pass

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        coords = model(params, **batch["net_input"], deterministic=deterministic,
                       rng=rng)
        coords = jax.nn.sigmoid(coords.astype(jnp.float32))
        loss = refcoco_loss(coords, batch["target"], coords.shape[0])
        return loss, {"loss": loss}


@CRITERIONS.register("hinge_criterion")
class HingeCriterion:
    """AQA multiple choice (ref hinge_loss.py:25-60)."""

    def __init__(self, cfg: CriterionConfig, margin: float = 1.0,
                 num_choices: Optional[int] = None):
        self.margin = margin
        self.num_choices = (getattr(cfg, "num_choices", 4)
                            if num_choices is None else num_choices)

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        src_tokens = batch["src_tokens"]  # (B*C, Lt) -- one row per choice
        src_audios = jnp.repeat(batch["src_audios"], self.num_choices, axis=0)
        pad = jnp.repeat(batch["audio_padding_masks"], self.num_choices, axis=0)
        logits = model(params, src_tokens=src_tokens, src_audios=src_audios,
                       audio_padding_masks=pad, deterministic=deterministic,
                       rng=rng)
        logits = logits.reshape(-1, self.num_choices)
        loss, ncorrect = hinge_loss(logits, batch["target"], self.margin)
        bsz = logits.shape[0]
        # fairseq divides gradients by sample_size = nsentences
        # (ref hinge_loss.py:55-57 + trainer multiply-by-1/sample_size);
        # differentiating the raw sum would scale the effective lr by B
        loss = loss / bsz
        return loss, {"loss": loss, "accuracy": 100.0 * ncorrect / bsz}


def build_criterion(cfg: CriterionConfig, **kw):
    aliases = {
        "image_text_pretrain": "image_text_pretrain_loss",
        "audio_text_pretrain": "audio_text_pretrain_loss",
    }
    name = aliases.get(cfg._name, cfg._name)
    return CRITERIONS.get(name)(cfg, **kw)
