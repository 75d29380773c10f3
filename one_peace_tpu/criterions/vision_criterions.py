"""Vision-transfer training criterions (detection / segmentation / video).

Same pure-callable contract as criterions.py: ``(model, params, batch,
rng, deterministic) -> (loss, metrics)``, jit-compatible under pjit.
These back the end-to-end drivers for the reference's three
vision-transfer apps:

- ``detection_criterion``  — the Cascade-Mask-R-CNN-style objective of
  vision/det_train.py (FCOS or RPN proposer + cascade stages + mask
  head) over static padded GT (ref det/lazyconfig_train_net.py training
  loop, detectron2 GeneralizedRCNN losses);
- ``segmentation_criterion`` — pixel cross-entropy with ignore_index;
  the default ``seg_loss_at='full'`` bilinearly upsamples logits to label
  resolution before the CE (mmseg-exact, ref seg/train.py + decode_head
  loss_decode — costs a (B, H, W, 150) fp32 volume; the 500-step harness
  showed +16 mIoU over the stride-4 raster, PARITY.md); ``'stride'``
  subsamples labels to the stride-4 logit raster when that volume does
  not fit;
- ``video_classify_criterion`` — CE with label smoothing over clip
  logits (ref video/train.py, mmaction2 recognizer cls_head loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import CriterionConfig
from ..core.registry import CRITERIONS


@CRITERIONS.register("detection_criterion")
class DetectionCriterion:
    """FCOS/RPN + cascade + mask losses over static padded GT."""

    def __init__(self, cfg: CriterionConfig):
        self.cfg = cfg
        self.rpn_sampler = getattr(cfg, "rpn_sampler", "subsample")

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        from ..vision.det_train import detector_training_loss

        gt_masks = batch.get("gt_masks")
        if gt_masks is not None:
            if model.mask_head is None:
                gt_masks = None
            else:
                # recover the raster stride from the static shapes
                mask_stride = batch["src_images"].shape[-1] // gt_masks.shape[-1]
        loss, metrics = detector_training_loss(
            model, params, batch["src_images"], batch["gt_boxes"],
            batch["gt_labels"], batch["gt_valid"],
            gt_masks=gt_masks, rng=rng,
            mask_stride=mask_stride if gt_masks is not None else 1,
            rpn_sampler=self.rpn_sampler)
        return loss, metrics


@CRITERIONS.register("segmentation_criterion")
class SegmentationCriterion:
    """UperNet path: ignore_index-masked CE, by default over logits
    bilinearly upsampled to label resolution (seg_loss_at='full',
    mmseg-exact; 'stride' computes on the stride-4 raster instead).
    Mask2Former path (model.is_mask2former): Hungarian-matched set losses
    (cls CE + point-sampled mask BCE + dice, deep supervision) per the
    reference's mmdet Mask2FormerHead training config — GT instance masks
    are derived on device from the semantic label map (one binary mask
    per class present in the crop, top-``seg_max_instances`` classes by
    pixel count; >32 distinct classes in one crop is vanishingly rare)."""

    def __init__(self, cfg: CriterionConfig, ignore_index: int = 255):
        self.label_smoothing = cfg.label_smoothing
        self.ignore_index = ignore_index
        self.loss_at = getattr(cfg, "seg_loss_at", "full")

    def _mask2former(self, model, params, batch, rng, deterministic):
        from ..vision.mask2former_loss import mask2former_loss

        all_cls, all_masks = model.forward_sets(params, batch["src_images"])
        target = batch["target"]  # (B, H, W)
        c = all_cls.shape[-1] - 1
        mh, mw = all_masks.shape[-2:]
        stride = target.shape[-1] // mw
        off = stride // 2
        # stride-subsampled labels: the mask predictions live at stride 4,
        # so the point losses sample the GT at the same raster (the torch
        # stack samples full-res GT; the granularity difference is below
        # the mask head's own resolution)
        tgt = target[:, off::stride, off::stride][:, :mh, :mw]

        kmax = min(getattr(model, "max_instances", 32),
                   getattr(model, "num_queries", 100), c)

        def per_image(t):
            valid = (t != self.ignore_index) & (t < c)
            safe = jnp.where(valid, t, c)
            counts = jnp.bincount(safe.reshape(-1), length=c + 1)[:c]
            vals, ids = jax.lax.top_k(counts, kmax)
            masks = (t[None] == ids[:, None, None]).astype(jnp.float32)
            return masks, ids.astype(jnp.int32), vals > 0

        gt_masks, gt_labels, gt_valid = jax.vmap(per_image)(tgt)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        num_points = getattr(model, "num_points", 2048)
        loss, metrics = mask2former_loss(
            all_cls, all_masks, gt_masks, gt_labels, gt_valid, rng,
            num_points=num_points)
        metrics["loss"] = loss
        return loss, metrics

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        if getattr(model, "is_mask2former", False):
            return self._mask2former(model, params, batch, rng,
                                     deterministic)
        logits = model.logits(params, batch["src_images"])  # (B, h, w, C)
        target = batch["target"]  # (B, H, W)
        if self.loss_at == "full":
            # mmseg-exact: bilinearly upsample logits to label resolution
            # (resize align_corners=False) and compute CE there — costs a
            # (B, H, W, C) fp32 volume; 'stride' instead subsamples labels
            # to the logit raster (delta measured in PARITY.md)
            b, h, w = target.shape
            logits = jax.image.resize(
                logits.astype(jnp.float32), (b, h, w, logits.shape[-1]),
                method="bilinear")
            tgt = target
        else:
            stride = target.shape[-1] // logits.shape[-2]
            off = stride // 2
            tgt = target[:, off::stride, off::stride]  # nearest label sample
            tgt = tgt[:, : logits.shape[1], : logits.shape[2]]

        c = logits.shape[-1]
        valid = (tgt != self.ignore_index)
        safe = jnp.where(valid, tgt, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        if self.label_smoothing > 0:
            smooth = -logp.mean(-1)
            nll = (1 - self.label_smoothing) * nll + self.label_smoothing * smooth
        vf = valid.astype(jnp.float32)
        loss = jnp.sum(nll * vf) / jnp.maximum(vf.sum(), 1.0)
        acc = jnp.sum((logits.argmax(-1) == tgt) * vf) / jnp.maximum(vf.sum(), 1.0)
        return loss, {"loss": loss, "pixel_acc": 100.0 * acc,
                      "valid_frac": vf.mean(), "num_classes": float(c)}


@CRITERIONS.register("video_classify_criterion")
class VideoClassifyCriterion:
    """Clip-level CE with label smoothing (mmaction2 recognizer loss)."""

    def __init__(self, cfg: CriterionConfig):
        self.label_smoothing = cfg.label_smoothing

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        logits = model(params, batch["src_videos"],
                       deterministic=deterministic, rng=rng)
        target = batch["target"]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, target[:, None].astype(jnp.int32),
                                   axis=-1)[:, 0]
        if self.label_smoothing > 0:
            smooth = -logp.mean(-1)
            nll = (1 - self.label_smoothing) * nll + self.label_smoothing * smooth
        loss = nll.mean()
        acc = (logits.argmax(-1) == target).mean()
        return loss, {"loss": loss, "accuracy": 100.0 * acc}
