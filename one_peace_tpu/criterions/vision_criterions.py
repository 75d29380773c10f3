"""Vision-transfer training criterions (detection / segmentation / video).

Same pure-callable contract as criterions.py: ``(model, params, batch,
rng, deterministic) -> (loss, metrics)``, jit-compatible under pjit.
These back the end-to-end drivers for the reference's three
vision-transfer apps:

- ``detection_criterion``  — the Cascade-Mask-R-CNN-style objective of
  vision/det_train.py (FCOS or RPN proposer + cascade stages + mask
  head) over static padded GT (ref det/lazyconfig_train_net.py training
  loop, detectron2 GeneralizedRCNN losses);
- ``segmentation_criterion`` — pixel cross-entropy with ignore_index,
  computed at the UperNet output stride against stride-subsampled labels
  (mmseg upsamples logits to label resolution instead
  — ref seg/train.py + decode_head loss_decode; computing at stride-4
  avoids materializing a (B, H, W, 150) fp32 logit volume);
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
            mask_stride=mask_stride if gt_masks is not None else 1)
        return loss, metrics


@CRITERIONS.register("segmentation_criterion")
class SegmentationCriterion:
    """CE over the stride-4 logit map, ignore_index-masked."""

    def __init__(self, cfg: CriterionConfig, ignore_index: int = 255):
        self.label_smoothing = cfg.label_smoothing
        self.ignore_index = ignore_index

    def __call__(self, model, params, batch, rng=None, deterministic=False):
        logits = model.logits(params, batch["src_images"])  # (B, h, w, C)
        target = batch["target"]  # (B, H, W)
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
