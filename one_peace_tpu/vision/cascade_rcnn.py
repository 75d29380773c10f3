"""Cascade R-CNN box heads (inference path).

The reference's COCO detector is ViTDet + cascade mask R-CNN
(SURVEY.md §2.4).  This module implements the cascade refinement over the
backbone pyramid: proposals (from the FCOS head or an external proposer)
are RoIAligned, passed through per-stage FC box heads, and refined by
regressed box deltas across three stages (IoU thresholds 0.5/0.6/0.7 in
training); class scores are averaged over stages as in the paper.
Training is included: per-stage IoU target assignment (0.5/0.6/0.7
schedule), CE + smooth-L1 losses with detached stage-to-stage refinement,
plus the mask head (4 convs + deconv + per-class logits).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import gelu, init_linear, linear
from .roi_align import multi_level_roi_align, roi_align

# standard Faster R-CNN box-delta weights per cascade stage
STAGE_DELTA_WEIGHTS = ((10.0, 10.0, 5.0, 5.0),
                       (20.0, 20.0, 10.0, 10.0),
                       (30.0, 30.0, 15.0, 15.0))


def apply_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray,
                 weights: Tuple[float, float, float, float],
                 clip: float = 4.135) -> jnp.ndarray:
    """(N, 4) boxes (x0,y0,x1,y1) + (N, 4) deltas -> refined boxes."""
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      deltas[:, 2] / ww, deltas[:, 3] / wh)
    dw = jnp.clip(dw, -clip, clip)
    dh = jnp.clip(dh, -clip, clip)
    ncx = cx + dx * w
    ncy = cy + dy * h
    nw = w * jnp.exp(dw)
    nh = h * jnp.exp(dh)
    return jnp.stack([ncx - 0.5 * nw, ncy - 0.5 * nh,
                      ncx + 0.5 * nw, ncy + 0.5 * nh], axis=1)


class CascadeBoxHead:
    def __init__(self, in_channels: int, num_classes: int, pooled_size: int = 7,
                 fc_dim: int = 1024, num_stages: int = 3,
                 spatial_scale: float = 1 / 16,
                 feature_strides: Sequence[int] = (4, 8, 16, 32)):
        self.cin = in_channels
        self.num_classes = num_classes
        self.pooled = pooled_size
        self.fc_dim = fc_dim
        self.num_stages = num_stages
        self.spatial_scale = spatial_scale
        self.feature_strides = list(feature_strides)

    def _pool(self, features, boxes, batch_indices):
        """Single map (B, H, W, C) -> fixed-level RoIAlign; list/tuple of
        per-stride maps -> detectron2 multi-level ROIPooler."""
        if isinstance(features, (list, tuple)):
            return multi_level_roi_align(
                features, self.feature_strides, boxes, batch_indices,
                output_size=self.pooled)
        return roi_align(features, boxes, batch_indices,
                         output_size=self.pooled,
                         spatial_scale=self.spatial_scale)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 4 * self.num_stages)
        stages = []
        flat = self.cin * self.pooled * self.pooled
        for s in range(self.num_stages):
            stages.append({
                "fc1": init_linear(keys[4 * s], flat, self.fc_dim, dtype=dtype),
                "fc2": init_linear(keys[4 * s + 1], self.fc_dim, self.fc_dim, dtype=dtype),
                # class-agnostic box regression (cascade standard)
                "box": init_linear(keys[4 * s + 2], self.fc_dim, 4, dtype=dtype),
                "cls": init_linear(keys[4 * s + 3], self.fc_dim,
                                   self.num_classes + 1, dtype=dtype),
            })
        return {"stages": stages}

    def _stage(self, sp, feats_pooled):
        n = feats_pooled.shape[0]
        x = feats_pooled.reshape(n, -1)
        x = jax.nn.relu(linear(sp["fc1"], x))
        x = jax.nn.relu(linear(sp["fc2"], x))
        return linear(sp["cls"], x), linear(sp["box"], x)

    def __call__(self, params, features: jnp.ndarray, proposals: jnp.ndarray,
                 batch_indices: jnp.ndarray):
        """features: either a single (B, H, W, C) map (pooled at
        ``spatial_scale``) or a list/tuple of per-stride pyramid maps
        (multi-level ROIPooler); proposals (N, 4) in input pixels.
        Returns (scores (N, num_classes+1) averaged over stages,
        refined boxes (N, 4))."""
        boxes = proposals
        all_scores = []
        for s in range(self.num_stages):
            pooled = self._pool(features, boxes, batch_indices)
            cls_logits, deltas = self._stage(params["stages"][s], pooled)
            all_scores.append(jax.nn.softmax(cls_logits.astype(jnp.float32), -1))
            boxes = apply_deltas(boxes, deltas.astype(jnp.float32),
                                 STAGE_DELTA_WEIGHTS[s])
        scores = jnp.mean(jnp.stack(all_scores), axis=0)
        return scores, boxes

    def decode(self, scores, boxes, score_thresh: float = 0.05,
               iou_thresh: float = 0.6, max_dets: int = 100) -> Dict:
        """Host-side: drop background column, class-wise NMS."""
        from .detection import batched_nms

        scores = np.asarray(scores, np.float32)[:, :-1]  # last col = bg
        boxes = np.asarray(boxes, np.float32)
        n, c = scores.shape
        flat = scores.reshape(-1)
        keep = flat > score_thresh
        box_idx, labels = np.divmod(np.nonzero(keep)[0], c)
        sel_boxes = boxes[box_idx]
        sel_scores = flat[keep]
        order = batched_nms(sel_boxes, sel_scores, labels, iou_thresh)[:max_dets]
        return {"boxes": sel_boxes[order], "scores": sel_scores[order],
                "labels": labels[order].astype(np.int64)}


# ---------------------------------------------------------------------------
# training: per-stage target assignment + losses (cascade IoU schedule)
# ---------------------------------------------------------------------------

CASCADE_IOU_THRESHOLDS = (0.5, 0.6, 0.7)


def boxes_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def encode_deltas(boxes: jnp.ndarray, targets: jnp.ndarray,
                  weights) -> jnp.ndarray:
    """Inverse of apply_deltas: regression targets for matched boxes."""
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    tw = targets[:, 2] - targets[:, 0]
    th = targets[:, 3] - targets[:, 1]
    tcx = targets[:, 0] + 0.5 * tw
    tcy = targets[:, 1] + 0.5 * th
    return jnp.stack([
        wx * (tcx - cx) / jnp.maximum(w, 1e-6),
        wy * (tcy - cy) / jnp.maximum(h, 1e-6),
        ww * jnp.log(jnp.maximum(tw, 1e-6) / jnp.maximum(w, 1e-6)),
        wh * jnp.log(jnp.maximum(th, 1e-6) / jnp.maximum(h, 1e-6)),
    ], axis=1)


def assign_targets(proposals: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                   iou_threshold: float, num_classes: int):
    """IoU matcher: each proposal takes its best GT if IoU >= threshold,
    else background (label == num_classes).  Fixed shapes: gt_valid masks
    padded GT rows.  Returns (labels (N,), matched_boxes (N, 4),
    fg_mask (N,))."""
    iou = boxes_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
    fg = best_iou >= iou_threshold
    labels = jnp.where(fg, gt_labels[best], num_classes)
    matched = gt_boxes[best]
    return labels, matched, fg


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def cascade_box_loss(head: "CascadeBoxHead", params, features, proposals,
                     batch_indices, gt_boxes, gt_labels, gt_valid,
                     prop_valid=None):
    """Training loss over the cascade stages: CE on stage-averaged-free
    per-stage logits + smooth-L1 on deltas for foreground proposals;
    proposals refined stage to stage with stop_gradient (standard cascade
    training).  All shapes fixed; padded GTs masked via gt_valid, and
    padded *proposals* (callers that jitter a fixed GT budget produce
    degenerate boxes in the invalid slots) masked via prop_valid — without
    it the CE mean is dominated by 'background at the origin' noise."""
    boxes = proposals
    pv = (jnp.ones(proposals.shape[:1], jnp.float32) if prop_valid is None
          else prop_valid.astype(jnp.float32))
    total_cls = 0.0
    total_box = 0.0
    metrics = {}
    for s in range(head.num_stages):
        labels, matched, fg = assign_targets(
            boxes, gt_boxes, gt_labels, gt_valid,
            CASCADE_IOU_THRESHOLDS[min(s, 2)], head.num_classes)
        pooled = head._pool(features, boxes, batch_indices)
        cls_logits, deltas = head._stage(params["stages"][s], pooled)
        lp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(lp, labels[:, None], axis=1)[:, 0]
        cls_loss = jnp.sum(ce * pv) / jnp.maximum(pv.sum(), 1.0)
        delta_targets = encode_deltas(boxes, matched, STAGE_DELTA_WEIGHTS[s])
        box_err = smooth_l1(deltas.astype(jnp.float32) - delta_targets).sum(-1)
        fgf = fg.astype(jnp.float32) * pv
        box_loss = jnp.sum(box_err * fgf) / jnp.maximum(fgf.sum(), 1.0)
        total_cls = total_cls + cls_loss
        total_box = total_box + box_loss
        metrics[f"stage{s}_fg"] = jnp.sum(fgf) / jnp.maximum(pv.sum(), 1.0)
        # refine proposals for the next stage (detached, as in the paper)
        boxes = jax.lax.stop_gradient(
            apply_deltas(boxes, deltas.astype(jnp.float32),
                         STAGE_DELTA_WEIGHTS[s]))
    loss = (total_cls + total_box) / head.num_stages
    metrics.update({"cls_loss": total_cls / head.num_stages,
                    "box_loss": total_box / head.num_stages})
    return loss, metrics


class MaskHead:
    """Mask R-CNN mask head: 4 convs + deconv + per-class mask logits over
    RoIAligned features (the reference's cascade *mask* R-CNN component)."""

    def __init__(self, in_channels: int, num_classes: int, channels: int = 256,
                 pooled_size: int = 14, spatial_scale: float = 1 / 16,
                 feature_strides: Sequence[int] = (4, 8, 16, 32)):
        self.cin = in_channels
        self.num_classes = num_classes
        self.channels = channels
        self.pooled = pooled_size
        self.spatial_scale = spatial_scale
        self.feature_strides = list(feature_strides)

    def init(self, key, dtype=jnp.float32):
        from ..models.components import init_conv2d

        keys = jax.random.split(key, 6)
        return {
            "convs": [init_conv2d(keys[i], self.cin if i == 0 else self.channels,
                                  self.channels, 3, dtype=dtype)
                      for i in range(4)],
            "deconv": init_conv2d(keys[4], self.channels, self.channels, 2,
                                  dtype=dtype),
            "predictor": init_conv2d(keys[5], self.channels, self.num_classes,
                                     1, dtype=dtype),
        }

    def __call__(self, params, features, boxes, batch_indices):
        """-> (N, 2*pooled, 2*pooled, num_classes) mask logits."""
        from ..models.components import conv2d

        if isinstance(features, (list, tuple)):
            x = multi_level_roi_align(
                features, self.feature_strides, boxes, batch_indices,
                output_size=self.pooled)
        else:
            x = roi_align(features, boxes, batch_indices,
                          output_size=self.pooled,
                          spatial_scale=self.spatial_scale)
        for c in params["convs"]:
            x = jax.nn.relu(conv2d(c, x, stride=1, padding="SAME"))
        # 2x transposed-conv upsample
        x = jax.lax.conv_transpose(
            x, params["deconv"]["w"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["deconv"]["b"]
        x = jax.nn.relu(x)
        return conv2d(params["predictor"], x, stride=1, padding="SAME")
