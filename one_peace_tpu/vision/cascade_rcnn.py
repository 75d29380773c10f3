"""Cascade R-CNN box heads (inference path).

The reference's COCO detector is ViTDet + cascade mask R-CNN
(SURVEY.md §2.4).  This module implements the cascade refinement over the
backbone pyramid: proposals (from the FCOS head or an external proposer)
are RoIAligned, passed through per-stage FC box heads, and refined by
regressed box deltas across three stages (IoU thresholds 0.5/0.6/0.7 in
training); class scores are averaged over stages as in the paper.
Training-time target assignment is future work; the inference path is
complete and tested.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import gelu, init_linear, linear
from .roi_align import roi_align

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
                 spatial_scale: float = 1 / 16):
        self.cin = in_channels
        self.num_classes = num_classes
        self.pooled = pooled_size
        self.fc_dim = fc_dim
        self.num_stages = num_stages
        self.spatial_scale = spatial_scale

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
        """features (B, H, W, C) stride-16 map; proposals (N, 4) in input
        pixels.  Returns (scores (N, num_classes+1) averaged over stages,
        refined boxes (N, 4))."""
        boxes = proposals
        all_scores = []
        for s in range(self.num_stages):
            pooled = roi_align(features, boxes, batch_indices,
                               output_size=self.pooled,
                               spatial_scale=self.spatial_scale)
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
