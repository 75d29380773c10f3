"""Detection head over the vision backbone pyramid.

The reference's detection app is detectron2 ViTDet + cascade mask R-CNN
(SURVEY.md §2.4).  This module provides the TPU-native detection
capability in an anchor-free single-stage form (FCOS-style): shared conv
towers over the feature pyramid predicting per-location class scores,
box distances (l, t, r, b) and centerness, plus jit-friendly decoding and
class-wise NMS.  A cascade R-CNN-parity head is future work; this is the
end-to-end usable detector.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import conv2d, init_conv2d
from .adapter import group_norm


class FCOSHead:
    def __init__(self, in_channels: int, num_classes: int, channels: int = 256,
                 num_convs: int = 4, strides: Sequence[int] = (8, 16, 32)):
        self.cin = in_channels
        self.num_classes = num_classes
        self.channels = channels
        self.num_convs = num_convs
        self.strides = list(strides)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 4 * self.num_convs + 8)
        ki = iter(keys)

        def tower():
            convs = []
            cin = self.cin
            for _ in range(self.num_convs):
                convs.append({
                    "conv": init_conv2d(next(ki), cin, self.channels, 3, dtype=dtype),
                    "gn": {"scale": jnp.ones((self.channels,), dtype),
                           "bias": jnp.zeros((self.channels,), dtype)},
                })
                cin = self.channels
            return convs

        params = {
            "cls_tower": tower(),
            "box_tower": tower(),
            "cls_pred": init_conv2d(next(ki), self.channels, self.num_classes, 3,
                                    dtype=dtype),
            "box_pred": init_conv2d(next(ki), self.channels, 4, 3, dtype=dtype),
            "ctr_pred": init_conv2d(next(ki), self.channels, 1, 3, dtype=dtype),
            # per-level learnable box scale
            "scales": jnp.ones((len(self.strides),), dtype),
        }
        # focal-loss style bias init: background-heavy prior
        prior = 0.01
        params["cls_pred"]["b"] = jnp.full(
            (self.num_classes,), -float(np.log((1 - prior) / prior)), dtype)
        return params

    def _tower(self, convs, x):
        for c in convs:
            x = conv2d(c["conv"], x, stride=1, padding="SAME")
            x = jax.nn.relu(group_norm(c["gn"], x))
        return x

    def __call__(self, params, feats: List[jnp.ndarray]):
        """feats: NHWC pyramid maps (matching self.strides).  Returns
        per-level (cls_logits, box_reg, centerness)."""
        outs = []
        for i, f in enumerate(feats):
            ct = self._tower(params["cls_tower"], f)
            bt = self._tower(params["box_tower"], f)
            cls = conv2d(params["cls_pred"], ct, stride=1, padding="SAME")
            box = conv2d(params["box_pred"], bt, stride=1, padding="SAME")
            box = jnp.exp(params["scales"][i] * box) * self.strides[i]
            ctr = conv2d(params["ctr_pred"], bt, stride=1, padding="SAME")
            outs.append((cls, box, ctr))
        return outs

    def decode(self, outputs, score_thresh: float = 0.05,
               max_dets: int = 100) -> List[Dict[str, np.ndarray]]:
        """Host-side decode + class-wise NMS.  Returns per-image dicts of
        boxes (x0,y0,x1,y1), scores, labels."""
        batch = outputs[0][0].shape[0]
        # one device computation + one host fetch per LEVEL (not per
        # image-level pair): per-image slicing on device would refetch
        # each level's maps B times over the tunnel
        host_levels = [
            (np.asarray(jax.nn.sigmoid(cls), np.float32),
             np.asarray(jax.nn.sigmoid(ctr[..., 0]), np.float32),
             np.asarray(box, np.float32))
            for cls, box, ctr in outputs
        ]
        results = []
        for b in range(batch):
            boxes_all, scores_all, labels_all = [], [], []
            for (cls_f, ctr_f, box_f), stride in zip(host_levels,
                                                     self.strides):
                cls_b, ctr_b, box_b = cls_f[b], ctr_f[b], box_f[b]
                h, w, _ = cls_b.shape
                ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                cx = (xs + 0.5) * stride
                cy = (ys + 0.5) * stride
                score = cls_b * ctr_b[..., None]
                keep = score > score_thresh
                loc_idx, cls_idx = np.nonzero(keep.reshape(-1, cls_b.shape[-1]))
                if loc_idx.size == 0:
                    continue
                l, t, r, d = [box_b.reshape(-1, 4)[loc_idx, i] for i in range(4)]
                cxf, cyf = cx.reshape(-1)[loc_idx], cy.reshape(-1)[loc_idx]
                boxes_all.append(np.stack(
                    [cxf - l, cyf - t, cxf + r, cyf + d], -1))
                scores_all.append(score.reshape(-1, cls_b.shape[-1])[loc_idx, cls_idx])
                labels_all.append(cls_idx)
            if not boxes_all:
                results.append({"boxes": np.zeros((0, 4), np.float32),
                                "scores": np.zeros((0,), np.float32),
                                "labels": np.zeros((0,), np.int64)})
                continue
            boxes = np.concatenate(boxes_all)
            scores = np.concatenate(scores_all)
            labels = np.concatenate(labels_all)
            keep = batched_nms(boxes, scores, labels)[:max_dets]
            results.append({"boxes": boxes[keep], "scores": scores[keep],
                            "labels": labels[keep].astype(np.int64)})
        return results


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.6) -> np.ndarray:
    """Greedy NMS (host-side numpy)."""
    order = np.argsort(-scores)
    keep = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx1 - xx0, 0, None) * np.clip(yy1 - yy0, 0, None)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-6)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def batched_nms(boxes, scores, labels, iou_thresh: float = 0.6) -> np.ndarray:
    """Class-wise NMS via the coordinate-offset trick.  Shift by the
    coordinate MINIMUM first: decoded boxes can have negative coords
    (borders are not clipped), and a negative-coordinate box offset by
    ``max * label`` lands inside the previous class's band, wrongly
    suppressing across classes."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    shifted = boxes - boxes.min()
    offset = (shifted.max() + 1) * labels[:, None].astype(np.float32)
    return nms(shifted + offset, scores, iou_thresh)
