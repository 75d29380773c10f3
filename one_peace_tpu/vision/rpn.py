"""Static-shape Region Proposal Network (the reference recipe's proposer).

The 60.4-AP detection recipe is RPN + cascade heads (ref det/configs/
onepeace/cascade_mask_rcnn_vitdet_50ep.py: detectron2 RPN with anchor
sizes 8*stride per level, aspect ratios {0.5, 1, 2}, Matcher thresholds
[0.3, 0.7] with low-quality force-matching, Box2BoxTransform deltas).
Everything here is fixed-shape and jittable:

- anchors are a per-level compile-time constant (H*W*A, 4);
- matching is a dense (N_anchors, M) IoU argmax with the force-match rule
  expressed as an equality test against each GT's best IoU;
- detectron2's 256-anchor 1:1 pos/neg sampling runs as STATIC-shape
  random weight vectors ('subsample', the default — literal reference
  semantics incl. the /256 normalizer, no data-dependent gather); the
  'balanced' alternative re-weights pos/neg halves per count
  (deterministic, measured -0.8 AP on the harness — PARITY.md);
- proposal decode mirrors FCOSHead.decode's host-side contract so the
  cascade/zoo plumbing is proposer-agnostic.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import conv2d, init_conv2d

# detectron2 Box2BoxTransform scale clamp: log(1000/16)
_DELTA_CLAMP = float(np.log(1000.0 / 16.0))


def cell_anchors(stride: int, ratios: Sequence[float],
                 scale: float) -> np.ndarray:
    """(A, 4) anchors centered at the origin (detectron2
    generate_cell_anchors): area = (scale*stride)^2, w = sqrt(area/r),
    h = r*w."""
    size = scale * stride
    out = []
    for r in ratios:
        w = np.sqrt(size * size / r)
        h = r * w
        out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float64)


def level_anchors(h: int, w: int, stride: int, ratios: Sequence[float],
                  scale: float) -> np.ndarray:
    """(h*w*A, 4) xyxy anchors for one pyramid level."""
    cell = cell_anchors(stride, ratios, scale)  # (A, 4)
    xs = (np.arange(w) + 0.5) * stride
    ys = (np.arange(h) + 0.5) * stride
    cx, cy = np.meshgrid(xs, ys)  # (h, w)
    centers = np.stack([cx, cy, cx, cy], -1).reshape(-1, 1, 4)
    return (centers + cell[None]).reshape(-1, 4).astype(np.float32)


def apply_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas (weights (1,1,1,1)): anchors (N, 4)
    xyxy + deltas (N, 4) -> boxes (N, 4)."""
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    xa = anchors[:, 0] + 0.5 * wa
    ya = anchors[:, 1] + 0.5 * ha
    dx, dy, dw, dh = [deltas[:, i] for i in range(4)]
    dw = jnp.clip(dw, None, _DELTA_CLAMP)
    dh = jnp.clip(dh, None, _DELTA_CLAMP)
    x = xa + dx * wa
    y = ya + dy * ha
    w = wa * jnp.exp(dw)
    h = ha * jnp.exp(dh)
    return jnp.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], -1)


def boxes_to_deltas(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform (regression targets)."""
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    xa = anchors[:, 0] + 0.5 * wa
    ya = anchors[:, 1] + 0.5 * ha
    wg = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    hg = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    xg = boxes[:, 0] + 0.5 * wg
    yg = boxes[:, 1] + 0.5 * hg
    return jnp.stack([(xg - xa) / wa, (yg - ya) / ha,
                      jnp.log(wg / wa), jnp.log(hg / ha)], -1)


class RPNHead:
    """Shared conv tower + objectness/delta 1x1 heads over the pyramid
    (detectron2 StandardRPNHead; the ViTDet recipe uses conv_dims=(-1,-1),
    i.e. two 3x3 convs)."""

    def __init__(self, in_channels: int, channels: int = 256,
                 num_convs: int = 2, strides: Sequence[int] = (4, 8, 16, 32),
                 anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0),
                 anchor_scale: float = 8.0):
        self.cin = in_channels
        self.channels = channels
        self.num_convs = num_convs
        self.strides = list(strides)
        self.ratios = list(anchor_ratios)
        self.scale = anchor_scale
        self.num_anchors = len(anchor_ratios)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, self.num_convs + 2)
        convs = []
        cin = self.cin
        for i in range(self.num_convs):
            convs.append(init_conv2d(keys[i], cin, self.channels, 3,
                                     dtype=dtype))
            cin = self.channels
        a = self.num_anchors
        return {
            "convs": convs,
            "obj": init_conv2d(keys[-2], self.channels, a, 1, dtype=dtype),
            "deltas": init_conv2d(keys[-1], self.channels, 4 * a, 1,
                                  dtype=dtype),
        }

    def __call__(self, params, feats: List[jnp.ndarray]):
        """feats: NHWC maps per stride.  Returns per-level
        (objectness (B, H, W, A), deltas (B, H, W, A, 4))."""
        outs = []
        for f in feats:
            x = f
            for c in params["convs"]:
                x = jax.nn.relu(conv2d(c, x, stride=1, padding="SAME"))
            obj = conv2d(params["obj"], x, stride=1, padding="SAME")
            d = conv2d(params["deltas"], x, stride=1, padding="SAME")
            b, h, w, _ = d.shape
            outs.append((obj, d.reshape(b, h, w, self.num_anchors, 4)))
        return outs

    def all_anchors(self, level_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
        """(sum_l h_l*w_l*A, 4) anchors over all levels (host constant)."""
        return np.concatenate([
            level_anchors(h, w, s, self.ratios, self.scale)
            for (h, w), s in zip(level_shapes, self.strides)], axis=0)

    def decode(self, outputs, score_thresh: float = 0.0,
               max_dets: int = 1000, nms_thresh: float = 0.7,
               pre_nms_topk: int = 1000) -> List[Dict[str, np.ndarray]]:
        """Host-side proposal decode (FCOSHead.decode contract: per-image
        dicts with boxes/scores/labels; labels are all zero — proposals
        are class-agnostic)."""
        from .detection import nms

        batch = outputs[0][0].shape[0]
        shapes = [o.shape[1:3] for o, _ in outputs]
        anchors_np = [level_anchors(h, w, s, self.ratios, self.scale)
                      for (h, w), s in zip(shapes, self.strides)]
        host_levels = []
        for (obj, deltas), anc in zip(outputs, anchors_np):
            b = obj.shape[0]
            boxes = jax.vmap(apply_deltas, in_axes=(None, 0))(
                jnp.asarray(anc), jnp.asarray(deltas).reshape(b, -1, 4))
            host_levels.append((
                np.asarray(jax.nn.sigmoid(obj).reshape(b, -1), np.float32),
                np.asarray(boxes, np.float32)))
        results = []
        for bi in range(batch):
            boxes_all, scores_all = [], []
            for scores, boxes in host_levels:
                s, bx = scores[bi], boxes[bi]
                k = min(pre_nms_topk, len(s))
                top = np.argpartition(-s, k - 1)[:k] if k < len(s) else \
                    np.arange(len(s))
                keep = s[top] > score_thresh
                boxes_all.append(bx[top][keep])
                scores_all.append(s[top][keep])
            bx = np.concatenate(boxes_all)
            sc = np.concatenate(scores_all)
            if len(bx) == 0:
                results.append({"boxes": np.zeros((0, 4), np.float32),
                                "scores": np.zeros((0,), np.float32),
                                "labels": np.zeros((0,), np.int64)})
                continue
            keep = nms(bx, sc, nms_thresh)[:max_dets]
            results.append({"boxes": bx[keep], "scores": sc[keep],
                            "labels": np.zeros((len(keep),), np.int64)})
        return results


def _box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def _sample_weights(pos, neg, rng, batch_size: int = 256,
                    pos_fraction: float = 0.5):
    """detectron2 subsample_labels as a STATIC-shape weight vector: pick
    min(pos_count, 128) random positives, fill to 256 with random
    negatives, weight 1 each (the baseline arm of the balanced-
    reweighting equivalence study — see examples/parity_harness.py)."""
    kp, kn = jax.random.split(rng)
    n = pos.shape[0]

    def ranks(mask, key):
        # rank of each masked anchor among the masked set, random order
        u = jax.random.uniform(key, (n,)) + (~mask) * 10.0
        return jnp.argsort(jnp.argsort(u))

    n_pos = jnp.minimum(pos.sum(), int(batch_size * pos_fraction))
    sel_p = pos & (ranks(pos, kp) < n_pos)
    n_neg = jnp.minimum(neg.sum(), batch_size - n_pos)
    sel_n = neg & (ranks(neg, kn) < n_neg)
    return sel_p.astype(jnp.float32), sel_n.astype(jnp.float32)


def rpn_loss(head: RPNHead, params, feats: List[jnp.ndarray], gt_boxes,
             gt_labels, gt_valid, sampler: str = "subsample",
             rng=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """RPN objectness + box losses (detectron2 rpn.py losses).

    feats: per-level NHWC maps; gt_boxes (B, M, 4); gt_valid (B, M) bool.
    gt_labels is accepted for signature parity with fcos_loss (the RPN is
    class-agnostic).

    sampler: 'subsample' (default — detectron2's literal 256-anchor 1:1
    random sample as static-shape weight vectors, exact normalizer
    semantics; needs ``rng``) or 'balanced' (pos and neg each carry half
    the objectness weight, normalized per count — deterministic, measured
    -0.8 AP on the 200-step harness, PARITY.md)."""
    outs = head(params, feats)
    anchors = jnp.asarray(head.all_anchors([o.shape[1:3] for o, _ in outs]))
    b = outs[0][0].shape[0]
    obj_flat = jnp.concatenate(
        [o.reshape(b, -1) for o, _ in outs], axis=1)  # (B, N)
    delta_flat = jnp.concatenate(
        [d.reshape(b, -1, 4) for _, d in outs], axis=1)  # (B, N, 4)

    if sampler == "subsample" and rng is None:
        # a silent fixed-key fallback would draw the SAME anchor subsample
        # every step — correlated sampling that quietly degrades training
        raise ValueError(
            "rpn_loss(sampler='subsample') needs a per-step rng; thread "
            "one through detector_training_loss, or set "
            "criterion.rpn_sampler='balanced' for the rng-free weighting")

    def per_image(obj, deltas, gtb, gtv, key):
        iou = _box_iou(anchors, gtb)  # (N, M)
        iou = jnp.where(gtv[None, :], iou, -1.0)
        best_iou = iou.max(-1)
        best_gt = iou.argmax(-1)
        pos = best_iou >= 0.7
        neg = (best_iou < 0.3) & (best_iou > -0.5)  # all-invalid rows stay neg
        neg = jnp.where(gtv.any(), neg, jnp.ones_like(neg))
        # low-quality force-match (Matcher allow_low_quality_matches): any
        # anchor achieving a valid GT's best IoU becomes positive
        gt_best = iou.max(0)  # (M,)
        force = ((iou == gt_best[None, :]) & gtv[None, :]
                 & (gt_best[None, :] > 0)).any(-1)
        pos = pos | force
        neg = neg & ~pos

        posf = pos.astype(jnp.float32)
        logits = obj.astype(jnp.float32)
        bce = jnp.maximum(logits, 0) - logits * posf + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        if sampler == "subsample":
            # the literal detectron2 sampler: 256 anchors, <=128 pos,
            # normalizer = batch_size_per_image (rpn.py losses)
            wp, wn = _sample_weights(pos, neg, key)
            obj_l = (bce * (wp + wn)).sum() / 256.0
            box_w, box_n = wp, 256.0
        else:
            negf = neg.astype(jnp.float32)
            npos = jnp.maximum(posf.sum(), 1.0)
            nneg = jnp.maximum(negf.sum(), 1.0)
            # balanced: pos and neg each carry half a 1:1 sample's weight
            obj_l = 0.5 * (bce * posf).sum() / npos + \
                0.5 * (bce * negf).sum() / nneg
            box_w, box_n = posf, jnp.maximum(posf.sum(), 1.0)

        tgt = boxes_to_deltas(anchors, gtb[best_gt])
        box_l = (jnp.abs(deltas.astype(jnp.float32) - tgt).sum(-1)
                 * box_w).sum() / box_n
        return obj_l, box_l, posf.sum()

    keys = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0),
                            b)
    obj_l, box_l, npos = jax.vmap(per_image)(obj_flat, delta_flat,
                                             gt_boxes, gt_valid, keys)
    loss = obj_l.mean() + box_l.mean()
    return loss, {"rpn_obj": obj_l.mean(), "rpn_box": box_l.mean(),
                  "rpn_pos": npos.mean()}
