"""Detector training losses: FCOS proposer + cascade + mask, end to end.

The reference trains its detector under detectron2 (RPN + cascade mask
R-CNN, det/configs/onepeace/cascade_mask_rcnn_vitdet_50ep.py); this
framework keeps the cascade/mask stages faithful (cascade_rcnn.py) and
substitutes an anchor-free FCOS proposer for the RPN (same role:
class-agnostic-ish region proposals; anchor boxes do not map well to a
jit-friendly static-shape pipeline).  Everything here is fixed-shape and
jittable: padded GT slots are masked by ``gt_valid``, multi-image batches
vmap the cascade assignment per image.

Losses (standard FCOS, Tian et al. 2019):
- classification: sigmoid focal loss (alpha=0.25, gamma=2) over every
  pyramid location;
- box: IoU loss at positive locations from the (l, t, r, b) distances;
- centerness: BCE against sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b)));
- assignment: a location is positive for the smallest-area valid GT box
  containing it whose max regression distance falls in the level's scale
  range ((0, 8s] for stride s, 8*last for the top level).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .cascade_rcnn import cascade_box_loss
from .roi_align import roi_align

def sigmoid_focal_loss(logits, targets, alpha: float = 0.25,
                       gamma: float = 2.0):
    p = jax.nn.sigmoid(logits)
    ce = optax_bce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def optax_bce(logits, targets):
    """Numerically-stable elementwise BCE with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def _level_points(h: int, w: int, stride: int):
    ys = (jnp.arange(h) + 0.5) * stride
    xs = (jnp.arange(w) + 0.5) * stride
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)  # (HW, 2)


def _assign_level(points, gt_boxes, gt_valid, range_lo, range_hi):
    """points (P, 2); gt (M, 4) one image.  Returns (labels_idx (P,) into
    gt or -1, ltrb (P, 4), pos (P,) bool)."""
    x, y = points[:, 0:1], points[:, 1:2]  # (P, 1)
    l = x - gt_boxes[None, :, 0]  # (P, M)
    t = y - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - x
    b = gt_boxes[None, :, 3] - y
    ltrb = jnp.stack([l, t, r, b], -1)  # (P, M, 4)
    inside = ltrb.min(-1) > 0
    maxd = ltrb.max(-1)
    in_range = (maxd >= range_lo) & (maxd <= range_hi)
    ok = inside & in_range & gt_valid[None, :]
    area = ((gt_boxes[:, 2] - gt_boxes[:, 0])
            * (gt_boxes[:, 3] - gt_boxes[:, 1]))[None, :]
    area = jnp.where(ok, area, jnp.inf)
    best = jnp.argmin(area, axis=-1)  # (P,)
    pos = jnp.isfinite(jnp.min(area, axis=-1))
    sel = jnp.take_along_axis(ltrb, best[:, None, None].repeat(4, -1),
                              axis=1)[:, 0]
    return best, sel, pos


def fcos_loss(head, params, feats: List[jnp.ndarray], gt_boxes, gt_labels,
              gt_valid) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """feats: per-level NHWC maps (head.strides); gt_boxes (B, M, 4) in
    input pixels, gt_labels (B, M) int, gt_valid (B, M) bool."""
    outs = head(params, feats)
    strides = head.strides
    total_cls = 0.0
    total_box = 0.0
    total_ctr = 0.0
    num_pos = 0.0
    for li, ((cls, box, ctr), stride) in enumerate(zip(outs, strides)):
        bsz, h, w, nc = cls.shape
        pts = _level_points(h, w, stride)
        lo = 0.0 if li == 0 else strides[li] * 4.0
        hi = jnp.inf if li == len(strides) - 1 else strides[li] * 8.0

        def per_image(cls_i, box_i, ctr_i, gtb, gtl, gtv):
            best, ltrb, pos = _assign_level(pts, gtb, gtv, lo, hi)
            posf = pos.astype(jnp.float32)
            lab = jnp.take_along_axis(gtl, best, 0)  # (P,)
            cls_tgt = (jax.nn.one_hot(lab, nc)
                       * posf[:, None]).astype(jnp.float32)
            cls_l = sigmoid_focal_loss(
                cls_i.reshape(-1, nc).astype(jnp.float32), cls_tgt).sum()
            # box IoU loss from distances
            pred = box_i.reshape(-1, 4).astype(jnp.float32)
            tgt = jnp.maximum(ltrb, 0.0)
            inter = (jnp.minimum(pred[:, 0], tgt[:, 0])
                     + jnp.minimum(pred[:, 2], tgt[:, 2])) * \
                    (jnp.minimum(pred[:, 1], tgt[:, 1])
                     + jnp.minimum(pred[:, 3], tgt[:, 3]))
            area_p = (pred[:, 0] + pred[:, 2]) * (pred[:, 1] + pred[:, 3])
            area_t = (tgt[:, 0] + tgt[:, 2]) * (tgt[:, 1] + tgt[:, 3])
            iou = inter / jnp.maximum(area_p + area_t - inter, 1e-6)
            box_l = jnp.sum(-jnp.log(jnp.clip(iou, 1e-6, 1.0)) * posf)
            # centerness target
            lr = jnp.stack([tgt[:, 0], tgt[:, 2]], -1)
            tb = jnp.stack([tgt[:, 1], tgt[:, 3]], -1)
            ctr_tgt = jnp.sqrt(jnp.clip(
                (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
                * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0.0, 1.0))
            ctr_l = jnp.sum(optax_bce(
                ctr_i.reshape(-1).astype(jnp.float32), ctr_tgt) * posf)
            return cls_l, box_l, ctr_l, posf.sum()

        cl, bl, ctl, npos = jax.vmap(per_image)(
            cls, box, ctr, gt_boxes, gt_labels, gt_valid)
        total_cls = total_cls + cl.sum()
        total_box = total_box + bl.sum()
        total_ctr = total_ctr + ctl.sum()
        num_pos = num_pos + npos.sum()

    denom = jnp.maximum(num_pos, 1.0)
    loss = (total_cls + total_box + total_ctr) / denom
    return loss, {"fcos_cls": total_cls / denom, "fcos_box": total_box / denom,
                  "fcos_ctr": total_ctr / denom, "fcos_pos": num_pos}


def mask_loss(head, params, features, boxes, batch_indices, gt_masks,
              mask_labels, valid, mask_stride: int = 1) -> jnp.ndarray:
    """BCE of the GT-class mask logits against the GT mask RoI-cropped to
    each box.  gt_masks (B, H, W) float {0,1} per matched instance is
    approximated by a per-box crop of the instance's full-image mask:
    gt_masks here is (N, H/ms, W/ms) — the matched instance mask per box,
    rasterized at stride ``mask_stride`` of the input pixels."""
    logits = head(params, features, boxes, batch_indices)  # (N, s, s, C)
    n, s, _, _ = logits.shape
    sel = jnp.take_along_axis(
        logits, mask_labels[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]  # (N, s, s)
    # crop each gt mask to its box at the mask resolution (boxes are in
    # input pixels; rescale to the GT raster's stride)
    tgt = roi_align(gt_masks[..., None].astype(jnp.float32),
                    boxes / float(mask_stride),
                    jnp.arange(n, dtype=jnp.int32), output_size=s,
                    spatial_scale=1.0)[..., 0]
    tgt = (tgt > 0.5).astype(jnp.float32)
    per = optax_bce(sel.astype(jnp.float32), tgt).mean((1, 2))
    vf = valid.astype(jnp.float32)
    return jnp.sum(per * vf) / jnp.maximum(vf.sum(), 1.0)


def detector_training_loss(detector, params, images, gt_boxes, gt_labels,
                           gt_valid, gt_masks: Optional[jnp.ndarray] = None,
                           rng: Optional[jax.Array] = None,
                           proposal_jitter: float = 0.1,
                           mask_stride: int = 1,
                           rpn_sampler: str = "subsample"):
    """Full Cascade-Mask-R-CNN-style training objective (jittable).

    images (B, 3, H, W); gt_boxes (B, M, 4); gt_labels (B, M);
    gt_valid (B, M); gt_masks (B, M, H/ms, W/ms) binary or None, stored at
    stride ``mask_stride`` (boxes are rescaled before the mask-target
    RoIAlign, so a stride-4 GT mask raster costs 1/16 the host memory of
    full resolution with no change to the loss semantics beyond raster
    granularity).

    The cascade trains on jittered GT boxes (the detectron2 recipe adds
    GT boxes to the sampled proposals; with a fixed budget the jittered
    GTs are the static-shape equivalent).
    """
    bsz, m = gt_boxes.shape[:2]
    f16 = detector.backbone(params["backbone"], images)
    pyr = detector.fpn(params["fpn"], f16)
    feats = [pyr[k] for k in detector.PYRAMID_KEYS]

    # independent streams for the RPN anchor sampler and the proposal
    # jitter — sharing the base key would correlate the two draws
    rng_sampler = rng_jitter = None
    if rng is not None:
        rng_sampler, rng_jitter = jax.random.split(rng)

    if getattr(detector, "proposer_kind", "fcos") == "rpn":
        from .rpn import rpn_loss

        loss_fcos, metrics = rpn_loss(detector.proposer, params["proposer"],
                                      feats, gt_boxes, gt_labels, gt_valid,
                                      sampler=rpn_sampler, rng=rng_sampler)
    else:
        loss_fcos, metrics = fcos_loss(detector.proposer, params["proposer"],
                                       feats, gt_boxes, gt_labels, gt_valid)

    # cascade on jittered GTs, vmapped per image (keeps assignment IoUs
    # within each image and RoIAlign in raw coordinates)
    if rng is not None:
        wh = jnp.concatenate([gt_boxes[..., 2:4] - gt_boxes[..., 0:2]] * 2, -1)
        noise = (jax.random.uniform(rng_jitter, gt_boxes.shape) - 0.5) \
            * proposal_jitter * wh
        props = gt_boxes + noise
    else:
        props = gt_boxes

    box_head = detector.box_head
    box_params = params["box_head"]

    def per_image(feat, p, gtb, gtl, gtv):
        # gtv doubles as the proposal mask: proposals are jittered GTs,
        # so invalid GT slots are degenerate boxes that must not train.
        # feat is the per-image pyramid tuple -> multi-level ROIPooler.
        return cascade_box_loss(
            box_head, box_params, jax.tree.map(lambda f: f[None], feat), p,
            jnp.zeros((m,), jnp.int32), gtb, gtl, gtv, prop_valid=gtv)

    closses, cmetrics = jax.vmap(per_image)(
        tuple(feats), props, gt_boxes, gt_labels, gt_valid)
    loss_cascade = closses.mean()
    metrics.update({k: v.mean() for k, v in cmetrics.items()})

    loss = loss_fcos + loss_cascade
    if gt_masks is not None and detector.mask_head is not None:
        labels_flat = gt_labels.reshape(-1)
        valid_flat = gt_valid.reshape(-1)
        lm = mask_loss(detector.mask_head, params["mask_head"], tuple(feats),
                       props.reshape(-1, 4),
                       jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), m),
                       gt_masks.reshape((-1,) + gt_masks.shape[2:]),
                       labels_flat, valid_flat,
                       mask_stride=mask_stride)
        metrics["mask_loss"] = lm
        loss = loss + lm
    metrics["loss"] = loss
    return loss, metrics
