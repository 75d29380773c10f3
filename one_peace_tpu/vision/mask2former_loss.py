"""Mask2Former set-prediction losses (jittable, static shapes).

Semantics follow the reference's mmdet Mask2FormerHead training config
(ref seg/configs/_base_/models/mask2former_onepeace.py:93-118):

- per decoder prediction level, per image: Hungarian assignment of
  ground-truth masks to queries with costs cls 2.0 (negative softmax
  prob), sigmoid-CE mask 5.0 and naive-dice 5.0, computed on
  ``num_points`` uniformly sampled points (mmdet samples the assigner's
  points uniformly; the loss points use importance sampling);
- classification: CE over ALL queries with class_weight 1.0 for real
  classes and 0.1 for no-object, weight 2.0, normalized by the summed
  class weights of the targets;
- mask losses on matched queries only: sigmoid BCE (weight 5.0,
  normalized by num_total_masks * num_points) + naive dice (weight 5.0,
  normalized by num_total_masks), on points importance-sampled by
  prediction uncertainty (oversample_ratio 3.0, importance 0.75 —
  PointRend's get_uncertain_point_coords_with_randomness);
- deep supervision: the same loss on every one of the
  1 + num_decoder_layers prediction levels, summed.

The Hungarian step is the TPU-native auction matcher
(vision/matching.py) — no host callback in the train step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .matching import auction_assign


def point_sample(mask: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """mask (..., H, W); points (P, 2) in [0, 1] (x, y) -> (..., P).
    grid_sample align_corners=False semantics (zero-padded bilinear)."""
    h, w = mask.shape[-2:]
    x = points[:, 0] * w - 0.5
    y = points[:, 1] * h - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    tx, ty = x - x0, y - y0
    flat = mask.reshape(mask.shape[:-2] + (h * w,))

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
               + jnp.clip(xi, 0, w - 1).astype(jnp.int32))
        return flat[..., idx] * inside.astype(mask.dtype)

    top = tap(x0, y0) * (1 - tx) + tap(x0 + 1, y0) * tx
    bot = tap(x0, y0 + 1) * (1 - tx) + tap(x0 + 1, y0 + 1) * tx
    return top * (1 - ty) + bot * ty


def _bce_logits(logits, targets):
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _dice(pred_sig: jnp.ndarray, gt: jnp.ndarray, eps: float = 1.0):
    """naive_dice over the last axis (mmdet DiceLoss naive_dice=True)."""
    num = 2.0 * (pred_sig * gt).sum(-1)
    den = pred_sig.sum(-1) + gt.sum(-1)
    return 1.0 - (num + eps) / (den + eps)


def _match_costs(cls_logits, mask_points, gt_labels, gt_points,
                 cls_w=2.0, mask_w=5.0, dice_w=5.0):
    """cls_logits (Q, C+1); mask_points (Q, P) logits; gt_labels (K,);
    gt_points (K, P) {0,1} -> (K, Q) cost matrix (rows = GTs)."""
    p = mask_points.shape[-1]
    prob = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)
    cls_cost = -prob[:, gt_labels].T  # (K, Q)
    pos = -jax.nn.log_sigmoid(mask_points.astype(jnp.float32))  # (Q, P)
    neg = -jax.nn.log_sigmoid(-mask_points.astype(jnp.float32))
    mask_cost = (jnp.einsum("kp,qp->kq", gt_points, pos)
                 + jnp.einsum("kp,qp->kq", 1.0 - gt_points, neg)) / p
    sig = jax.nn.sigmoid(mask_points.astype(jnp.float32))
    dice_cost = 1.0 - (2.0 * jnp.einsum("kp,qp->kq", gt_points, sig) + 1.0) \
        / (gt_points.sum(-1)[:, None] + sig.sum(-1)[None, :] + 1.0)
    return cls_w * cls_cost + mask_w * mask_cost + dice_w * dice_cost


def uncertainty_points(rng, mask_logits: jnp.ndarray, num_points: int,
                       oversample: float = 3.0,
                       importance: float = 0.75) -> jnp.ndarray:
    """Per-mask point coords (..., P, 2) in [0,1]: sample
    oversample*P uniform candidates, keep the importance*P most uncertain
    (uncertainty = -|logit|), fill the rest uniformly (PointRend
    get_uncertain_point_coords_with_randomness)."""
    lead = mask_logits.shape[:-2]
    n_cand = int(num_points * oversample)
    n_imp = int(num_points * importance)
    n_rand = num_points - n_imp
    k1, k2 = jax.random.split(rng)
    cand = jax.random.uniform(k1, lead + (n_cand, 2))
    flatc = cand.reshape((-1, n_cand, 2))
    flatm = mask_logits.reshape((-1,) + mask_logits.shape[-2:])
    vals = jax.vmap(point_sample)(flatm[:, None], flatc)[:, 0]  # (N, n_cand)
    unc = -jnp.abs(vals)
    _, idx = jax.lax.top_k(unc, n_imp)
    imp = jnp.take_along_axis(flatc, idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (flatc.shape[0], n_rand, 2))
    pts = jnp.concatenate([imp, rand], axis=1)
    return pts.reshape(lead + (num_points, 2))


def mask2former_loss(all_cls: jnp.ndarray, all_masks: jnp.ndarray,
                     gt_masks: jnp.ndarray, gt_labels: jnp.ndarray,
                     gt_valid: jnp.ndarray, rng,
                     num_points: int = 12544,
                     cls_weight: float = 2.0, mask_weight: float = 5.0,
                     dice_weight: float = 5.0,
                     no_object_weight: float = 0.1
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """all_cls (L, B, Q, C+1); all_masks (L, B, Q, H, W) logits at the
    mask-feature stride; gt_masks (B, K, Hm, Wm) {0,1} at the label
    resolution; gt_labels (B, K) int; gt_valid (B, K) bool."""
    lvls, b, q, c1 = all_cls.shape
    num_classes = c1 - 1
    k = gt_masks.shape[1]
    gt_masks = gt_masks.astype(jnp.float32)

    num_total_masks = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
    cw = jnp.concatenate([jnp.ones((num_classes,), jnp.float32),
                          jnp.asarray([no_object_weight])])

    def level_loss(carry, inputs):
        cls_l, masks_l, rng_l = inputs

        def per_image(cls_i, masks_i, gtm, gtl, gtv, rng_i):
            r1, r2 = jax.random.split(rng_i)
            # --- matching on uniform points
            pts = jax.random.uniform(r1, (num_points, 2))
            mp = point_sample(masks_i, pts)  # (Q, P)
            gp = point_sample(gtm, pts)      # (K, P)
            cost = _match_costs(cls_i, mp, gtl, gp, cls_weight,
                                mask_weight, dice_weight)
            cost = jnp.where(gtv[:, None], cost, 0.0)
            # the assignment is a constant w.r.t. the parameters (the
            # torch stack matches under no_grad); stop_gradient also lets
            # AD elide the auction while_loop entirely
            col = auction_assign(jax.lax.stop_gradient(cost), gtv)

            # --- classification targets over all queries
            labels = jnp.full((q,), num_classes, jnp.int32)
            labels = labels.at[col].set(
                jnp.where(gtv, gtl, labels[col]).astype(jnp.int32))
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(cls_i.astype(jnp.float32), -1),
                labels[:, None], 1)[:, 0]
            wts = cw[labels]
            cls_loss_num = (ce * wts).sum()
            cls_loss_den = wts.sum()

            # --- mask losses on matched queries, importance-sampled points
            matched_logits = masks_i[col]  # (K, H, W)
            pts2 = uncertainty_points(r2, matched_logits, num_points)
            pm = jax.vmap(lambda m, p: point_sample(m[None], p)[0])(
                matched_logits, pts2)  # (K, P)
            pg = jax.vmap(lambda m, p: point_sample(m[None], p)[0])(
                gtm, pts2)
            vf = gtv.astype(jnp.float32)
            bce = _bce_logits(pm.astype(jnp.float32), pg).mean(-1)
            mask_loss_num = (bce * vf).sum() * num_points
            dice = _dice(jax.nn.sigmoid(pm.astype(jnp.float32)), pg)
            dice_loss_num = (dice * vf).sum()
            return cls_loss_num, cls_loss_den, mask_loss_num, dice_loss_num

        rngs = jax.random.split(rng_l, b)
        cn, cd, mn, dn = jax.vmap(per_image)(
            cls_l, masks_l, gt_masks, gt_labels, gt_valid, rngs)
        cls_loss = cls_weight * cn.sum() / jnp.maximum(cd.sum(), 1.0)
        mask_loss = mask_weight * mn.sum() / (num_total_masks * num_points)
        dice_loss = dice_weight * dn.sum() / num_total_masks
        return carry, (cls_loss, mask_loss, dice_loss)

    rngs = jax.random.split(rng, lvls)
    _, (cls_l, mask_l, dice_l) = jax.lax.scan(
        level_loss, 0, (all_cls, all_masks, rngs))
    loss = cls_l.sum() + mask_l.sum() + dice_l.sum()
    metrics = {
        "m2f_cls": cls_l[-1], "m2f_mask": mask_l[-1], "m2f_dice": dice_l[-1],
        "m2f_cls_aux": cls_l[:-1].sum(),
        "m2f_mask_aux": mask_l[:-1].sum(),
        "m2f_dice_aux": dice_l[:-1].sum(),
    }
    return loss, metrics
