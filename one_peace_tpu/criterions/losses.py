"""Loss primitives shared by the criterions.

Pure functions over global (mesh-sharded) batches.  For ITC the
reference computes per-rank losses against a no-grad ``all_gather``
gallery with rank-offset targets (ref:
criterions/image_text_retrieval_loss.py:29-39, 93-123;
utils/data_utils.py:30-37 — the gallery side is detached even in the
single-process ``.data`` branch); under pjit a single jitted loss over
the global batch with ``stop_gradient`` on the gallery side is exactly
that computation summed over ranks (XLA's psum delivers the sum).

DCL is different: the reference never gathers — each rank's DCL gallery
is its LOCAL batch.  ``dcl_loss(gallery_chunks=...)`` reproduces that
per-rank statistic exactly when asked; the default (1 = global gallery)
is a documented deviation that only differs from the reference when the
reference recipe ran multi-GPU (see dcl_loss's docstring).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def label_smoothed_nll(lprobs: jnp.ndarray, targets: jnp.ndarray,
                       epsilon: float = 0.0) -> jnp.ndarray:
    """Mean label-smoothed NLL (ref image_text_retrieval_loss.py:16-27)."""
    nll = -jnp.take_along_axis(lprobs, targets[:, None], axis=-1)[:, 0]
    if epsilon == 0.0:
        return nll.mean()
    smooth = -jnp.sum(lprobs, axis=-1)
    eps_i = epsilon / (lprobs.shape[-1] - 1)
    return ((1.0 - epsilon - eps_i) * nll + eps_i * smooth).mean()


def itc_loss(
    emb_a: jnp.ndarray,
    emb_b: jnp.ndarray,
    logit_scale: jnp.ndarray,
    label_smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, dict]:
    """Symmetric InfoNCE over the (global) batch.

    emb_a/emb_b: (B, D) L2-normalized.  Returns (loss, metrics) with
    a2b/b2a accuracies (ref compute_itc_loss :93-123).
    """
    b = emb_a.shape[0]
    targets = jnp.arange(b)
    # gallery side detached, exactly like the reference (text_logits_all /
    # image_logits_all come from gather_without_grad, and the
    # single-process branch uses .data): each direction's gradient flows
    # only through its query-side embeddings
    a32 = emb_a.astype(jnp.float32)
    b32 = emb_b.astype(jnp.float32)
    sim_a2b = logit_scale * (a32 @ jax.lax.stop_gradient(b32).T)
    sim_b2a = logit_scale * (b32 @ jax.lax.stop_gradient(a32).T)
    lp_a2b = jax.nn.log_softmax(sim_a2b, axis=-1)
    lp_b2a = jax.nn.log_softmax(sim_b2a, axis=-1)
    loss = 0.5 * (
        label_smoothed_nll(lp_a2b, targets, label_smoothing)
        + label_smoothed_nll(lp_b2a, targets, label_smoothing)
    )
    metrics = {
        "a2b_ncorrect": jnp.sum(jnp.argmax(sim_a2b, axis=1) == targets),
        "b2a_ncorrect": jnp.sum(jnp.argmax(sim_b2a, axis=1) == targets),
    }
    return loss, metrics


def _dcl_chunk(sf, tf, scored, col_valid, logit_scale, label_smoothing):
    """(sum of NLL over scored rows, scored count) for one gallery chunk."""
    sn = sf / jnp.maximum(jnp.linalg.norm(sf, axis=-1, keepdims=True), 1e-6)
    tn = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-6)
    sim = logit_scale * (sn @ tn.T)  # (N, N)
    sim = jnp.where(col_valid[None, :], sim, -jnp.inf)
    lprobs = jax.nn.log_softmax(sim, axis=-1)
    diag = jnp.diagonal(lprobs)
    nll = -diag
    if label_smoothing > 0.0:
        n_valid = jnp.sum(col_valid.astype(jnp.float32))
        smooth = -jnp.sum(jnp.where(col_valid[None, :], lprobs, 0.0), axis=-1)
        eps_i = label_smoothing / jnp.maximum(n_valid - 1, 1.0)
        nll = (1.0 - label_smoothing - eps_i) * nll + eps_i * smooth
    # where() not multiply: unscored rows can hold inf (their own teacher
    # column is -inf when padded) and inf * 0 = nan
    w = scored.astype(jnp.float32)
    return jnp.sum(jnp.where(scored, nll, 0.0)), jnp.sum(w)


def dcl_loss(
    student: jnp.ndarray,
    teacher: jnp.ndarray,
    mask_indices: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray] = None,
    logit_scale: float = 2.5,
    label_smoothing: float = 0.0,
    gallery_chunks: int = 1,
) -> jnp.ndarray:
    """Denoising contrastive loss (ref image_text_pretrain_loss.py:187-215).

    Each masked student token (CLS excluded) is contrasted against the
    non-padding teacher tokens of its gallery (flattened, CLS excluded)
    via cosine similarity * logit_scale; the teacher is detached; the
    target of student token (b, t) is its own teacher token.

    Gallery scope: the reference DCL never all_gathers — each DDP rank's
    gallery is its LOCAL batch (B_total / world_size samples).  Under
    pjit there are no ranks, so ``gallery_chunks=1`` (default) uses the
    whole global batch (a strictly larger negative set); set
    ``gallery_chunks=world_size_of_the_reference_recipe`` (e.g. 8 for
    pretrain_vl_3B's 8 GPUs) to reproduce the reference's per-rank
    gallery statistics exactly — per-chunk NLL sums and counts are
    combined globally, which is precisely the reference's cross-rank
    loss/sample_size aggregation.

    Fixed-shape formulation: the reference filters padding/unmasked rows
    with data-dependent gathers; here padding columns get -inf logits (so
    they drop out of the softmax denominator exactly like being filtered)
    and unmasked rows are zero-weighted in the mean.

    student/teacher: (B, L, D) with CLS at position 0;
    mask_indices: (B, L) True where the token was masked (scored);
    padding_mask: (B, L-1) or (B, L) True at padding, or None.
    """
    b, l, d = student.shape
    n = b * (l - 1)
    sf = student[:, 1:].astype(jnp.float32).reshape(n, d)
    tf = jax.lax.stop_gradient(teacher[:, 1:].astype(jnp.float32)).reshape(n, d)
    scored = mask_indices[:, 1:].reshape(n)
    if padding_mask is not None:
        pad = padding_mask[:, -(l - 1):].reshape(n)
        scored = scored & ~pad
        col_valid = ~pad
    else:
        col_valid = jnp.ones((n,), bool)

    g = max(int(gallery_chunks), 1)
    if g > 1:
        assert b % g == 0, (b, g)
        nc = (b // g) * (l - 1)
        sums, counts = jax.vmap(
            _dcl_chunk, in_axes=(0, 0, 0, 0, None, None))(
            sf.reshape(g, nc, d), tf.reshape(g, nc, d),
            scored.reshape(g, nc), col_valid.reshape(g, nc),
            logit_scale, label_smoothing)
        return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)
    s, c = _dcl_chunk(sf, tf, scored, col_valid, logit_scale,
                      label_smoothing)
    return s / jnp.maximum(c, 1.0)


def cross_entropy_loss(logits, targets, label_smoothing: float = 0.0,
                       reduction: str = "sum"):
    """torch F.cross_entropy semantics incl. label_smoothing
    (ref classify_loss.py:61)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        # torch smooths uniformly over C classes (incl. the target)
        c = logits.shape[-1]
        smooth = -jnp.mean(lp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.sum(nll) if reduction == "sum" else jnp.mean(nll)


def bce_with_logits_loss(logits, targets, reduction: str = "sum"):
    """ref classify_loss.py:52 (multi-label)."""
    lf = logits.astype(jnp.float32)
    per = jnp.maximum(lf, 0) - lf * targets + jnp.log1p(jnp.exp(-jnp.abs(lf)))
    return jnp.sum(per) if reduction == "sum" else jnp.mean(per)


def soft_target_ce_loss(logits, soft_targets):
    """ref classify_loss.py:57-59 (mixup-style soft targets, sum reduced)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(soft_targets * lp)


def box_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise-diagonal generalized IoU for (x0, y0, x1, y1) boxes."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, :2], boxes2[:, :2])
    rb = jnp.minimum(boxes1[:, 2:], boxes2[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, 1e-6)
    lt_e = jnp.minimum(boxes1[:, :2], boxes2[:, :2])
    rb_e = jnp.maximum(boxes1[:, 2:], boxes2[:, 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    enclose = wh_e[:, 0] * wh_e[:, 1]
    return iou - (enclose - union) / jnp.maximum(enclose, 1e-6)


def refcoco_loss(pred_coords_sigmoid, targets, nsentences):
    """L1 (sum / nsentences) + mean (1 - GIoU) over valid predictions
    (ref refcoco_loss.py:35-47).  Invalid boxes (x1<=x0 etc.) are masked
    with a fixed-shape where."""
    l1 = jnp.sum(jnp.abs(pred_coords_sigmoid - targets)) / nsentences
    valid = jnp.all(pred_coords_sigmoid[:, :2] < pred_coords_sigmoid[:, 2:], axis=1)
    ious = box_giou(pred_coords_sigmoid, targets)
    vf = valid.astype(jnp.float32)
    loss_iou = jnp.sum((1 - ious) * vf) / jnp.maximum(jnp.sum(vf), 1.0)
    return l1 + loss_iou


def hinge_loss(logits, targets, margin: float = 1.0):
    """AQA multiple-choice hinge (ref hinge_loss.py:43-52): logits (B, C),
    sum of max(0, margin + logit - positive_logit)."""
    pos = jnp.take_along_axis(logits, targets[:, None], axis=1)
    loss = jnp.maximum(0.0, margin + logits - pos).sum()
    ncorrect = jnp.sum(jnp.argmax(logits, axis=1) == targets)
    return loss, ncorrect
