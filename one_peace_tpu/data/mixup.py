"""Batch-level Mixup / CutMix with soft targets.

Capability equivalent of timm's Mixup used by the reference ImageNet
pipeline (ref vision_data/image_classify_dataset.py:46-52: mixup_alpha,
cutmix_alpha, prob, switch_prob, label_smoothing, num_classes; batch
mode).  Independent numpy implementation applied after collation; emits
(B, num_classes) soft targets, which the classify criterion's soft-target
branch consumes (criterions.py ClassifyCriterion)."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def one_hot(targets: np.ndarray, num_classes: int, on: float, off: float) -> np.ndarray:
    out = np.full((len(targets), num_classes), off, np.float32)
    out[np.arange(len(targets)), targets] = on
    return out


def rand_bbox(rng, h: int, w: int, lam: float) -> Tuple[int, int, int, int]:
    """CutMix box with area ratio (1 - lam)."""
    cut_ratio = np.sqrt(1.0 - lam)
    ch, cw = int(h * cut_ratio), int(w * cut_ratio)
    cy, cx = rng.randint(h), rng.randint(w)
    y0, y1 = np.clip(cy - ch // 2, 0, h), np.clip(cy + ch // 2, 0, h)
    x0, x1 = np.clip(cx - cw // 2, 0, w), np.clip(cx + cw // 2, 0, w)
    return y0, y1, x0, x1


class Mixup:
    def __init__(self, mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                 prob: float = 1.0, switch_prob: float = 0.5,
                 label_smoothing: float = 0.1, num_classes: int = 1000,
                 seed: int = 0):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.prob = prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes
        self.rng = np.random.RandomState(seed)

    def __call__(self, images: np.ndarray, targets: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """images (B, C, H, W); targets (B,) int -> (mixed images,
        (B, num_classes) soft targets)."""
        ls = self.label_smoothing
        off = ls / self.num_classes
        on = 1.0 - ls + off
        soft = one_hot(targets, self.num_classes, on, off)
        if self.rng.rand() >= self.prob:
            return images, soft

        use_cutmix = (self.cutmix_alpha > 0
                      and self.rng.rand() < self.switch_prob) or self.mixup_alpha <= 0
        alpha = self.cutmix_alpha if use_cutmix else self.mixup_alpha
        lam = float(self.rng.beta(alpha, alpha))
        perm = self.rng.permutation(len(images))
        images = images.copy()
        if use_cutmix:
            h, w = images.shape[2], images.shape[3]
            y0, y1, x0, x1 = rand_bbox(self.rng, h, w, lam)
            images[:, :, y0:y1, x0:x1] = images[perm][:, :, y0:y1, x0:x1]
            lam = 1.0 - ((y1 - y0) * (x1 - x0) / (h * w))
        else:
            images = lam * images + (1.0 - lam) * images[perm]
        soft = lam * soft + (1.0 - lam) * soft[perm]
        return images.astype(np.float32), soft
