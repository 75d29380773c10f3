"""Evaluation metric reducers (numpy, host-side accumulation).

Behavioral specs:
- ``Recall``  R@1/5/10 from the full similarity matrix with duplicate-id
  matching (ref metrics/recall.py:8-80) — text side embedded once, image/
  audio side accumulated per batch.  Under pjit the cross-rank all_gather
  (ref :22-35) is unnecessary: the host already holds global results.
- ``Accuracy`` (ref metrics/accuracy.py), ``IouAcc`` Acc@0.5 for
  grounding (ref metrics/iou_acc.py), ``MAP`` sigmoid + sklearn average
  precision (ref metrics/map.py:11-35).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


class Recall:
    def initialize(self, text_ids, text_logits):
        self.text_ids = np.asarray(text_ids)
        self.text_logits = np.asarray(text_logits, np.float32)
        self.image_ids_list: List[np.ndarray] = []
        self.image_logits_list: List[np.ndarray] = []

    def compute(self, image_ids, image_logits):
        self.image_ids_list.append(np.asarray(image_ids))
        self.image_logits_list.append(np.asarray(image_logits, np.float32))

    def merge_results(self, output_predict: bool = False) -> Dict:
        image_ids = np.concatenate(self.image_ids_list)
        image_logits = np.concatenate(self.image_logits_list)
        sim_i2t = image_logits @ self.text_logits.T
        return self.retrieval_eval(image_ids, sim_i2t, output_predict)

    def retrieval_eval(self, image_ids, scores_i2t, output_predict=False) -> Dict:
        text_ids = self.text_ids
        k = min(10, scores_i2t.shape[1])
        rank_txt = np.argsort(-scores_i2t, axis=1)[:, :k]
        predict_txt = text_ids[rank_txt]
        i2t = [
            float(np.any(predict_txt[:, :r] == image_ids[:, None], axis=1).sum())
            for r in (1, 5, 10)
        ]
        n_img = scores_i2t.shape[0]
        tr = [100.0 * c / n_img for c in i2t]

        scores_t2i = scores_i2t.T
        k2 = min(10, scores_t2i.shape[1])
        rank_img = np.argsort(-scores_t2i, axis=1)[:, :k2]
        predict_img = image_ids[rank_img]
        t2i = [
            float(np.any(predict_img[:, :r] == text_ids[:, None], axis=1).sum())
            for r in (1, 5, 10)
        ]
        n_txt = scores_t2i.shape[0]
        ir = [100.0 * c / n_txt for c in t2i]

        log = {
            "txt_r1": tr[0], "txt_r5": tr[1], "txt_r10": tr[2],
            "txt_r_mean": sum(tr) / 3, "img_count": n_img,
            "img_r1": ir[0], "img_r5": ir[1], "img_r10": ir[2],
            "img_r_mean": sum(ir) / 3, "txt_count": n_txt,
            "r_mean": (sum(tr) + sum(ir)) / 6,
        }
        if output_predict:
            log["predict_txt"] = dict(zip(image_ids.tolist(), predict_txt.tolist()))
            log["predict_img"] = dict(zip(text_ids.tolist(), predict_img.tolist()))
        return log


class Accuracy:
    def initialize(self):
        self.ncorrect = 0.0
        self.total = 0

    def compute(self, logits=None, targets=None, ncorrect=None, count=None):
        if ncorrect is not None:
            self.ncorrect += float(ncorrect)
            self.total += int(count)
        else:
            logits = np.asarray(logits)
            targets = np.asarray(targets)
            self.ncorrect += float((logits.argmax(-1) == targets).sum())
            self.total += len(targets)

    def merge_results(self) -> Dict:
        return {"accuracy": 100.0 * self.ncorrect / max(self.total, 1),
                "count": self.total}


class IouAcc:
    """Grounding Acc@0.5: predicted boxes rescaled back to original image
    coordinates by the resize ratios (ref tasks/vl_tasks/refcoco.py:24-48)."""

    def initialize(self):
        self.ncorrect = 0.0
        self.total = 0

    @staticmethod
    def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = np.maximum(a[:, :2], b[:, :2])
        rb = np.minimum(a[:, 2:], b[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        return inter / np.maximum(area_a + area_b - inter, 1e-6)

    def compute(self, pred_boxes, target_boxes, threshold: float = 0.5):
        ious = self.box_iou(np.asarray(pred_boxes), np.asarray(target_boxes))
        self.ncorrect += float((ious >= threshold).sum())
        self.total += len(ious)

    def merge_results(self) -> Dict:
        return {"acc@0.5": 100.0 * self.ncorrect / max(self.total, 1),
                "count": self.total}


class MAP:
    def initialize(self):
        self.logits: List[np.ndarray] = []
        self.targets: List[np.ndarray] = []

    def compute(self, ids, logits, targets):
        self.logits.append(np.asarray(logits, np.float32))
        self.targets.append(np.asarray(targets, np.float32))

    def merge_results(self) -> Dict:
        from sklearn.metrics import average_precision_score

        preds = 1.0 / (1.0 + np.exp(-np.concatenate(self.logits)))
        targets = np.concatenate(self.targets)
        ap = average_precision_score(targets, preds, average=None)
        return {"map": 100.0 * float(np.mean(ap)), "count": len(targets)}


class MIoU:
    """Semantic-segmentation mean IoU over a fixed class count (the ADE20K
    metric of the reference's seg app; ignore_index pixels excluded)."""

    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    def initialize(self):
        n = self.num_classes
        self.intersection = np.zeros(n, np.int64)
        self.union = np.zeros(n, np.int64)

    def compute(self, pred: np.ndarray, target: np.ndarray):
        """pred/target: integer label maps of identical shape."""
        pred = np.asarray(pred).ravel()
        target = np.asarray(target).ravel()
        valid = target != self.ignore_index
        pred, target = pred[valid], target[valid]
        for c in range(self.num_classes):
            p = pred == c
            t = target == c
            self.intersection[c] += np.logical_and(p, t).sum()
            self.union[c] += np.logical_or(p, t).sum()

    def merge_results(self) -> Dict:
        present = self.union > 0
        iou = np.zeros(self.num_classes, np.float64)
        iou[present] = self.intersection[present] / self.union[present]
        miou = float(iou[present].mean()) if present.any() else 0.0
        return {"miou": 100.0 * miou,
                "acc_classes": int(present.sum())}
