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

from typing import Dict, List, Optional

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
        from .gather import gather_ragged

        # multi-host: each process holds its shard of the eval set; gather
        # variable-length results in rank order (ref data_utils.py:50-86)
        image_ids = gather_ragged(np.concatenate(self.image_ids_list))
        image_logits = gather_ragged(np.concatenate(self.image_logits_list))
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
        from .gather import allsum

        ncorrect = float(allsum(self.ncorrect))
        total = int(allsum(self.total))
        return {"accuracy": 100.0 * ncorrect / max(total, 1),
                "count": total}


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
        from .gather import allsum

        ncorrect = float(allsum(self.ncorrect))
        total = int(allsum(self.total))
        return {"acc@0.5": 100.0 * ncorrect / max(total, 1),
                "count": total}


class MAP:
    def initialize(self):
        self.logits: List[np.ndarray] = []
        self.targets: List[np.ndarray] = []

    def compute(self, ids, logits, targets):
        self.logits.append(np.asarray(logits, np.float32))
        self.targets.append(np.asarray(targets, np.float32))

    def merge_results(self) -> Dict:
        from sklearn.metrics import average_precision_score

        from .gather import gather_ragged

        logits = gather_ragged(np.concatenate(self.logits))
        targets = gather_ragged(np.concatenate(self.targets))
        preds = 1.0 / (1.0 + np.exp(-logits))
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
        from .gather import allsum

        intersection = allsum(self.intersection)
        union = allsum(self.union)
        present = union > 0
        iou = np.zeros(self.num_classes, np.float64)
        iou[present] = intersection[present] / union[present]
        miou = float(iou[present].mean()) if present.any() else 0.0
        return {"miou": 100.0 * miou,
                "acc_classes": int(present.sum())}


class DetectionAP:
    """COCO-style average precision over IoU thresholds .5:.05:.95
    (the detection app's metric).  Single-machine accumulation of
    per-image detections and ground truths."""

    def __init__(self, num_classes: int,
                 iou_thresholds: Optional[List[float]] = None):
        self.num_classes = num_classes
        self.thresholds = iou_thresholds or [0.5 + 0.05 * i for i in range(10)]

    def initialize(self):
        self.dets: List[Dict] = []
        self.gts: List[Dict] = []

    def compute(self, det_boxes, det_scores, det_labels, gt_boxes, gt_labels):
        self.dets.append({"boxes": np.asarray(det_boxes, np.float64),
                          "scores": np.asarray(det_scores, np.float64),
                          "labels": np.asarray(det_labels)})
        self.gts.append({"boxes": np.asarray(gt_boxes, np.float64),
                         "labels": np.asarray(gt_labels)})

    @staticmethod
    def _iou_matrix(a, b):
        if len(a) == 0 or len(b) == 0:
            return np.zeros((len(a), len(b)))
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)

    def _ap_for(self, cls: int, thr: float) -> Optional[float]:
        scores, matches = [], []
        n_gt = 0
        for det, gt in zip(self.dets, self.gts):
            gmask = gt["labels"] == cls
            gboxes = gt["boxes"][gmask]
            n_gt += len(gboxes)
            dmask = det["labels"] == cls
            dboxes = det["boxes"][dmask]
            dscores = det["scores"][dmask]
            order = np.argsort(-dscores)
            dboxes, dscores = dboxes[order], dscores[order]
            iou = self._iou_matrix(dboxes, gboxes)
            taken = np.zeros(len(gboxes), bool)
            for i in range(len(dboxes)):
                scores.append(dscores[i])
                # COCO matching: best UNMATCHED GT above the threshold
                # (argmax over all GTs would count a detection FP when its
                # best GT is taken even though another GT qualifies)
                if len(gboxes):
                    cand = np.where(~taken, iou[i], -1.0)
                    j = int(cand.argmax())
                else:
                    j = -1
                if j >= 0 and cand[j] >= thr:
                    taken[j] = True
                    matches.append(1)
                else:
                    matches.append(0)
        if n_gt == 0:
            return None
        if not scores:
            return 0.0
        order = np.argsort(-np.asarray(scores))
        tp = np.asarray(matches)[order]
        cum_tp = np.cumsum(tp)
        precision = cum_tp / (np.arange(len(tp)) + 1)
        recall = cum_tp / n_gt
        # 101-point interpolation (COCO)
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            p = precision[recall >= r]
            ap += float(p.max()) if len(p) else 0.0
        return ap / 101

    def merge_results(self) -> Dict:
        aps_all, aps_50 = [], []
        for c in range(self.num_classes):
            raw = [self._ap_for(c, t) for t in self.thresholds]
            per_thr = [a for a in raw if a is not None]
            if per_thr:
                aps_all.append(float(np.mean(per_thr)))
            # thresholds[0] is 0.5 in the COCO sweep — reuse it
            a50 = (raw[0] if self.thresholds[0] == 0.5
                   else self._ap_for(c, 0.5))
            if a50 is not None:
                aps_50.append(a50)
        return {
            "ap": 100.0 * float(np.mean(aps_all)) if aps_all else 0.0,
            "ap50": 100.0 * float(np.mean(aps_50)) if aps_50 else 0.0,
            "classes_with_gt": len(aps_all),
        }
