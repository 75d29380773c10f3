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


def fetch_once(tree):
    """One batched host fetch for everything a reducer accumulated.

    Reducers store per-batch results WITHOUT converting (device arrays
    stay device arrays), so the eval loop's dispatch never blocks on a
    host round-trip; this single ``jax.device_get`` at merge time is the
    only fetch of the eval pass (on axon each fetch is a ~150 ms tunnel
    RTT — per-batch conversion made eval wall clock measurement-bound)."""
    import jax

    fetch_once.calls += 1
    return jax.device_get(tree)


fetch_once.calls = 0


class Recall:
    def initialize(self, text_ids, text_logits):
        # accepts arrays OR lists of (possibly device) chunks; conversion
        # is deferred to merge_results (fetch_once)
        self.text_ids = text_ids
        self.text_logits = (list(text_logits)
                            if isinstance(text_logits, list) else [text_logits])
        self.image_ids_list: List = []
        self.image_logits_list: List = []

    def compute(self, image_ids, image_logits):
        self.image_ids_list.append(image_ids)
        self.image_logits_list.append(image_logits)

    def merge_results(self, output_predict: bool = False) -> Dict:
        from .gather import gather_ragged

        got = fetch_once({
            "ti": self.text_ids, "tl": self.text_logits,
            "ii": self.image_ids_list, "il": self.image_logits_list})
        self.text_ids = np.asarray(got["ti"])
        self.text_logits = np.concatenate(
            [np.asarray(x, np.float32) for x in got["tl"]])
        # multi-host: each process holds its shard of the eval set; gather
        # variable-length results in rank order (ref data_utils.py:50-86)
        image_ids = gather_ragged(np.concatenate(
            [np.asarray(x) for x in got["ii"]]))
        image_logits = gather_ragged(np.concatenate(
            [np.asarray(x, np.float32) for x in got["il"]]))
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
        self.ncorrect_list: List = []
        self.total = 0

    def compute(self, logits=None, targets=None, ncorrect=None, count=None):
        if ncorrect is not None:
            # ncorrect may be a device scalar; fetched once at merge
            self.ncorrect_list.append(ncorrect)
            self.total += int(count)
        else:
            # argmax/compare stay on the producing backend (device for jax
            # arrays); only the per-batch scalar is accumulated
            self.ncorrect_list.append((logits.argmax(-1) == targets).sum())
            self.total += len(targets)

    def merge_results(self) -> Dict:
        from .gather import allsum

        ncorrect = float(sum(float(x) for x in fetch_once(self.ncorrect_list)))
        ncorrect = float(allsum(ncorrect))
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
        self.logits: List = []
        self.targets: List = []

    def compute(self, ids, logits, targets):
        self.logits.append(logits)
        self.targets.append(targets)

    def merge_results(self) -> Dict:
        from sklearn.metrics import average_precision_score

        from .gather import gather_ragged

        got = fetch_once({"l": self.logits, "t": self.targets})
        logits = gather_ragged(np.concatenate(
            [np.asarray(x, np.float32) for x in got["l"]]))
        targets = gather_ragged(np.concatenate(
            [np.asarray(x, np.float32) for x in got["t"]]))
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
        n = self.num_classes
        # one confusion-matrix bincount instead of a per-class sweep
        # (896 px eval maps make the per-class loop the eval bottleneck)
        pred = np.clip(pred, 0, n - 1)
        cm = np.bincount(target.astype(np.int64) * n + pred,
                         minlength=n * n).reshape(n, n)
        inter = np.diag(cm)
        self.intersection += inter
        self.union += cm.sum(0) + cm.sum(1) - inter

    def update_confusion(self, cm: np.ndarray):
        """Fold a (C, C) confusion matrix (rows = target, cols = pred) into
        the accumulators — the device-side eval path computes the per-batch
        confusion on the accelerator and feeds the summed matrix here."""
        cm = np.asarray(cm, np.int64)
        inter = np.diag(cm)
        self.intersection += inter
        self.union += cm.sum(0) + cm.sum(1) - inter

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
    (the detection app's metric).  Per-image detections and ground truths
    accumulate locally; ``merge_results`` gathers the ragged per-image
    lists across processes (packed values + per-image counts through
    ``gather_ragged``, the ref padded all_gather pattern of
    utils/data_utils.py:50-86) so sharded eval reproduces single-host AP."""

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

    def _sync_across_processes(self):
        """Rebuild self.dets/self.gts as the process-ordered union of every
        process's per-image lists.  Ragged lists are exchanged as packed
        value arrays + per-image counts (each gathered with gather_ragged,
        which handles the variable leading dim)."""
        import jax

        if jax.process_count() == 1:
            return
        from . import gather as g

        packed = _pack_ragged_images(self.dets, self.gts)
        gathered = {k: g.gather_ragged(v) for k, v in packed.items()}
        self.dets, self.gts = _unpack_ragged_images(gathered)

    def merge_results(self) -> Dict:
        self._sync_across_processes()
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


def _pack_ragged_images(dets: List[Dict], gts: List[Dict]) -> Dict[str, np.ndarray]:
    """Per-image ragged det/gt lists -> fixed-rank packed arrays + counts
    (the exchange format for cross-process gather)."""
    def cat(arrs, width=None):
        arrs = [np.asarray(a) for a in arrs]
        if width is not None:
            arrs = [a.reshape(-1, width) for a in arrs]
        empty = (np.zeros((0, width), np.float64) if width is not None
                 else np.zeros((0,), np.float64))
        return np.concatenate(arrs, axis=0) if arrs else empty

    return {
        "det_counts": np.asarray([len(d["scores"]) for d in dets], np.int64),
        "det_boxes": cat([d["boxes"] for d in dets], 4).astype(np.float64),
        "det_scores": cat([d["scores"] for d in dets]).astype(np.float64),
        "det_labels": cat([d["labels"] for d in dets]).astype(np.int64),
        "gt_counts": np.asarray([len(g["labels"]) for g in gts], np.int64),
        "gt_boxes": cat([g["boxes"] for g in gts], 4).astype(np.float64),
        "gt_labels": cat([g["labels"] for g in gts]).astype(np.int64),
    }


def _unpack_ragged_images(p: Dict[str, np.ndarray]):
    """Inverse of _pack_ragged_images (works on the gathered concatenation
    because counts arrive in the same process order as the values)."""
    dets, gts = [], []
    off = 0
    for n in p["det_counts"]:
        n = int(n)
        dets.append({"boxes": p["det_boxes"][off:off + n],
                     "scores": p["det_scores"][off:off + n],
                     "labels": p["det_labels"][off:off + n]})
        off += n
    off = 0
    for n in p["gt_counts"]:
        n = int(n)
        gts.append({"boxes": p["gt_boxes"][off:off + n],
                    "labels": p["gt_labels"][off:off + n]})
        off += n
    return dets, gts
