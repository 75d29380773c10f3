"""COCO-protocol detection eval: segm AP, crowd-ignore, area buckets,
AR@maxDets, and detectron2-parity mask pasting.

Hand-computed fixtures pin the pycocotools semantics the reference's
COCOEvaluator applies (ref one_peace_vision/det/lazyconfig_train_net.py
:36-40); the paste path is cross-checked against torch grid_sample with
detectron2's exact grid construction (_do_paste_mask)."""

import numpy as np
import pytest

from one_peace_tpu.metrics import DetectionAP
from one_peace_tpu.vision.mask_paste import paste_masks


def _box(x0, y0, x1, y1):
    return np.asarray([[x0, y0, x1, y1]], np.float64)


def test_ap_hand_computed_10_thresholds():
    """1 class, 2 GTs, 3 dets: det1 IoU 1.0, det2 IoU 0.625, det3 FP.
    Thresholds .5/.55/.6 -> AP 1.0; .65-.95 -> AP 51/101 (recall stalls
    at 0.5); 101-point means hand-verified."""
    m = DetectionAP(num_classes=1)
    m.initialize()
    dets = np.concatenate([_box(0, 0, 10, 10), _box(20, 20, 30, 26.25),
                           _box(50, 50, 60, 60)])
    gts = np.concatenate([_box(0, 0, 10, 10), _box(20, 20, 30, 30)])
    m.compute(dets, np.asarray([0.9, 0.8, 0.7]), np.zeros(3, np.int64),
              gts, np.zeros(2, np.int64))
    out = m.merge_results()
    ap_lo, ap_hi = 1.0, 51.0 / 101.0
    assert out["ap50"] == pytest.approx(100.0 * ap_lo)
    assert out["ap75"] == pytest.approx(100.0 * ap_hi)
    assert out["ap"] == pytest.approx(100.0 * (3 * ap_lo + 7 * ap_hi) / 10)
    # AR@100: recall 1.0 at the 3 low thresholds, 0.5 at the 7 high ones
    assert out["ar100"] == pytest.approx(100.0 * (3 * 1.0 + 7 * 0.5) / 10)


def test_crowd_regions_are_ignore_not_fp():
    """A det matched only by a crowd GT is neither TP nor FP; crowd GTs
    don't count toward recall; a crowd region absorbs MULTIPLE dets
    (pycocotools iscrowd matching)."""
    m = DetectionAP(num_classes=1, iou_thresholds=[0.5])
    m.initialize()
    dets = np.concatenate([
        _box(22, 22, 30, 30),   # inside the crowd region (ignored)
        _box(31, 31, 39, 39),   # also inside the crowd region (ignored)
        _box(0, 0, 10, 10),     # true positive
    ])
    gts = np.concatenate([_box(0, 0, 10, 10), _box(20, 20, 40, 40)])
    m.compute(dets, np.asarray([0.9, 0.85, 0.8]), np.zeros(3, np.int64),
              gts, np.zeros(2, np.int64),
              gt_crowd=np.asarray([False, True]))
    out = m.merge_results()
    assert out["ap"] == pytest.approx(100.0)  # the 2 crowd hits vanish

    # without the crowd flag the same geometry is ap != 100 (the two
    # high-scoring dets become FPs ahead of the TP)
    m2 = DetectionAP(num_classes=1, iou_thresholds=[0.5])
    m2.initialize()
    m2.compute(dets, np.asarray([0.9, 0.85, 0.8]), np.zeros(3, np.int64),
               gts, np.zeros(2, np.int64))
    assert m2.merge_results()["ap"] < 100.0


def test_crowd_iou_uses_det_area():
    """IoU vs a crowd GT divides by the DET area: a small det fully inside
    a big crowd matches at IoU 1.0 (classic IoU would be ~0.04)."""
    m = DetectionAP(num_classes=1, iou_thresholds=[0.9])
    m.initialize()
    m.compute(_box(22, 22, 26, 26), np.asarray([0.9]), np.zeros(1, np.int64),
              np.concatenate([_box(0, 0, 10, 10), _box(20, 20, 40, 40)]),
              np.zeros(2, np.int64), gt_crowd=np.asarray([False, True]))
    out = m.merge_results()
    # the lone det is absorbed by the crowd (ignored); the real GT is
    # missed -> recall 0 -> AP 0, with NO false positive recorded
    assert out["ap"] == 0.0
    assert out["ar100"] == 0.0


def test_area_buckets_and_scale():
    """AP_s/m/l bucket GTs by ORIGINAL-px^2 area; area_scale converts
    resized-coordinate areas back (1/f^2)."""
    # gt1 16x16=256 (small), gt2 40x40=1600 (medium); both detected
    # perfectly, plus one large-only miss 100x100=10000 (large)
    m = DetectionAP(num_classes=1, iou_thresholds=[0.5])
    m.initialize()
    gts = np.concatenate([_box(0, 0, 16, 16), _box(30, 30, 70, 70),
                          _box(100, 100, 200, 200)])
    dets = gts[:2]
    m.compute(dets, np.asarray([0.9, 0.8]), np.zeros(2, np.int64),
              gts, np.zeros(3, np.int64))
    out = m.merge_results()
    assert out["ap_s"] == pytest.approx(100.0)
    assert out["ap_m"] == pytest.approx(100.0)
    assert out["ap_l"] == pytest.approx(0.0)
    assert out["ap"] == pytest.approx(100.0 * 2 / 3, abs=1.0)

    # same geometry in 2x-downscaled coordinates with area_scale=4
    # reproduces the buckets exactly
    m2 = DetectionAP(num_classes=1, iou_thresholds=[0.5])
    m2.initialize()
    m2.compute(dets / 2, np.asarray([0.9, 0.8]), np.zeros(2, np.int64),
               gts / 2, np.zeros(3, np.int64), area_scale=4.0)
    out2 = m2.merge_results()
    for k in ("ap", "ap_s", "ap_m", "ap_l"):
        assert out2[k] == pytest.approx(out[k])


def test_segm_ap_hand_computed():
    """Mask IoU scoring: a det whose BOX matches but whose MASK misses
    scores as box-TP / segm-FP — the box/segm AP split the reference's
    60.4/52.9 headline is made of."""
    h = w = 32
    gt_mask = np.zeros((1, h, w), bool)
    gt_mask[0, 4:12, 4:12] = True          # the GT object
    det_good = np.zeros((h, w), bool)
    det_good[4:12, 4:12] = True            # perfect mask
    det_bad = np.zeros((h, w), bool)
    det_bad[4:12, 20:28] = True            # right box size, wrong place

    m = DetectionAP(num_classes=1, iou_thresholds=[0.5])
    m.initialize()
    m.compute(_box(4, 4, 12, 12), np.asarray([0.9]), np.zeros(1, np.int64),
              _box(4, 4, 12, 12), np.zeros(1, np.int64),
              det_masks=det_good[None], gt_masks=gt_mask)
    out = m.merge_results()
    assert out["ap"] == pytest.approx(100.0)
    assert out["ap_mask"] == pytest.approx(100.0)

    m = DetectionAP(num_classes=1, iou_thresholds=[0.5])
    m.initialize()
    # box overlaps the GT box at IoU 0.5+ but the mask is disjoint
    m.compute(_box(4, 4, 12, 12), np.asarray([0.9]), np.zeros(1, np.int64),
              _box(4, 4, 12, 12), np.zeros(1, np.int64),
              det_masks=det_bad[None], gt_masks=gt_mask)
    out = m.merge_results()
    assert out["ap"] == pytest.approx(100.0)
    assert out["ap_mask"] == pytest.approx(0.0)


def test_segm_counts_images_without_detections():
    """An image with GT masks but zero detections must still drag segm
    recall down (regression: skipping the record inflated AP)."""
    h = w = 16
    gt_mask = np.zeros((1, h, w), bool)
    gt_mask[0, 2:8, 2:8] = True
    m = DetectionAP(num_classes=1, iou_thresholds=[0.5])
    m.initialize()
    # image 1: perfect
    m.compute(_box(2, 2, 8, 8), np.asarray([0.9]), np.zeros(1, np.int64),
              _box(2, 2, 8, 8), np.zeros(1, np.int64),
              det_masks=gt_mask, gt_masks=gt_mask)
    # image 2: same GT, no detections at all
    m.compute(np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64),
              _box(2, 2, 8, 8), np.zeros(1, np.int64),
              det_masks=np.zeros((0, h, w), bool), gt_masks=gt_mask)
    out = m.merge_results()
    # recall tops out at 1/2 -> interpolated AP 51/101 for box and segm
    assert out["ap"] == pytest.approx(100.0 * 51 / 101)
    assert out["ap_mask"] == pytest.approx(100.0 * 51 / 101)


def test_paste_masks_matches_torch_grid_sample():
    """paste_masks == detectron2 _do_paste_mask (grid_sample,
    align_corners=False, zero padding) at stride 1 and stride 4."""
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    masks = rs.rand(5, 28, 28).astype(np.float32)
    boxes = np.stack([
        np.array([3.2, 4.1, 40.7, 51.3]),
        np.array([0.0, 0.0, 64.0, 64.0]),
        np.array([-5.0, -3.0, 20.0, 25.0]),   # clips at the border
        np.array([50.0, 50.0, 63.5, 60.2]),
        np.array([10.0, 10.0, 11.0, 11.0]),   # tiny box
    ])

    def ref(mask, box, oh, ow, stride):
        mt = torch.tensor(mask)[None, None]
        ys = (torch.arange(oh, dtype=torch.float64) + 0.5) * stride
        xs = (torch.arange(ow, dtype=torch.float64) + 0.5) * stride
        x0, y0, x1, y1 = box
        gy = (ys - y0) / max(y1 - y0, 1e-6) * 2 - 1
        gx = (xs - x0) / max(x1 - x0, 1e-6) * 2 - 1
        grid = torch.stack(torch.meshgrid(gy, gx, indexing="ij"), -1)
        grid = grid[..., [1, 0]][None].float()
        out = F.grid_sample(mt, grid, align_corners=False,
                            padding_mode="zeros")
        return (out[0, 0] >= 0.5).numpy()

    for stride in (1, 4):
        oh = ow = 64 // stride
        got = paste_masks(masks, boxes, oh, ow, stride=stride)
        for i in range(len(boxes)):
            want = ref(masks[i], boxes[i], oh, ow, stride)
            np.testing.assert_array_equal(got[i], want,
                                          err_msg=f"det {i} stride {stride}")


def test_coco_task_valid_step_reports_mask_ap(tmp_path):
    """The det task's eval loop wires masks/crowd/areas end-to-end: an
    oracle detector scores 100 box AND mask AP on a synthetic corpus,
    and the stats carry the full diagnostic set."""
    import json

    from PIL import Image

    from one_peace_tpu.core.config import load_config
    from one_peace_tpu.tasks import build_task

    rs = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 0
    for i in range(2):
        Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).save(
            img_dir / f"im{i}.png")
        images.append({"id": i, "file_name": f"im{i}.png",
                       "height": 64, "width": 64})
        for j in range(2):
            x, y = 8 + 24 * j, 8 + 16 * i
            poly = [x, y, x + 12, y, x + 12, y + 12, x, y + 12]
            annotations.append({
                "id": aid, "image_id": i, "category_id": j + 1,
                "bbox": [x, y, 12, 12], "area": 144.0,
                "segmentation": [poly], "iscrowd": 0})
            aid += 1
    ann = tmp_path / "val.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1}, {"id": 2}]}))

    cfg = load_config(None, [
        "task._name=coco_detection", f"task.data={ann}",
        f"task.valid_data={ann}", f"task.image_dir={img_dir}",
        "task.image_size=64", "task.num_classes=2", "task.max_boxes=8",
        "task.mask_stride=4",
    ])
    task = build_task(cfg.task, cfg)
    ds = task.load_dataset("valid")
    itr = task.get_batch_iterator("valid", 2, ensure_equal_batch=False)
    batch = next(iter(itr.next_epoch_itr()))
    assert batch["gt_crowd"].shape == batch["gt_valid"].shape
    assert (batch["gt_areas"][batch["gt_valid"]] == 144.0).all()

    class Oracle:
        """Returns the GT as detections with stride-4 mask probs."""

        def detect(self, params, imgs, max_proposals=512):
            out = []
            for b in range(imgs.shape[0]):
                v = batch["gt_valid"][b]
                boxes = np.asarray(batch["gt_boxes"][b][v], np.float64)
                n = len(boxes)
                masks = np.ones((n, 28, 28), np.float32)  # box-filling
                out.append({"boxes": boxes,
                            "scores": np.linspace(0.9, 0.5, n),
                            "labels": np.asarray(batch["gt_labels"][b][v]),
                            "masks": masks})
            return out

    task.begin_valid_epoch(None, None)
    task.valid_step(Oracle(), None, batch)
    stats = task.merge_results()
    for k in ("ap", "ap50", "ap75", "ap_s", "ap_m", "ap_l", "ar100",
              "ap_mask", "ap_mask50", "ar100_mask"):
        assert k in stats, (k, sorted(stats))
    assert stats["ap"] == pytest.approx(100.0)
    assert stats["ap50"] == pytest.approx(100.0)
    # a box-filling mask vs the square GT mask overlaps well enough at
    # IoU 0.5 to score; exact-shape masks would be needed beyond that
    assert stats["ap_mask50"] == pytest.approx(100.0)


def test_rpn_subsample_weights_match_detectron2_budget():
    """_sample_weights picks exactly min(pos, 128) positives and fills to
    256 with negatives (detectron2 subsample_labels semantics as static
    weight vectors)."""
    import jax
    import jax.numpy as jnp

    from one_peace_tpu.vision.rpn import _sample_weights

    rng = jax.random.PRNGKey(0)
    n = 4000
    rs = np.random.RandomState(0)
    pos = jnp.asarray(rs.rand(n) < 0.01)           # ~40 positives
    neg = jnp.asarray(~np.asarray(pos) & (rs.rand(n) < 0.8))
    wp, wn = _sample_weights(pos, neg, rng)
    assert int(wp.sum()) == int(pos.sum())          # all 40 kept (<128)
    assert int(wn.sum()) == 256 - int(pos.sum())    # filled to 256
    assert bool((np.asarray(wp) <= np.asarray(pos)).all())
    assert bool((np.asarray(wn) <= np.asarray(neg)).all())

    pos2 = jnp.asarray(rs.rand(n) < 0.2)            # ~800 positives
    wp2, wn2 = _sample_weights(pos2, jnp.asarray(~np.asarray(pos2)), rng)
    assert int(wp2.sum()) == 128                    # capped at half
    assert int(wn2.sum()) == 128


def test_rpn_loss_sampler_arms_both_train():
    """rpn_loss(sampler='subsample') is finite, jittable, and both arms
    produce gradients of the same sign structure on a toy head."""
    import jax
    import jax.numpy as jnp

    from one_peace_tpu.vision.rpn import RPNHead, rpn_loss

    head = RPNHead(in_channels=8, channels=8, num_convs=1, strides=(8, 16))
    params = head.init(jax.random.PRNGKey(0))
    feats = [jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8),
                         jnp.float32),
             jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 8),
                         jnp.float32)]
    gtb = jnp.asarray([[[8, 8, 24, 24], [0, 0, 0, 0]],
                       [[16, 16, 48, 48], [32, 0, 56, 16]]], jnp.float32)
    gtv = jnp.asarray([[True, False], [True, True]])
    gtl = jnp.zeros((2, 2), jnp.int32)
    for sampler in ("balanced", "subsample"):
        fn = jax.jit(lambda p, rng: rpn_loss(
            head, p, feats, gtb, gtl, gtv, sampler=sampler, rng=rng)[0])
        loss = fn(params, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), sampler
        g = jax.grad(lambda p: fn(p, jax.random.PRNGKey(1)))(params)
        gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert gn > 0, sampler


def test_seg_loss_at_full_matches_manual_upsample():
    """criterion.seg_loss_at=full computes CE over bilinearly upsampled
    logits (mmseg-exact); 'stride' subsamples labels.  Both finite, and
    'full' reproduces a manual jax.image.resize reference."""
    import jax
    import jax.numpy as jnp

    from one_peace_tpu.core.config import CriterionConfig
    from one_peace_tpu.criterions.vision_criterions import (
        SegmentationCriterion)

    rs = np.random.RandomState(0)
    logits_s4 = rs.randn(2, 4, 4, 3).astype(np.float32)
    target = rs.randint(0, 3, (2, 16, 16)).astype(np.int32)
    target[0, :2] = 255  # ignore band

    class Oracle:
        def logits(self, params, x):
            return jnp.asarray(logits_s4)

    batch = {"src_images": np.zeros((2, 3, 16, 16), np.float32),
             "target": target}
    crit_s = SegmentationCriterion(CriterionConfig(seg_loss_at="stride"))
    loss_s, m_s = crit_s(Oracle(), None, batch)
    crit_f = SegmentationCriterion(CriterionConfig(seg_loss_at="full"))
    loss_f, m_f = crit_f(Oracle(), None, batch)
    assert np.isfinite(float(loss_s)) and np.isfinite(float(loss_f))
    assert float(loss_s) != float(loss_f)

    up = jax.image.resize(jnp.asarray(logits_s4), (2, 16, 16, 3),
                          method="bilinear")
    logp = jax.nn.log_softmax(up, axis=-1)
    valid = target != 255
    nll = -np.take_along_axis(np.asarray(logp),
                              np.where(valid, target, 0)[..., None],
                              axis=-1)[..., 0]
    want = (nll * valid).sum() / valid.sum()
    assert float(loss_f) == pytest.approx(float(want), rel=1e-5)
