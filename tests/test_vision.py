"""Vision transfer components: backbone pyramid + video classifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_encoder_config


def test_backbone_pyramid():
    from one_peace_tpu.vision.backbone import VisionBackbone

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4  # 64px inputs -> 4x4 patch grid
    cfg.image_adapter.rel_bucket_size = 4
    bb = VisionBackbone(cfg)
    params = bb.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 3, 64, 64), jnp.float32)
    f16 = bb(params, imgs)
    assert f16.shape == (2, 4, 4, cfg.embed_dim)
    pyr = bb.pyramid(params, imgs)
    assert pyr["p4"].shape == (2, 16, 16, cfg.embed_dim)
    assert pyr["p8"].shape == (2, 8, 8, cfg.embed_dim)
    assert pyr["p32"].shape == (2, 2, 2, cfg.embed_dim)
    for v in pyr.values():
        assert np.isfinite(np.asarray(v)).all()


def test_video_classifier():
    from one_peace_tpu.vision.backbone import VideoClassifier

    cfg = tiny_encoder_config()
    model = VideoClassifier(cfg, num_classes=7)
    params = model.init(jax.random.PRNGKey(0))
    frames = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3, 32, 32), jnp.float32)
    logits = model(params, frames)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_fcos_detection_head():
    from one_peace_tpu.vision.detection import FCOSHead, batched_nms

    head = FCOSHead(in_channels=32, num_classes=5, channels=16, num_convs=2,
                    strides=(8, 16))
    params = head.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    feats = [jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32),
             jnp.asarray(rs.randn(2, 4, 4, 32), jnp.float32)]
    outs = head(params, feats)
    assert outs[0][0].shape == (2, 8, 8, 5)   # cls
    assert outs[0][1].shape == (2, 8, 8, 4)   # box (positive distances)
    assert np.all(np.asarray(outs[0][1]) > 0)
    dets = head.decode(outs, score_thresh=0.0, max_dets=10)
    assert len(dets) == 2
    assert dets[0]["boxes"].shape[1] == 4
    assert len(dets[0]["scores"]) <= 10

    # NMS suppresses overlapping same-class boxes, keeps other classes
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([0, 0, 1])
    keep = batched_nms(boxes, scores, labels)
    assert set(keep.tolist()) == {0, 2}


def test_detection_ap_metric():
    from one_peace_tpu.metrics import DetectionAP

    m = DetectionAP(num_classes=2)
    m.initialize()
    # perfect detection for class 0; a miss for class 1
    m.compute(det_boxes=np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
              det_scores=np.array([0.9, 0.8], np.float32),
              det_labels=np.array([0, 1]),
              gt_boxes=np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32),
              gt_labels=np.array([0, 1]))
    out = m.merge_results()
    assert out["ap50"] == pytest.approx(50.0, abs=1.0)  # class0 perfect, class1 zero
    assert 0.0 <= out["ap"] <= out["ap50"] + 1e-6


def test_detection_end_to_end_ap():
    """Backbone pyramid -> FCOS head -> decode -> AP: the full det flow."""
    from helpers import tiny_encoder_config
    from one_peace_tpu.metrics import DetectionAP
    from one_peace_tpu.vision.backbone import VisionBackbone
    from one_peace_tpu.vision.detection import FCOSHead

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    bb = VisionBackbone(cfg)
    bparams = bb.init(jax.random.PRNGKey(0))
    head = FCOSHead(in_channels=cfg.embed_dim, num_classes=3, channels=16,
                    num_convs=2, strides=(8, 16))
    hparams = head.init(jax.random.PRNGKey(1))

    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64), jnp.float32)
    pyr = bb.pyramid(bparams, imgs)
    outs = head(hparams, [pyr["p8"], pyr["p16"]])
    dets = head.decode(outs, score_thresh=0.0, max_dets=20)
    metric = DetectionAP(num_classes=3)
    metric.initialize()
    metric.compute(dets[0]["boxes"], dets[0]["scores"], dets[0]["labels"],
                   gt_boxes=np.array([[8, 8, 24, 24]], np.float32),
                   gt_labels=np.array([0]))
    out = metric.merge_results()
    assert 0.0 <= out["ap"] <= 100.0


def test_roi_align():
    from one_peace_tpu.vision.roi_align import roi_align

    # constant feature map: pooled values must equal the constant
    feat = jnp.full((1, 16, 16, 4), 3.0)
    rois = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, rois, jnp.array([0]), output_size=7)
    assert out.shape == (1, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)

    # linear ramp in x: pooled bins must increase linearly with bin center
    xs = np.arange(16, dtype=np.float32)
    ramp = np.tile(xs[None, :, None], (16, 1, 1))[None]  # (1,16,16,1)
    out = roi_align(jnp.asarray(ramp), jnp.asarray([[0.0, 0.0, 16.0, 16.0]]),
                    jnp.array([0]), output_size=4, sampling_ratio=2)
    col_means = np.asarray(out)[0, 0, :, 0]
    # bin centers at x = 2, 6, 10, 14 -> pixel-center coords 1.5, 5.5, ...
    np.testing.assert_allclose(col_means, [1.5, 5.5, 9.5, 13.5], atol=1e-5)

    # batch routing: roi on image 1 reads image 1's features
    two = jnp.concatenate([jnp.zeros((1, 8, 8, 1)), jnp.ones((1, 8, 8, 1))])
    out = roi_align(two, jnp.asarray([[1.0, 1.0, 7.0, 7.0]]), jnp.array([1]),
                    output_size=2)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)

    # detectron2 border semantics (ROIAlign_cpu.cpp bilinear_interpolate):
    # a sample within (-1, 0] clamps to the edge pixel with full weight
    # (NOT zero-padded bilinear); samples beyond 1px outside read zero.
    feat = jnp.asarray(
        (np.arange(16, dtype=np.float32) + 5.0).reshape(1, 4, 4, 1))
    # roi [-2,-2,2,2], 1 bin, 1 sample -> continuous coord (0,0) ->
    # pixel coord (-0.5,-0.5) -> clamped to pixel (0,0) => exactly feat[0,0]
    # (zero-padded bilinear would give 0.25 * feat[0,0])
    out = roi_align(feat, jnp.asarray([[-2.0, -2.0, 2.0, 2.0]]),
                    jnp.array([0]), output_size=1, sampling_ratio=1)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 5.0, atol=1e-6)
    # fully outside: zero
    out = roi_align(feat, jnp.asarray([[-10.0, -10.0, -6.0, -6.0]]),
                    jnp.array([0]), output_size=1, sampling_ratio=1)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_cascade_rcnn_inference():
    """Backbone -> proposals -> cascade box refinement -> decode."""
    from helpers import tiny_encoder_config
    from one_peace_tpu.vision.backbone import VisionBackbone
    from one_peace_tpu.vision.cascade_rcnn import CascadeBoxHead, apply_deltas

    # delta math: zero deltas keep boxes; positive dw grows width
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0]])
    out = apply_deltas(boxes, jnp.zeros((1, 4)), (10, 10, 5, 5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(boxes), atol=1e-5)
    grown = apply_deltas(boxes, jnp.asarray([[0.0, 0.0, 5.0 * np.log(2.0), 0.0]]),
                         (10, 10, 5, 5))
    assert np.asarray(grown)[0, 2] - np.asarray(grown)[0, 0] == pytest.approx(40.0, rel=1e-5)

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    bb = VisionBackbone(cfg)
    bparams = bb.init(jax.random.PRNGKey(0))
    head = CascadeBoxHead(in_channels=cfg.embed_dim, num_classes=3,
                          pooled_size=4, fc_dim=32, spatial_scale=1 / 16)
    hparams = head.init(jax.random.PRNGKey(1))

    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64), jnp.float32)
    f16 = bb(bparams, imgs)  # (1, 4, 4, D)
    proposals = jnp.asarray([[4.0, 4.0, 40.0, 40.0], [8.0, 16.0, 56.0, 48.0]])
    scores, boxes = head(hparams, f16, proposals, jnp.array([0, 0]))
    assert scores.shape == (2, 4)  # 3 classes + background
    np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0, rtol=1e-4)
    assert boxes.shape == (2, 4)
    dets = head.decode(scores, boxes, score_thresh=0.0)
    assert dets["boxes"].shape[1] == 4
    assert len(dets["scores"]) > 0


def test_cascade_training_loss_and_mask_head():
    from helpers import tiny_encoder_config
    from one_peace_tpu.vision.backbone import VisionBackbone
    from one_peace_tpu.vision.cascade_rcnn import (
        CascadeBoxHead, MaskHead, boxes_iou, cascade_box_loss, encode_deltas,
        apply_deltas, STAGE_DELTA_WEIGHTS)
    import jax

    # encode/apply roundtrip
    b = jnp.asarray([[10.0, 10.0, 30.0, 40.0]])
    t = jnp.asarray([[12.0, 8.0, 36.0, 38.0]])
    d = encode_deltas(b, t, STAGE_DELTA_WEIGHTS[0])
    np.testing.assert_allclose(
        np.asarray(apply_deltas(b, d, STAGE_DELTA_WEIGHTS[0])),
        np.asarray(t), rtol=1e-4)

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    bb = VisionBackbone(cfg)
    bparams = bb.init(jax.random.PRNGKey(0))
    head = CascadeBoxHead(in_channels=cfg.embed_dim, num_classes=3,
                          pooled_size=4, fc_dim=32)
    hparams = head.init(jax.random.PRNGKey(1))

    imgs = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64), jnp.float32)
    f16 = bb(bparams, imgs)
    proposals = jnp.asarray([[4.0, 4.0, 40.0, 40.0], [0.0, 0.0, 60.0, 60.0],
                             [50.0, 50.0, 60.0, 60.0]])
    gt_boxes = jnp.asarray([[6.0, 6.0, 38.0, 38.0], [0.0, 0.0, 1.0, 1.0]])
    gt_labels = jnp.asarray([1, 0])
    gt_valid = jnp.asarray([True, False])  # second GT is padding

    def loss_fn(p):
        loss, m = cascade_box_loss(head, p, f16, proposals,
                                   jnp.array([0, 0, 0]), gt_boxes, gt_labels,
                                   gt_valid)
        return loss, m

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(hparams)
    assert np.isfinite(float(loss))
    import optax

    assert float(optax.global_norm(grads)) > 0
    assert 0.0 <= float(metrics["stage0_fg"]) <= 1.0

    mask_head = MaskHead(in_channels=cfg.embed_dim, num_classes=3,
                         channels=8, pooled_size=4)
    mparams = mask_head.init(jax.random.PRNGKey(2))
    masks = mask_head(mparams, f16, proposals, jnp.array([0, 0, 0]))
    assert masks.shape == (3, 8, 8, 3)
    assert np.isfinite(np.asarray(masks)).all()


def test_batched_nms_no_cross_class_suppression_negative_coords():
    """Boxes with negative coordinates (unclipped border decodes) must not
    be suppressed across classes by the offset trick."""
    from one_peace_tpu.vision.detection import batched_nms

    # identical box, two classes -> both survive class-wise NMS
    boxes = np.array([[-20.0, -10.0, 30.0, 40.0],
                      [-20.0, -10.0, 30.0, 40.0]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([1, 0])
    keep = batched_nms(boxes, scores, labels)
    assert len(keep) == 2
    # same class duplicates still collapse
    keep_same = batched_nms(boxes, scores, np.array([1, 1]))
    assert len(keep_same) == 1


def test_multi_level_roi_align_assignment():
    """detectron2 ROIPooler level rule: floor(4 + log2(sqrt(area)/224)),
    clamped — 56px boxes pool p4, 224px p16, 448px+ p32."""
    from one_peace_tpu.vision.roi_align import multi_level_roi_align

    strides = (4, 8, 16, 32)
    feats = [jnp.full((1, 512 // s, 512 // s, 2), float(i + 1))
             for i, s in enumerate(strides)]
    rois = jnp.asarray([
        [0.0, 0.0, 56.0, 56.0],     # lvl 2 -> p4  (value 1)
        [0.0, 0.0, 112.0, 112.0],   # lvl 3 -> p8  (value 2)
        [0.0, 0.0, 224.0, 224.0],   # lvl 4 -> p16 (value 3)
        [0.0, 0.0, 448.0, 448.0],   # lvl 5 -> p32 (value 4)
    ])
    out = multi_level_roi_align(feats, strides, rois,
                                jnp.zeros((4,), jnp.int32), output_size=3)
    got = np.asarray(out)[:, 1, 1, 0]  # center bin (borders may read 0-pad)
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0, 4.0], rtol=1e-6)

    # clamping: with only two levels a 224px box (lvl 4) clamps to index 1
    out2 = multi_level_roi_align(feats[:2], strides[:2], rois[:3],
                                 jnp.zeros((3,), jnp.int32), output_size=3)
    np.testing.assert_allclose(np.asarray(out2)[:, 1, 1, 0],
                               [1.0, 2.0, 2.0], rtol=1e-6)
