"""End-to-end drivers for the vision-transfer apps (COCO detection,
ADE20K segmentation, K400 video): synthetic tiny corpora through the real
task/criterion/Trainer stack and the train/evaluate CLIs — the analogue
of the reference's det/lazyconfig_train_net.py, seg/train.py and
video/train.py products."""

import json
import os

import numpy as np
import pytest
from PIL import Image


# ---------------------------------------------------------------------------
# synthetic corpora
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def coco_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(8):
        arr = rs.randint(0, 60, (64, 64, 3), dtype=np.uint8)
        n_obj = rs.randint(1, 3)
        for _ in range(n_obj):
            x, y = rs.randint(0, 40, 2)
            w, h = rs.randint(12, 24, 2)
            cat = int(rs.randint(1, 3))
            color = [220, 40, 40] if cat == 1 else [40, 220, 40]
            arr[y:y + h, x:x + w] = color
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": 0,
                "segmentation": [[float(x), float(y), float(x + w), float(y),
                                  float(x + w), float(y + h),
                                  float(x), float(y + h)]],
            })
            ann_id += 1
        name = f"img{i}.png"
        Image.fromarray(arr).save(img_dir / name)
        images.append({"id": i, "file_name": name, "width": 64, "height": 64})
    doc = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "red"}, {"id": 2, "name": "green"}]}
    ann_file = root / "instances.json"
    ann_file.write_text(json.dumps(doc))
    return root, str(ann_file), str(img_dir)


@pytest.fixture(scope="module")
def ade_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("ade")
    img_dir = root / "images"
    ann_dir = root / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()
    rs = np.random.RandomState(1)
    for i in range(8):
        arr = rs.randint(0, 255, (48, 64, 3), dtype=np.uint8)
        # raw ADE labels: 0 = ignore, 1..C -> classes 0..C-1 after reduce
        lab = rs.randint(1, 5, (48, 64)).astype(np.uint8)
        lab[:4] = 0  # an ignore band
        # make labels correlate with pixels so training can learn
        arr[..., 0] = lab * 50
        Image.fromarray(arr).save(img_dir / f"s{i}.jpg")
        Image.fromarray(lab).save(ann_dir / f"s{i}.png")
    return root, str(img_dir), str(ann_dir)


@pytest.fixture(scope="module")
def video_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("k400")
    frames_root = root / "rawframes"
    rs = np.random.RandomState(2)
    lines = []
    for ci in range(8):  # batch 8 must divide the 8-device dp mesh
        label = ci % 3
        d = frames_root / f"clip{ci}"
        d.mkdir(parents=True)
        for fi in range(5):
            # label-dependent mean color so the task is learnable
            arr = np.full((40, 56, 3), 40 + 60 * label, np.uint8)
            arr += rs.randint(0, 20, arr.shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{fi + 1:05d}.jpg")
        lines.append(f"clip{ci} 5 {label}")
    ann = root / "train.txt"
    ann.write_text("\n".join(lines) + "\n")
    return root, str(ann), str(frames_root)


def _common_overrides(root, enc=(48, 96, 4, 4)):
    d, f, layers, heads = enc
    return [
        f"model.encoder.embed_dim={d}",
        f"model.encoder.ffn_embed_dim={f}",
        f"model.encoder.layers={layers}",
        f"model.encoder.attention_heads={heads}",
        "model.encoder.attn_impl=xla",
        "common.bf16=false",
        "common.log_interval=1",
        "dataset.batch_size=8",
        "dataset.batch_size_valid=8",
        f"checkpoint.save_dir={root}/ckpts",
        "optimization.lr=1e-3",
    ]


# ---------------------------------------------------------------------------
# direct trainer loop: loss decreases
# ---------------------------------------------------------------------------


def _loss_decreases(cfg, n_steps=16):
    from one_peace_tpu.cli.train import build_model_for_task
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.tasks import build_task
    from one_peace_tpu.trainer import Trainer

    task = build_task(cfg.task, cfg)
    if not cfg.criterion._name:
        cfg.criterion._name = type(task).criterion_name
    model = build_model_for_task(cfg, task)
    criterion = build_criterion(cfg.criterion)
    task.load_dataset("train")
    trainer = Trainer(cfg, model, criterion, total_updates=n_steps + 4)
    itr = task.get_batch_iterator("train", cfg.dataset.batch_size)
    batch = next(iter(itr.next_epoch_itr()))
    losses = [trainer.train_step(batch)["loss"] for _ in range(n_steps)]
    assert np.isfinite(losses).all(), losses
    # the cascade trains on per-step random GT jitter, so single steps are
    # noisy (spikes of 2x are normal); judge head-vs-tail window means
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
    return task, model, trainer


@pytest.mark.slow
def test_coco_detection_trains(coco_corpus):
    from one_peace_tpu.core.config import load_config

    root, ann, img_dir = coco_corpus
    cfg = load_config(None, _common_overrides(root) + [
        "task._name=coco_detection",
        f"task.data={ann}", f"task.valid_data={ann}",
        f"task.image_dir={img_dir}",
        "task.image_size=64", "task.max_boxes=4", "task.num_classes=2",
        "task.window_size=2", "task.global_period=4", "task.mask_stride=4",
        "task.lsj_min_scale=0.8", "task.lsj_max_scale=1.2",
        # a fresh detector's focal+cascade losses explode without clipping
        "optimization.clip_norm=1.0", "optimization.lr=2e-4",
        "lr_scheduler.warmup_updates=4", "optimization.max_update=20",
        "task.max_proposals=32",
    ])
    task, model, trainer = _loss_decreases(cfg)
    # eval loop produces AP stats through the DetectionAP reducer
    task.load_dataset("valid")
    task.begin_valid_epoch(model, trainer.params)
    vitr = task.get_batch_iterator("valid", 8, ensure_equal_batch=False)
    for batch in vitr.next_epoch_itr():
        task.valid_step(model, trainer.params, batch)
    stats = task.merge_results()
    assert "ap" in stats and "ap50" in stats
    assert 0.0 <= stats["ap"] <= 100.0


@pytest.mark.slow
def test_coco_detection_rpn_proposer_trains(coco_corpus):
    from one_peace_tpu.core.config import load_config

    root, ann, img_dir = coco_corpus
    cfg = load_config(None, _common_overrides(root) + [
        "task._name=coco_detection",
        f"task.data={ann}", f"task.valid_data={ann}",
        f"task.image_dir={img_dir}",
        "task.image_size=64", "task.max_boxes=4", "task.num_classes=2",
        "task.window_size=2", "task.global_period=4",
        "task.with_masks=false", "task.proposer=rpn",
        "task.lsj_min_scale=0.8", "task.lsj_max_scale=1.2",
        "optimization.clip_norm=1.0", "optimization.lr=2e-4",
        "lr_scheduler.warmup_updates=4", "optimization.max_update=20",
    ])
    task, model, trainer = _loss_decreases(cfg)
    assert model.proposer_kind == "rpn"
    # the full detect path runs with class-agnostic RPN proposals
    task.load_dataset("valid")
    ds = task.datasets["valid"]
    batch = ds[0]
    dets = model.detect(trainer.params,
                        np.stack([batch["src_images"]]))
    assert len(dets) == 1 and "boxes" in dets[0]


@pytest.mark.slow
def test_ade20k_seg_trains(ade_corpus):
    from one_peace_tpu.core.config import load_config

    root, img_dir, ann_dir = ade_corpus
    cfg = load_config(None, _common_overrides(root) + [
        "task._name=ade20k_seg",
        f"task.data={img_dir}:{ann_dir}",
        f"task.valid_data={img_dir}:{ann_dir}",
        "task.image_size=64", "task.num_classes=4",
        # the adapter/UperNet stack is sharp at init: warm up like the
        # real recipe instead of stepping at full lr from step 0
        "optimization.clip_norm=1.0", "lr_scheduler.warmup_updates=6",
        "optimization.max_update=20",
    ])
    task, model, trainer = _loss_decreases(cfg)
    task.load_dataset("valid")
    task.begin_valid_epoch(model, trainer.params)
    vitr = task.get_batch_iterator("valid", 8, ensure_equal_batch=False)
    for batch in vitr.next_epoch_itr():
        task.valid_step(model, trainer.params, batch)
    stats = task.merge_results()
    assert "miou" in stats and 0.0 <= stats["miou"] <= 100.0


@pytest.mark.slow
def test_k400_video_trains(video_corpus):
    from one_peace_tpu.core.config import load_config

    root, ann, frames_root = video_corpus
    cfg = load_config(None, _common_overrides(root) + [
        "task._name=k400_video",
        f"task.data={ann}", f"task.valid_data={ann}",
        f"task.image_dir={frames_root}",
        "task.image_size=32", "task.num_classes=3", "task.num_frames=4",
        "optimization.clip_norm=1.0",
    ])
    task, model, trainer = _loss_decreases(cfg)
    task.load_dataset("valid")
    task.begin_valid_epoch(model, trainer.params)
    vitr = task.get_batch_iterator("valid", 8, ensure_equal_batch=False)
    for batch in vitr.next_epoch_itr():
        task.valid_step(model, trainer.params, batch)
    stats = task.merge_results()
    assert "accuracy" in stats and stats["count"] == 8


# ---------------------------------------------------------------------------
# CLI drivers (train -> checkpoint -> evaluate)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_seg_cli_train_then_evaluate(ade_corpus, tmp_path):
    from one_peace_tpu.cli.evaluate import main as eval_main
    from one_peace_tpu.cli.train import main as train_main

    root, img_dir, ann_dir = ade_corpus
    save_dir = tmp_path / "ckpts"
    ov = _common_overrides(tmp_path, enc=(48, 96, 4, 4)) + [
        "task._name=ade20k_seg",
        f"task.data={img_dir}:{ann_dir}",
        f"task.valid_data={img_dir}:{ann_dir}",
        "task.image_size=64", "task.num_classes=4",
        "optimization.clip_norm=1.0",
        "optimization.max_update=2",
        f"checkpoint.save_dir={save_dir}",
        "checkpoint.best_checkpoint_metric=miou",
    ]
    assert train_main(ov) == 0
    best = save_dir / "checkpoint_best.npz"
    assert best.exists()

    out = tmp_path / "metrics.json"
    rc = eval_main(["--path", str(best), "--output", str(out)] + ov)
    assert rc == 0
    stats = json.loads(out.read_text())
    assert "miou" in stats


def test_dataset_static_shapes(coco_corpus, ade_corpus, video_corpus):
    from one_peace_tpu.data.vision_datasets import (
        Ade20kSegDataset, CocoDetectionDataset, RawframeVideoDataset,
        vision_collate)

    _, ann, img_dir = coco_corpus
    ds = CocoDetectionDataset("train", ann, img_dir, image_size=64,
                              max_boxes=4, mask_stride=4)
    batch = vision_collate([ds[i] for i in range(4)])
    assert batch["src_images"].shape == (4, 3, 64, 64)
    assert batch["gt_boxes"].shape == (4, 4, 4)
    assert batch["gt_masks"].shape == (4, 4, 16, 16)
    assert batch["gt_valid"].any()
    # valid boxes lie inside the canvas
    v = batch["gt_valid"]
    assert (batch["gt_boxes"][v] >= 0).all()
    assert (batch["gt_boxes"][v] <= 64).all()

    _, img_dir2, ann_dir2 = ade_corpus
    seg = Ade20kSegDataset("train", img_dir2, ann_dir2, crop_size=64,
                           num_classes=4)
    s = seg[0]
    assert s["src_images"].shape == (3, 64, 64)
    assert s["target"].shape == (64, 64)
    labs = np.unique(s["target"])
    assert set(labs).issubset(set(range(4)) | {255})

    _, ann3, root3 = video_corpus
    vid = RawframeVideoDataset("valid", ann3, root3, num_frames=4,
                               image_size=32)
    sv = vid[0]
    assert sv["src_videos"].shape == (4, 3, 32, 32)
    assert sv["target"] == 0


def test_rle_decode_roundtrip():
    """Uncompressed + compressed COCO RLE decode against a known mask."""
    from one_peace_tpu.data.vision_datasets import rle_decode

    rs = np.random.RandomState(3)
    mask = (rs.rand(7, 9) > 0.5).astype(np.uint8)
    # build uncompressed counts (column-major runs starting with 0s)
    flat = mask.T.ravel()
    counts, run, val = [], 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, px
    counts.append(run)
    out = rle_decode({"counts": counts, "size": [7, 9]}, 7, 9)
    np.testing.assert_array_equal(out, mask)


def test_vision_recipes_load():
    """The shipped vision recipes must parse against the config schema."""
    import glob

    from one_peace_tpu.core.config import load_config

    paths = (glob.glob("recipes/detection/*.yaml")
             + glob.glob("recipes/segmentation/*.yaml")
             + glob.glob("recipes/video/*.yaml"))
    assert len(paths) >= 3
    for p in paths:
        cfg = load_config(p)
        assert cfg.task._name in ("coco_detection", "ade20k_seg", "k400_video")


def test_rle_mask_padding_stays_empty(tmp_path):
    """A non-square image letterboxed into the square canvas must not
    clone its edge rows into the padding region of an RLE instance mask."""
    from one_peace_tpu.data.vision_datasets import CocoDetectionDataset

    # 32x64 image -> fits width at 64px canvas, bottom half is padding
    arr = np.full((32, 64, 3), 128, np.uint8)
    Image.fromarray(arr).save(tmp_path / "i.png")
    # full-image mask as uncompressed column-major RLE: all ones
    counts = [0, 32 * 64]
    doc = {
        "images": [{"id": 0, "file_name": "i.png", "width": 64, "height": 32}],
        "annotations": [{
            "id": 1, "image_id": 0, "category_id": 1,
            "bbox": [0.0, 0.0, 64.0, 32.0], "area": 2048.0, "iscrowd": 0,
            "segmentation": {"counts": counts, "size": [32, 64]},
        }],
        "categories": [{"id": 1, "name": "x"}],
    }
    ann = tmp_path / "a.json"
    ann.write_text(json.dumps(doc))
    ds = CocoDetectionDataset("valid", str(ann), str(tmp_path),
                              image_size=64, max_boxes=2, mask_stride=4)
    s = ds[0]
    m = s["gt_masks"][0]  # (16, 16) at stride 4; image occupies top 8 rows
    assert m[:8].all(), "in-image mask rows must be filled"
    assert not m[8:].any(), "padding rows must stay empty"


def test_crowd_anns_never_evict_real_gts(tmp_path):
    """Under the fixed max_boxes slot budget, real (scoreable) GTs must
    fill slots before crowd ignore regions, regardless of annotation-file
    order (a crowd-first file must not silently drop real instances)."""
    from one_peace_tpu.data.vision_datasets import CocoDetectionDataset

    arr = np.full((64, 64, 3), 128, np.uint8)
    Image.fromarray(arr).save(tmp_path / "i.png")
    anns = []
    # 3 crowd anns listed FIRST, then 3 real anns; budget of 4 slots
    for i in range(3):
        anns.append({"id": i + 1, "image_id": 0, "category_id": 1,
                     "bbox": [2.0 * i, 2.0, 10.0, 10.0], "area": 100.0,
                     "iscrowd": 1})
    for i in range(3):
        anns.append({"id": i + 4, "image_id": 0, "category_id": 1,
                     "bbox": [4.0 * i, 30.0, 10.0, 10.0], "area": 100.0,
                     "iscrowd": 0})
    doc = {
        "images": [{"id": 0, "file_name": "i.png", "width": 64, "height": 64}],
        "annotations": anns,
        "categories": [{"id": 1, "name": "x"}],
    }
    ann = tmp_path / "a.json"
    ann.write_text(json.dumps(doc))
    ds = CocoDetectionDataset("valid", str(ann), str(tmp_path),
                              image_size=64, max_boxes=4, with_masks=False)
    s = ds[0]
    assert s["gt_valid"].sum() == 4
    # all 3 real GTs present (slots 0-2), exactly one crowd slot kept
    assert not s["gt_crowd"][:3].any(), "real GTs must fill slots first"
    assert s["gt_crowd"][3], "remaining budget goes to crowd regions"
    # within-group annotation order preserved (stable sort): first real
    # ann's box at x=0..10 scaled to the 64px canvas appears in slot 0
    assert abs(s["gt_boxes"][0][1] - 30.0) < 1e-4


def test_seg_eval_protocol_ms_flip_branch():
    """task.seg_eval_protocol routes valid_step through slide/ms_flip
    host inference (ref seg/test.py --aug-test) and folds a host-side
    confusion matrix into the MIoU accumulators."""
    from one_peace_tpu.core.config import TaskConfig
    from one_peace_tpu.tasks.vision_tasks import Ade20kSegTask

    cfg = TaskConfig(_name="ade20k_seg", num_classes=3, image_size=16,
                     seg_eval_protocol="ms_flip", seg_ms_ratios=(0.5, 1.0))
    task = Ade20kSegTask(cfg)
    target = np.random.RandomState(0).randint(0, 3, (2, 16, 16)).astype(np.int32)
    target[:, :2] = 255  # ignore band

    class Oracle:
        def ms_flip_logits(self, params, images, crop, stride, ratios, flip):
            assert ratios == (0.5, 1.0) and flip and crop == 16
            probs = np.zeros(target.shape + (3,), np.float32)
            np.put_along_axis(probs, np.clip(target[..., None], 0, 2), 1.0, -1)
            return probs

    task.begin_valid_epoch(None, None)
    batch = {"src_images": np.zeros((2, 3, 16, 16), np.float32),
             "target": target}
    task.valid_step(Oracle(), None, batch)
    stats = task.merge_results()
    assert stats["miou"] == 100.0


def test_seg_eval_protocol_slide_device_cm():
    """proto='slide' stays on device end-to-end: valid_step consumes the
    scanned slide canvas via model.slide_scores (never slide_logits), the
    confusion matrix accumulates as a device array, and merge fetches it
    once."""
    import jax.numpy as jnp

    from one_peace_tpu.core.config import TaskConfig
    from one_peace_tpu.tasks.vision_tasks import Ade20kSegTask

    cfg = TaskConfig(_name="ade20k_seg", num_classes=3, image_size=16,
                     seg_eval_protocol="slide", seg_eval_stride=8)
    task = Ade20kSegTask(cfg)
    target = np.random.RandomState(1).randint(0, 3, (2, 16, 16)).astype(np.int32)
    target[:, -3:] = 255  # ignore band

    class Oracle:
        def slide_scores(self, params, images, crop, stride):
            assert crop == 16 and stride == 8
            probs = np.zeros(target.shape + (3,), np.float32)
            np.put_along_axis(probs, np.clip(target[..., None], 0, 2), 1.0, -1)
            return jnp.asarray(probs)

        def slide_logits(self, *a, **k):  # pragma: no cover
            raise AssertionError("slide protocol must not fetch the canvas")

    task.begin_valid_epoch(None, None)
    batch = {"src_images": np.zeros((2, 3, 16, 16), np.float32),
             "target": target}
    task.valid_step(Oracle(), None, batch)
    assert task._cm_dev is not None, "CM must accumulate on device"
    stats = task.merge_results()
    assert stats["miou"] == 100.0


def test_video_multiview_testing(video_corpus):
    """Multi-view video testing (ref onepeace_k400_frame32.py:50-60:
    SampleFrames num_clips=3 + ThreeCrop, probs averaged per
    average_clips='prob'): the eval dataset emits (V, T, 3, S, S) views
    and the task averages softmax probabilities over them."""
    from one_peace_tpu.core.config import load_config
    from one_peace_tpu.data.vision_datasets import RawframeVideoDataset
    from one_peace_tpu.tasks import build_task

    root, ann, frames_root = video_corpus
    ds = RawframeVideoDataset("valid", ann, frames_root, num_frames=4,
                              image_size=32, test_num_clips=3,
                              test_three_crop=True)
    item = ds[0]
    assert item["src_videos"].shape == (9, 4, 3, 32, 32)
    # distinct temporal clips sample distinct frames on long-enough videos
    assert not np.array_equal(ds._frame_indices(40, 0, 3),
                              ds._frame_indices(40, 2, 3))
    # center crop of the center clip matches the single-view eval sample
    single = RawframeVideoDataset("valid", ann, frames_root, num_frames=4,
                                  image_size=32)[0]
    np.testing.assert_array_equal(item["src_videos"][4], single["src_videos"])

    cfg = load_config(None, _common_overrides(root) + [
        "task._name=k400_video",
        f"task.data={ann}", f"task.valid_data={ann}",
        f"task.image_dir={frames_root}",
        "task.image_size=32", "task.num_classes=3", "task.num_frames=4",
        "task.video_test_clips=3", "task.video_test_three_crop=true",
    ])
    task = build_task(cfg.task, cfg)
    model = task.build_model(cfg)
    import jax

    params = model.init(jax.random.PRNGKey(0))
    task.load_dataset("valid")
    task.begin_valid_epoch(model, params)
    vitr = task.get_batch_iterator("valid", 8, ensure_equal_batch=False)
    for batch in vitr.next_epoch_itr():
        assert batch["src_videos"].ndim == 6
        task.valid_step(model, params, batch)
    stats = task.merge_results()
    assert stats["count"] == 8 and 0.0 <= stats["accuracy"] <= 100.0


def test_dense_frame_sampling_mmaction2_semantics(video_corpus):
    """Dense SampleFrames(clip_len=T, frame_interval=I) index arithmetic
    pinned against hand-computed mmaction2 semantics (_get_train_clips /
    _get_test_clips + out_of_bound_opt='loop'), the reference recipe's
    sampler (ref onepeace_k400_frame32.py:20-31,56)."""
    from one_peace_tpu.data.vision_datasets import RawframeVideoDataset

    _, ann, frames_root = video_corpus

    # test mode, num_clips=1: ori=32*4=128; total=300 -> avg=(300-128+1)=173,
    # offset=int(173/2)=86 -> 86 + 4*arange(32)
    val = RawframeVideoDataset("valid", ann, frames_root, num_frames=32,
                               image_size=32, sampling="dense",
                               frame_interval=4)
    np.testing.assert_array_equal(val._frame_indices(300),
                                  86 + 4 * np.arange(32))
    # short video loop-pads by modular indexing: total=100 < ori=128
    # -> offset 0, indices 4*arange(32) mod 100
    np.testing.assert_array_equal(val._frame_indices(100),
                                  (4 * np.arange(32)) % 100)
    # multi-clip test spread: total=500, num_clips=3 ->
    # avg=(500-128+1)/3=124.333, offsets=int(i*avg + avg/2)=[62,186,310]
    for i, off in enumerate((62, 186, 310)):
        np.testing.assert_array_equal(val._frame_indices(500, i, 3),
                                      off + 4 * np.arange(32))

    # train: random start within [0, total-ori+1)
    tr = RawframeVideoDataset("train", ann, frames_root, num_frames=32,
                              image_size=32, sampling="dense",
                              frame_interval=4)
    for _ in range(10):
        idx = tr._frame_indices(300)
        d = np.diff(idx)
        assert (d == 4).all()            # contiguous window, stride 4
        assert 0 <= idx[0] <= 172
    # short training video: offset 0, loop-padded
    np.testing.assert_array_equal(tr._frame_indices(100),
                                  (4 * np.arange(32)) % 100)


def test_video_train_aug_rrc_and_color_jitter(video_corpus):
    """The dense-recipe train pipeline produces valid clips and the
    ColorJitter actually perturbs pixel statistics; shapes stay static."""
    from one_peace_tpu.data.vision_datasets import (
        RawframeVideoDataset, _jitter_brightness_contrast_saturation,
        _jitter_hue)

    _, ann, frames_root = video_corpus
    ds = RawframeVideoDataset("train", ann, frames_root, num_frames=4,
                              image_size=32, sampling="dense",
                              frame_interval=1, train_aug="rrc")
    s = ds[0]
    assert s["src_videos"].shape == (4, 3, 32, 32)
    assert np.isfinite(s["src_videos"]).all()

    # jitter math: identity factors are a no-op; brightness 0.5 halves
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (8, 8, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        _jitter_brightness_contrast_saturation(img, 1.0, 1.0, 1.0), img)
    np.testing.assert_array_equal(
        _jitter_brightness_contrast_saturation(img, 0.5, 1.0, 1.0),
        np.clip(img.astype(np.float32) * 0.5, 0, 255).astype(np.uint8))
    np.testing.assert_array_equal(_jitter_hue(img, 0.0), img)
    assert not np.array_equal(_jitter_hue(img, 0.1), img)
    # saturation 0 collapses to grayscale (all channels equal)
    g = _jitter_brightness_contrast_saturation(img, 1.0, 1.0, 0.0)
    assert (np.abs(g[..., 0].astype(int) - g[..., 1].astype(int)) <= 1).all()
