#!/usr/bin/env python
"""Equivalence study for the static-shape substitutions (PARITY.md).

Three load-bearing "same metric, TPU-friendly formulation" claims are
measured on synthetic corpora instead of asserted (VERDICT r3 #4/#7):

1. RPN objectness: balanced re-weighting (shipped) vs detectron2's
   literal 256-anchor 1:1 random subsample (``criterion.rpn_sampler``),
   plus FCOS vs RPN proposers at fixed cascade heads — box AP after the
   same budget of steps from the same init.
2. Segmentation loss raster: stride-4 label subsample (shipped) vs
   mmseg's full-resolution logits upsample (``criterion.seg_loss_at``)
   — mIoU after the same budget.
3. Whole-protocol seg eval rule: nearest-upsampled stride-4 argmax
   (shipped) vs mmseg's bilinear logits upsample then argmax
   (``task.seg_eval_logits_upsample``) — same trained model, both rules.

Run on the CPU mesh:
  JAX_PLATFORMS=cpu python examples/parity_harness.py [det] [seg]

Prints a markdown table; paste the numbers into PARITY.md.
"""

import json
import os
import sys
import tempfile

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# synthetic corpora (learnable: class <-> color / label <-> channel)
# ---------------------------------------------------------------------------


def make_det_corpus(root, n_images, seed, name):
    from PIL import Image

    img_dir = os.path.join(root, f"images_{name}")
    os.makedirs(img_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    colors = [[220, 40, 40], [40, 220, 40]]
    for i in range(n_images):
        arr = rs.randint(0, 60, (64, 64, 3), dtype=np.uint8)
        for _ in range(int(rs.randint(1, 3))):
            x, y = rs.randint(0, 40, 2)
            w, h = rs.randint(12, 24, 2)
            cat = int(rs.randint(1, 3))
            arr[y:y + h, x:x + w] = colors[cat - 1]
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cat,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": 0,
                "segmentation": [[float(x), float(y), float(x + w), float(y),
                                  float(x + w), float(y + h),
                                  float(x), float(y + h)]]})
            ann_id += 1
        Image.fromarray(arr).save(os.path.join(img_dir, f"img{i}.png"))
        images.append({"id": i, "file_name": f"img{i}.png",
                       "width": 64, "height": 64})
    ann = os.path.join(root, f"instances_{name}.json")
    with open(ann, "w") as fh:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1}, {"id": 2}]}, fh)
    return ann, img_dir


def make_seg_corpus(root, n_images, seed, name):
    """Fine-structure corpus: 2px-wide diagonal stripes + blobs so the
    stride-4 GT subsample genuinely loses boundary pixels."""
    from PIL import Image

    img_dir = os.path.join(root, f"seg_img_{name}")
    ann_dir = os.path.join(root, f"seg_ann_{name}")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    for i in range(n_images):
        lab = np.ones((64, 64), np.uint8)  # class 0 background (after -1)
        yy, xx = np.mgrid[0:64, 0:64]
        ph = int(rs.randint(0, 16))
        lab[((yy + xx + ph) % 16) < 2] = 2          # thin stripes: class 1
        cx, cy, r = rs.randint(12, 52, 2).tolist() + [int(rs.randint(6, 14))]
        lab[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = 3   # blob: class 2
        arr = np.zeros((64, 64, 3), np.uint8)
        arr[..., 0] = lab * 60 + rs.randint(0, 25, (64, 64))
        arr[..., 1] = rs.randint(0, 255, (64, 64))
        Image.fromarray(arr).save(os.path.join(img_dir, f"s{i}.jpg"))
        Image.fromarray(lab).save(os.path.join(ann_dir, f"s{i}.png"))
    return img_dir, ann_dir


# ---------------------------------------------------------------------------
# arms
# ---------------------------------------------------------------------------


def _build(cfg, n_steps):
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
    task.load_dataset("valid")
    trainer = Trainer(cfg, model, criterion, total_updates=n_steps)
    return task, model, trainer


def _train(task, trainer, cfg, n_steps):
    itr = task.get_batch_iterator("train", cfg.dataset.batch_size,
                                  seed=cfg.common.seed)
    done, losses = 0, []
    while done < n_steps:
        for batch in itr.next_epoch_itr():
            losses.append(float(trainer.train_step(batch)["loss"]))
            done += 1
            if done >= n_steps:
                break
    return losses


def _eval(task, model, trainer):
    task.begin_valid_epoch(model, trainer.params)
    vitr = task.get_batch_iterator("valid", 8, ensure_equal_batch=False)
    for batch in vitr.next_epoch_itr():
        task.valid_step(model, trainer.params, batch)
    return task.merge_results()


_COMMON = [
    "model.encoder.embed_dim=48", "model.encoder.ffn_embed_dim=96",
    "model.encoder.layers=4", "model.encoder.attention_heads=4",
    "model.encoder.attn_impl=xla", "common.bf16=false",
    "distributed.dp=1", "distributed.fsdp=1", "distributed.tp=1",
    "dataset.batch_size=8", "common.seed=7",
]


def det_study(n_steps=60):
    root = tempfile.mkdtemp(prefix="parity_det_")
    tr_ann, tr_dir = make_det_corpus(root, 24, seed=0, name="train")
    va_ann, va_dir = make_det_corpus(root, 8, seed=100, name="val")
    base = _COMMON + [
        "task._name=coco_detection",
        f"task.data={tr_ann}", f"task.image_dir={tr_dir}",
        f"task.valid_data={va_ann}", f"task.valid_image_dir={va_dir}",
        "task.image_size=64", "task.max_boxes=4", "task.num_classes=2",
        "task.window_size=2", "task.global_period=4",
        "task.with_masks=false", "task.max_proposals=32",
        "task.lsj_min_scale=0.8", "task.lsj_max_scale=1.2",
        "optimization.clip_norm=1.0", "optimization.lr=2e-4",
        "lr_scheduler.warmup_updates=8",
        f"optimization.max_update={n_steps}",
    ]
    arms = {
        "rpn_balanced": ["task.proposer=rpn",
                         "criterion.rpn_sampler=balanced"],
        "rpn_subsample256": ["task.proposer=rpn",
                             "criterion.rpn_sampler=subsample"],
        "fcos": ["task.proposer=fcos"],
    }
    rows = []
    for name, extra in arms.items():
        from one_peace_tpu.core.config import load_config

        cfg = load_config(None, base + extra)
        task, model, trainer = _build(cfg, n_steps)
        losses = _train(task, trainer, cfg, n_steps)
        stats = _eval(task, model, trainer)
        rows.append((name, stats["ap"], stats["ap50"], losses[-1]))
        print(f"# det arm {name}: ap={stats['ap']:.1f} "
              f"ap50={stats['ap50']:.1f} final_loss={losses[-1]:.3f}",
              flush=True)
    print("\n| det arm | AP | AP50 |\n|---|---|---|")
    for name, ap, ap50, _ in rows:
        print(f"| {name} | {ap:.1f} | {ap50:.1f} |")
    return rows


def seg_study(n_steps=60):
    root = tempfile.mkdtemp(prefix="parity_seg_")
    tr_img, tr_ann = make_seg_corpus(root, 24, seed=0, name="train")
    va_img, va_ann = make_seg_corpus(root, 8, seed=100, name="val")
    base = _COMMON + [
        "task._name=ade20k_seg",
        f"task.data={tr_img}:{tr_ann}", f"task.valid_data={va_img}:{va_ann}",
        "task.image_size=64", "task.num_classes=3", "task.seg_head=upernet",
        "optimization.clip_norm=1.0", "optimization.lr=3e-4",
        "lr_scheduler.warmup_updates=8",
        f"optimization.max_update={n_steps}",
    ]
    rows = []
    for name, extra in {
        "loss_stride4": ["criterion.seg_loss_at=stride"],
        "loss_fullres": ["criterion.seg_loss_at=full"],
    }.items():
        from one_peace_tpu.core.config import load_config

        cfg = load_config(None, base + extra)
        task, model, trainer = _build(cfg, n_steps)
        losses = _train(task, trainer, cfg, n_steps)
        # same trained model scored under BOTH eval rules (set each arm
        # explicitly — the config DEFAULT is the mmseg bilinear rule, so
        # relying on it would score the first arm under the wrong rule)
        task.cfg.seg_eval_logits_upsample = False
        stats_near = _eval(task, model, trainer)
        task.cfg.seg_eval_logits_upsample = True
        stats_bilin = _eval(task, model, trainer)
        task.cfg.seg_eval_logits_upsample = False
        rows.append((name, stats_near["miou"], stats_bilin["miou"],
                     losses[-1]))
        print(f"# seg arm {name}: miou(nearest-argmax)="
              f"{stats_near['miou']:.2f} miou(bilinear-logits)="
              f"{stats_bilin['miou']:.2f} final_loss={losses[-1]:.3f}",
              flush=True)
    print("\n| seg arm | mIoU (stride-4 argmax eval) | "
          "mIoU (mmseg bilinear-logits eval) |\n|---|---|---|")
    for name, m_near, m_bil, _ in rows:
        print(f"| {name} | {m_near:.2f} | {m_bil:.2f} |")
    return rows


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
        _COMMON[-1] = f"common.seed={seed}"
    n_steps = 60
    if "--steps" in args:
        i = args.index("--steps")
        n_steps = int(args[i + 1])
        del args[i:i + 2]
    which = set(args) or {"det", "seg"}
    if "seg" in which:
        seg_study(n_steps=n_steps)
    if "det" in which:
        det_study(n_steps=n_steps)
