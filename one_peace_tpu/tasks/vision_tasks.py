"""Vision-transfer tasks: COCO detection, ADE20K segmentation, K400 video.

These make the three vision-transfer apps end-to-end drivable through the
standard CLI (``cli/train.py task._name=coco_detection ...`` /
``cli/evaluate.py``), the role the reference fills with per-app drivers
on third-party stacks (ref one_peace_vision/det/lazyconfig_train_net.py,
seg/train.py + seg/test.py, video/train.py + video/test.py and their
config trees).

Unlike the multimodal tasks they need no BPE/tokenizer and no TSV table;
each task builds its own zoo model (vision/zoo.py) from the config's
encoder dims + task fields, loads the matching dataset
(data/vision_datasets.py), and runs a jitted, deferred-fetch eval loop
into the right reducer (DetectionAP / MIoU / Accuracy).
"""

from __future__ import annotations

import copy
from typing import Dict

import numpy as np

from ..core.registry import TASKS
from ..data.iterators import EpochBatchIterator
from ..data.vision_datasets import (
    Ade20kSegDataset,
    CocoDetectionDataset,
    RawframeVideoDataset,
    vision_collate,
)
from ..metrics import Accuracy
from ..metrics.metrics import DetectionAP, MIoU


class VisionTaskBase:
    """Task contract (load_dataset / iterator / eval hooks) without the
    BPE + TSV machinery of BaseTask."""

    criterion_name = ""

    def __init__(self, cfg, framework_cfg=None):
        self.cfg = cfg
        self.framework_cfg = framework_cfg
        self.datasets: Dict[str, object] = {}
        self._eval_fns: Dict = {}

    def build_dataset(self, split: str):
        raise NotImplementedError

    def build_model(self, cfg):
        raise NotImplementedError

    def load_dataset(self, split: str):
        self.datasets[split] = self.build_dataset(split)
        return self.datasets[split]

    def get_batch_iterator(self, split: str, batch_size: int, seed: int = 3407,
                           shard_id: int = 0, num_shards: int = 1,
                           ensure_equal_batch: bool = True,
                           skip_remainder_batch: bool = False) -> EpochBatchIterator:
        return EpochBatchIterator(
            self.datasets[split],
            collate_fn=vision_collate,
            batch_size=batch_size,
            seed=seed,
            shard_id=shard_id,
            num_shards=num_shards,
            shuffle=(split == "train"),
            ensure_equal_batch=ensure_equal_batch,
            skip_remainder_batch=skip_remainder_batch,
        )

    def _jit(self, key, fn):
        import jax

        if key not in self._eval_fns:
            self._eval_fns[key] = jax.jit(fn)
        return self._eval_fns[key]

    @property
    def eval_compiles(self) -> int:
        return len(self._eval_fns)

    def begin_valid_epoch(self, model, params):
        self.metric.initialize()

    def merge_results(self) -> Dict:
        return self.metric.merge_results()


@TASKS.register("coco_detection")
class CocoDetectionTask(VisionTaskBase):
    """Cascade Mask R-CNN finetuning on COCO (ref det/ app: detectron2
    lazyconfig driver + cascade_mask_rcnn_vitdet_50ep recipe)."""

    criterion_name = "detection_criterion"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = DetectionAP(num_classes=cfg.num_classes)

    def build_dataset(self, split: str):
        c = self.cfg
        ann = c.data if split == "train" else c.valid_data
        img_dir = c.image_dir if split == "train" else (
            c.valid_image_dir or c.image_dir)
        return CocoDetectionDataset(
            split, ann, img_dir, image_size=c.image_size,
            max_boxes=c.max_boxes, with_masks=c.with_masks,
            mask_stride=c.mask_stride, lsj_min_scale=c.lsj_min_scale,
            lsj_max_scale=c.lsj_max_scale)

    def build_model(self, cfg):
        from ..vision.zoo import OnePeaceDetector

        enc = cfg.model.encoder
        t = cfg.task
        return OnePeaceDetector(
            num_classes=t.num_classes, image_size=t.image_size,
            with_masks=t.with_masks, proposer=t.proposer,
            embed_dim=enc.embed_dim, ffn_embed_dim=enc.ffn_embed_dim,
            heads=enc.attention_heads, layers=enc.layers,
            window_size=t.window_size, global_period=t.global_period,
            drop_path_rate=enc.drop_path_rate,
            checkpoint_activations=enc.checkpoint_activations,
            attn_impl=enc.attn_impl)

    def valid_step(self, model, params, batch):
        """Box AND instance-mask (segm) scoring under the COCO protocol:
        mask probabilities paste into image coordinates (detectron2
        paste_masks_in_image semantics, at the GT raster stride), crowd
        regions flow through as ignore, and areas rescale to original
        px^2 via the per-image resize factor (ref det COCOEvaluator
        pair, lazyconfig_train_net.py:36-40)."""
        from ..vision.mask_paste import paste_masks

        results = model.detect(params, batch["src_images"],
                               max_proposals=self.cfg.max_proposals)
        gt_boxes = np.asarray(batch["gt_boxes"])
        gt_labels = np.asarray(batch["gt_labels"])
        gt_valid = np.asarray(batch["gt_valid"])
        gt_crowd = np.asarray(batch.get(
            "gt_crowd", np.zeros(gt_valid.shape, bool)))
        gt_areas = batch.get("gt_areas")
        scales = np.asarray(batch.get(
            "im_scale", np.ones(len(results), np.float32)), np.float32)
        gt_masks = (np.asarray(batch["gt_masks"])
                    if "gt_masks" in batch and self.cfg.with_masks else None)
        size, stride = self.cfg.image_size, self.cfg.mask_stride
        for b, det in enumerate(results):
            v = gt_valid[b]
            f = float(scales[b])
            kw = {
                "gt_crowd": gt_crowd[b][v],
                "area_scale": 1.0 / (f * f),
            }
            if gt_areas is not None:
                kw["gt_areas"] = np.asarray(gt_areas[b])[v]
            if gt_masks is not None:
                # an image with zero detections still records an (0, G)
                # segm entry — its unrecalled GTs must count
                dm = det.get("masks", np.zeros((0, 1, 1), np.float32))
                kw["det_masks"] = paste_masks(
                    dm, det["boxes"][:len(dm)], size // stride,
                    size // stride, stride=stride)
                kw["gt_masks"] = gt_masks[b][v]
                kw["mask_area_scale"] = (stride * stride) / (f * f)
            self.metric.compute(det["boxes"], det["scores"], det["labels"],
                                gt_boxes[b][v], gt_labels[b][v], **kw)


@TASKS.register("ade20k_seg")
class Ade20kSegTask(VisionTaskBase):
    """ViT-Adapter semantic segmentation with a Mask2Former
    (``task.seg_head=mask2former`` — the reference's headline recipe,
    ref seg/configs/ade20k/mask2former_onepeace_adapter_g_896_40k
    _ade20k_ss.py) or UperNet decode head (lighter alternative)."""

    criterion_name = "segmentation_criterion"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        if cfg.num_classes == 1000:  # the classify default is meaningless here
            cfg.num_classes = 150
        self.metric = MIoU(num_classes=cfg.num_classes,
                           ignore_index=cfg.ignore_index)

    def build_dataset(self, split: str):
        c = self.cfg
        spec = c.data if split == "train" else c.valid_data
        img_dir, _, ann_dir = spec.partition(":")
        return Ade20kSegDataset(
            split, img_dir, ann_dir, crop_size=c.image_size,
            num_classes=c.num_classes, ignore_index=c.ignore_index,
            reduce_zero_label=c.reduce_zero_label)

    def build_model(self, cfg):
        from ..vision.zoo import OnePeaceMask2FormerSegmenter, OnePeaceSegmenter

        enc_cfg = copy.deepcopy(cfg.model.encoder)
        t = cfg.task
        grid = t.image_size // 16
        enc_cfg.image_adapter.bucket_size = grid
        enc_cfg.image_adapter.rel_bucket_size = grid
        if t.seg_head == "mask2former":
            # the reference's headline recipe head (ref seg/configs/
            # ade20k/mask2former_onepeace_adapter_g_896_40k_ade20k_ss.py)
            model = OnePeaceMask2FormerSegmenter(
                enc_cfg, num_classes=t.num_classes,
                feat_channels=t.seg_feat_channels,
                num_queries=t.num_queries, dec_layers=t.seg_dec_layers,
                pixel_layers=t.seg_pixel_layers)
            model.max_instances = t.seg_max_instances
            model.num_points = t.seg_num_points
            return model
        assert t.seg_head == "upernet", t.seg_head
        return OnePeaceSegmenter(enc_cfg, num_classes=t.num_classes)

    def begin_valid_epoch(self, model, params):
        self.metric.initialize()
        self._cm_dev = None

    def valid_step(self, model, params, batch):
        """Device-side per-batch confusion matrix; the (C, C) accumulator
        lives on device and is fetched ONCE in merge_results (no per-batch
        host round-trip).  task.seg_eval_protocol selects 'slide' (mmseg
        test_cfg mode='slide') or 'ms_flip' (ref seg/test.py:143-148
        --aug-test) instead of the jitted whole-crop path."""
        proto = getattr(self.cfg, "seg_eval_protocol", "whole")
        if proto == "slide":
            # device end-to-end: the scanned slide canvas never leaves the
            # chip — argmax + confusion matrix reduce there, merged once
            import jax.numpy as jnp

            imgs = np.asarray(batch["src_images"], np.float32)
            crop, stride = self.cfg.image_size, self.cfg.seg_eval_stride
            sc_dev = model.slide_scores(params, imgs, crop, stride)
            c, ign = self.metric.num_classes, self.metric.ignore_index

            def slide_cm(sc, t):
                pred = jnp.argmax(sc, -1).astype(jnp.int32)
                valid = t != ign
                safe_t = jnp.where(valid, t, 0)
                idx = jnp.where(valid,
                                safe_t * c + jnp.clip(pred, 0, c - 1), c * c)
                cm = jnp.bincount(idx.reshape(-1), length=c * c + 1)[: c * c]
                return cm.reshape(c, c)

            fn = self._jit("seg_slide_cm", slide_cm)
            cm = fn(sc_dev, jnp.asarray(batch["target"]))
            self._cm_dev = cm if self._cm_dev is None else self._cm_dev + cm
            return
        if proto != "whole":
            imgs = np.asarray(batch["src_images"], np.float32)
            crop, stride = self.cfg.image_size, self.cfg.seg_eval_stride
            assert proto == "ms_flip", proto
            sc = model.ms_flip_logits(
                params, imgs, crop, stride,
                ratios=tuple(self.cfg.seg_ms_ratios), flip=True)
            pred = sc.argmax(-1)
            t = np.asarray(batch["target"])
            c, ign = self.metric.num_classes, self.metric.ignore_index
            valid = t != ign
            idx = t[valid] * c + np.clip(pred[valid], 0, c - 1)
            cm = np.bincount(idx, minlength=c * c).reshape(c, c)
            self.metric.update_confusion(cm)
            return
        import jax
        import jax.numpy as jnp

        c = self.metric.num_classes
        ign = self.metric.ignore_index

        upsample_logits = getattr(self.cfg, "seg_eval_logits_upsample",
                                  False)

        def conf(p, x, t):
            logits = model.logits(p, x)
            if upsample_logits:
                # mmseg-exact: resize class scores to label resolution
                # (align_corners=False bilinear) then argmax
                logits = jax.image.resize(
                    logits.astype(jnp.float32),
                    (t.shape[0], t.shape[1], t.shape[2], logits.shape[-1]),
                    method="bilinear")
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                stride = t.shape[-1] // pred.shape[-1]
                pred = jnp.repeat(jnp.repeat(pred, stride, 1), stride, 2)
                pred = pred[:, : t.shape[1], : t.shape[2]]
            valid = t != ign
            safe_t = jnp.where(valid, t, 0)
            idx = jnp.where(valid,
                            safe_t * c + jnp.clip(pred, 0, c - 1), c * c)
            cm = jnp.bincount(idx.reshape(-1), length=c * c + 1)[: c * c]
            return cm.reshape(c, c)

        fn = self._jit(f"seg_conf_up{int(upsample_logits)}", conf)
        cm = fn(params, batch["src_images"], jnp.asarray(batch["target"]))
        self._cm_dev = cm if self._cm_dev is None else self._cm_dev + cm

    def merge_results(self) -> Dict:
        from ..metrics.metrics import fetch_once

        if self._cm_dev is not None:
            self.metric.update_confusion(fetch_once(self._cm_dev))
            self._cm_dev = None
        return self.metric.merge_results()


@TASKS.register("k400_video")
class K400VideoTask(VisionTaskBase):
    """Frozen-trunk AIM video classification (ref video/ app: mmaction2
    recognizer recipes)."""

    criterion_name = "video_classify_criterion"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        if cfg.num_classes == 1000:
            cfg.num_classes = 400
        self.metric = Accuracy()

    def build_dataset(self, split: str):
        c = self.cfg
        ann = c.data if split == "train" else c.valid_data
        root = c.image_dir if split == "train" else (
            c.valid_image_dir or c.image_dir)
        return RawframeVideoDataset(
            split, ann, root, num_frames=c.num_frames,
            image_size=c.image_size, frame_tmpl=c.frame_tmpl,
            test_num_clips=c.video_test_clips,
            test_three_crop=c.video_test_three_crop,
            sampling=c.video_sampling,
            frame_interval=c.video_frame_interval,
            train_aug=c.video_train_aug,
            color_jitter=c.video_color_jitter)

    def build_model(self, cfg):
        from ..vision.zoo import OnePeaceVideoClassifier

        enc = cfg.model.encoder
        t = cfg.task
        return OnePeaceVideoClassifier(
            num_classes=t.num_classes, embed_dim=enc.embed_dim,
            ffn_embed_dim=enc.ffn_embed_dim, heads=enc.attention_heads,
            layers=enc.layers, bucket_size=t.image_size // 16,
            num_frames=t.num_frames, drop_path_rate=enc.drop_path_rate,
            checkpoint_activations=enc.checkpoint_activations)

    def valid_step(self, model, params, batch):
        import jax
        import jax.numpy as jnp

        x = batch["src_videos"]
        if x.ndim == 6:
            # multi-view testing (B, V, T, 3, S, S): run every view and
            # average the softmax probabilities per clip (ref
            # _base_/models/onepeace.py:23 average_clips='prob')
            def mv_pred(p, x):
                flat = x.reshape((-1,) + x.shape[2:])
                probs = jax.nn.softmax(model(p, flat), axis=-1)
                probs = probs.reshape(x.shape[0], x.shape[1], -1).mean(1)
                return jnp.argmax(probs, axis=-1).astype(jnp.int32)

            pred = self._jit("video_pred_mv", mv_pred)(params, jnp.asarray(x))
        else:
            fn = self._jit("video_pred", lambda p, x: jnp.argmax(
                model(p, x), axis=-1).astype(jnp.int32))
            pred = fn(params, x)  # stays on device
        target = jnp.asarray(batch["target"])
        self.metric.compute(ncorrect=(pred == target).sum(),
                            count=int(pred.shape[0]))
