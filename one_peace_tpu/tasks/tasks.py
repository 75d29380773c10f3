"""Registered tasks (SURVEY.md §2.1 "Tasks").

Each task wires a dataset class + criterion + eval metric and implements
the reference's evaluation loops:

- retrieval tasks: embed all validation texts in ``begin_valid_epoch``
  (chunks of 50, optional "This is a sound of ..." template for zero-shot
  ESC-50 — ref tasks/audio_tasks/audio_text_retrieval.py:86), then embed
  the image/audio side per batch into a Recall reducer;
- classification tasks: accuracy / mAP reducers;
- refcoco: predicted boxes rescaled by the resize ratios to original
  coordinates before IoU@0.5 (ref tasks/vl_tasks/refcoco.py:24-48).
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from ..core.registry import TASKS
from ..data import datasets as D
from ..metrics import MAP, Accuracy, IouAcc, Recall
from .base_task import BaseTask


def _chunk(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


class RetrievalTaskMixin:
    """Shared valid-epoch recall flow (ref image_text_retrieval.py:32-110)."""

    side = "image"  # or "audio"

    def _load_valid_texts(self):
        self.text_ids, self.texts = [], []
        with open(self.cfg.valid_file) as fh:
            for text_id, text_list in json.load(fh).items():
                for text in text_list:
                    self.text_ids.append(int(text_id))
                    self.texts.append(text)

    def begin_valid_epoch(self, model, params):
        if not getattr(self, "texts", None):
            self._load_valid_texts()
        logits_list = []
        for batch_texts in _chunk(self.texts, 50):
            if self.cfg.use_template:
                batch_texts = ["This is a sound of " + t for t in batch_texts]
            tokens = self.tokenizer.encode_batch(list(batch_texts))
            out = self.eval_model(model, params, {"src_tokens": tokens},
                                  encoder_type="text")
            if isinstance(out, tuple):
                out = out[0]
            logits_list.append(out)  # device arrays; one fetch at merge
        self.metric.initialize(np.asarray(self.text_ids), logits_list)

    def valid_step(self, model, params, batch):
        if self.side == "image":
            out = self.eval_model(model, params,
                                  {"src_images": batch["src_images"]},
                                  encoder_type="image")
        else:
            out = self.eval_model(
                model, params,
                {"src_audios": batch["src_audios"],
                 "audio_padding_masks": batch["audio_padding_masks"]},
                encoder_type="audio")
        if isinstance(out, tuple):
            out = out[0]
        # no per-batch host fetch: the reducer stores the device array and
        # fetches everything once in merge_results (ref defers aggregation
        # to reduce_metrics the same way, logging/metrics.py:44-60)
        self.metric.compute(np.asarray(batch["id"]), out)

    def merge_results(self, output_predict: bool = False) -> Dict:
        stats = self.metric.merge_results(output_predict=output_predict)
        if self.side == "audio":
            # rename the Recall reducer's image-side keys for audio tasks
            # (ref audio_text_retrieval.py:118-125): prefix-precise, and
            # covering the prediction dumps ('predict_img') too
            for key in list(stats):
                if key.startswith("img"):
                    stats["audio" + key[len("img"):]] = stats.pop(key)
                elif key.startswith("predict_img"):
                    stats["predict_audio" + key[len("predict_img"):]] = \
                        stats.pop(key)
        return stats


@TASKS.register("image_text_retrieval")
class ImageTextRetrievalTask(RetrievalTaskMixin, BaseTask):
    dataset_cls = D.ImageTextRetrievalDataset
    criterion_name = "image_text_retrieval_criterion"
    side = "image"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = Recall()


@TASKS.register("audio_text_retrieval")
class AudioTextRetrievalTask(RetrievalTaskMixin, BaseTask):
    dataset_cls = D.AudioTextRetrievalDataset
    criterion_name = "audio_text_retrieval_criterion"
    side = "audio"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = Recall()

    def dataset_kwargs(self):
        return {"max_src_length": self.cfg.max_src_length,
                "max_duration": self.cfg.max_duration,
                "feature_encoder_spec": self.audio_conv_spec()}


@TASKS.register("image_text_pretrain")
class ImageTextPretrainTask(RetrievalTaskMixin, BaseTask):
    """Pretraining; validation = retrieval recall
    (ref tasks/pretrain_tasks/image_text_pretrain.py:52-136)."""

    dataset_cls = D.ImageTextPretrainDataset
    criterion_name = "image_text_pretrain_loss"
    side = "image"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = Recall()

    def dataset_kwargs(self):
        c = self.cfg
        return {
            "max_src_length": c.max_src_length,
            "patch_image_size": c.patch_image_size,
            "text_mask_ratio": c.text_mask_ratio,
            "image_mask_ratio": c.image_mask_ratio,
            "vl_text_mask_ratio": c.vl_text_mask_ratio,
            "vl_image_mask_ratio": c.vl_image_mask_ratio,
            "min_scale": c.min_scale,
        }

    def load_dataset(self, split: str):
        if split != "train":
            # validation uses the plain retrieval dataset (no masking)
            saved = self.dataset_cls
            self.dataset_cls = D.ImageTextRetrievalDataset
            kw = self.dataset_kwargs
            self.dataset_kwargs = lambda: {
                "max_src_length": self.cfg.max_src_length,
                "patch_image_size": self.cfg.patch_image_size,
            }
            try:
                return super().load_dataset(split)
            finally:
                self.dataset_cls = saved
                self.dataset_kwargs = kw
        return super().load_dataset(split)


@TASKS.register("audio_text_pretrain")
class AudioTextPretrainTask(RetrievalTaskMixin, BaseTask):
    dataset_cls = D.AudioTextPretrainDataset
    criterion_name = "audio_text_pretrain_loss"
    side = "audio"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = Recall()

    def dataset_kwargs(self):
        c = self.cfg
        return {
            "max_src_length": c.max_src_length,
            "max_duration": c.max_duration,
            "audio_mask_ratio": c.audio_mask_ratio,
            "al_text_mask_ratio": c.al_text_mask_ratio,
            "al_audio_mask_ratio": c.al_audio_mask_ratio,
            "feature_encoder_spec": self.audio_conv_spec(),
        }

    def load_dataset(self, split: str):
        if split != "train":
            saved = self.dataset_cls
            self.dataset_cls = D.AudioTextRetrievalDataset
            kw = self.dataset_kwargs
            self.dataset_kwargs = lambda: {
                "max_src_length": self.cfg.max_src_length,
                "max_duration": self.cfg.max_duration,
                "feature_encoder_spec": self.audio_conv_spec(),
            }
            try:
                return super().load_dataset(split)
            finally:
                self.dataset_cls = saved
                self.dataset_kwargs = kw
        return super().load_dataset(split)


class ClassifyTaskBase(BaseTask):
    """Accuracy-scored classification family."""

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = Accuracy()

    def begin_valid_epoch(self, model, params):
        self.metric.initialize()

    def _net_input(self, batch):
        keys = ("src_tokens", "src_images", "src_images_2", "src_audios",
                "audio_padding_masks")
        return {k: batch[k] for k in keys if k in batch}

    def valid_step(self, model, params, batch):
        logits = self.eval_model(model, params, self._net_input(batch))
        # device logits; the reducer defers the fetch to merge_results
        self.metric.compute(logits, np.asarray(batch["target"]))

    def merge_results(self) -> Dict:
        return self.metric.merge_results()


@TASKS.register("vqa")
class VqaTask(ClassifyTaskBase):
    """VQA scored with soft-target accuracy (ref tasks/vl_tasks/vqa.py)."""

    dataset_cls = D.VqaDataset
    criterion_name = "classify_criterion"

    def valid_step(self, model, params, batch):
        import jax.numpy as jnp

        logits = self.eval_model(model, params, self._net_input(batch))
        preds = logits.argmax(-1)  # on device
        targets = jnp.asarray(batch["target"])  # (B, answer_cnt) soft
        score = jnp.take_along_axis(targets, preds[:, None], axis=1).sum()
        self.metric.compute(ncorrect=score, count=int(preds.shape[0]))


@TASKS.register("nlvr2")
class Nlvr2Task(ClassifyTaskBase):
    dataset_cls = D.Nlvr2Dataset
    criterion_name = "classify_criterion"


@TASKS.register("image_classify")
class ImageClassifyTask(ClassifyTaskBase):
    dataset_cls = D.ImageClassifyDataset
    criterion_name = "classify_criterion"

    def dataset_kwargs(self):
        return {"patch_image_size": self.cfg.patch_image_size,
                "center_crop": self.cfg.center_crop}

    def get_batch_iterator(self, split, batch_size, **kw):
        """Training batches optionally pass through Mixup/CutMix after
        collation (ref image_classify_dataset.py:46-58 — mode/minmax
        forwarded), replacing hard labels with soft targets."""
        itr = super().get_batch_iterator(split, batch_size, **kw)
        c = self.cfg
        if split == "train" and (c.mixup > 0 or c.cutmix > 0):
            from ..data.mixup import Mixup

            minmax = (tuple(float(x) for x in c.cutmix_minmax.split(","))
                      if c.cutmix_minmax else None)
            mixer = Mixup(c.mixup, c.cutmix, c.mixup_prob, c.mixup_switch_prob,
                          c.label_smoothing, c.num_classes,
                          mode=c.mixup_mode, cutmix_minmax=minmax)
            base_collate = itr.collate_fn

            def collate_with_mixup(samples):
                batch = base_collate(samples)
                batch["src_images"], batch["target"] = mixer(
                    batch["src_images"], batch["target"])
                return batch

            itr.collate_fn = collate_with_mixup
        return itr


@TASKS.register("vggsound")
class VggsoundTask(ClassifyTaskBase):
    dataset_cls = D.VggsoundDataset
    criterion_name = "classify_criterion"

    def dataset_kwargs(self):
        return {"max_duration": self.cfg.max_duration,
                "feature_encoder_spec": self.audio_conv_spec()}


@TASKS.register("fsd50k")
class Fsd50kTask(BaseTask):
    """Multi-label audio tagging scored with mAP (ref tasks/audio_tasks)."""

    dataset_cls = D.Fsd50kDataset
    criterion_name = "classify_criterion"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = MAP()

    def dataset_kwargs(self):
        return {"max_duration": self.cfg.max_duration,
                "feature_encoder_spec": self.audio_conv_spec()}

    def begin_valid_epoch(self, model, params):
        self.metric.initialize()

    def valid_step(self, model, params, batch):
        logits = self.eval_model(
            model, params,
            {"src_audios": batch["src_audios"],
             "audio_padding_masks": batch["audio_padding_masks"]})
        self.metric.compute(batch["id"], logits, np.asarray(batch["target"]))

    def merge_results(self) -> Dict:
        return self.metric.merge_results()


@TASKS.register("aqa")
class AqaTask(ClassifyTaskBase):
    dataset_cls = D.AqaDataset
    criterion_name = "hinge_criterion"

    def dataset_kwargs(self):
        return {"max_src_length": self.cfg.max_src_length,
                "max_duration": self.cfg.max_duration,
                "feature_encoder_spec": self.audio_conv_spec()}

    def valid_step(self, model, params, batch):
        # shared with HingeCriterion via criterion.num_choices so train
        # and eval can never disagree on the answer grouping
        fc = self.framework_cfg
        num_choices = (getattr(fc.criterion, "num_choices", 4)
                       if fc is not None else 4)
        audios = np.repeat(np.asarray(batch["src_audios"]), num_choices, axis=0)
        pads = np.repeat(np.asarray(batch["audio_padding_masks"]), num_choices,
                         axis=0)
        logits = self.eval_model(
            model, params,
            {"src_tokens": batch["src_tokens"], "src_audios": audios,
             "audio_padding_masks": pads})
        logits = logits.reshape(-1, num_choices)  # device reshape
        self.metric.compute(logits, np.asarray(batch["target"]))


@TASKS.register("refcoco")
class RefCOCOTask(BaseTask):
    """Visual grounding, IoU Acc@0.5 with coordinate rescale
    (ref tasks/vl_tasks/refcoco.py:24-48)."""

    dataset_cls = D.RefCOCODataset
    criterion_name = "refcoco_criterion"

    def __init__(self, cfg, framework_cfg=None):
        super().__init__(cfg, framework_cfg)
        self.metric = IouAcc()
        self._pending = []

    def begin_valid_epoch(self, model, params):
        self.metric.initialize()
        self._pending = []

    def valid_step(self, model, params, batch):
        import jax.numpy as jnp

        coords = self.eval_model(model, params,
                                 {"src_tokens": batch["src_tokens"],
                                  "src_images": batch["src_images"]})
        # DEFERRED fetch: keep the device array; sigmoid/rescale/IoU run
        # once at merge over a single batched device_get (per-batch
        # np.asarray costs a ~150 ms tunnel RTT each on axon)
        w = np.asarray(batch["image_widths"])[:, None]
        h = np.asarray(batch["image_heights"])[:, None]
        self._pending.append({
            "coords": coords.astype(jnp.float32),
            "scale": np.concatenate([w, h, w, h], axis=1),
            "target": np.asarray(batch["region_coords"]),
        })

    def merge_results(self) -> Dict:
        from ..metrics.metrics import fetch_once

        fetched = fetch_once([p["coords"] for p in self._pending])
        for p, coords in zip(self._pending, fetched):
            pred = 1.0 / (1.0 + np.exp(-np.asarray(coords, np.float32)))
            self.metric.compute(pred * p["scale"], p["target"])
        self._pending = []
        return self.metric.merge_results()


def build_task(cfg, framework_cfg=None):
    return TASKS.get(cfg._name)(cfg, framework_cfg)
