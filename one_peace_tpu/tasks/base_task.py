"""Task base: dictionary/BPE setup, TSV loading, iterator construction.

Behavioral spec: ref one_peace/tasks/base_task.py:27-234 — GPT-2 BPE +
dict from ``bpe_dir``, TSV shard expansion, batch iterator with
``ensure_equal_batch``, per-task dataset/criterion/metric wiring.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from ..core.config import FrameworkConfig, TaskConfig
from ..data.collate import collate
from ..data.iterators import EpochBatchIterator
from ..data.tokenizer import TextTokenizer, find_bpe_dir
from ..data.tsv import load_tables


class BaseTask:
    dataset_cls = None  # set by subclasses
    criterion_name = ""

    def __init__(self, cfg: TaskConfig, framework_cfg: Optional[FrameworkConfig] = None):
        self.cfg = cfg
        self.framework_cfg = framework_cfg
        bpe_dir = find_bpe_dir(cfg.bpe_dir or None)
        if bpe_dir is None:
            raise FileNotFoundError(
                "BPE assets not found; set task.bpe_dir or $ONE_PEACE_BPE_DIR")
        self.tokenizer = TextTokenizer(bpe_dir, max_src_length=cfg.max_src_length)
        self.datasets: Dict[str, object] = {}

    # ------------------------------------------------------------------

    @property
    def dictionary(self):
        return self.tokenizer.dictionary

    def dataset_kwargs(self) -> Dict:
        """Per-task constructor args drawn from the task config."""
        return {
            "max_src_length": self.cfg.max_src_length,
            "patch_image_size": self.cfg.patch_image_size,
        }

    def audio_conv_spec(self):
        """The model's audio-frontend frame arithmetic, interpolated into
        the data layer so padding/block masks use the model's actual
        frame count (ref base_task.py:65: the task reads the model's conv
        spec via II('model.encoder.audio_adapter.feature_encoder_spec')).

        The fbank frontend's frame count, 1 + (len - n_fft) // hop
        (ops/preprocess.py LogMelFbank.num_frames), is exactly a
        one-layer conv recurrence — expressed here as ((0, n_fft, hop),)
        so every dataset's conv_output_length computes the right length
        for either frontend."""
        fc = self.framework_cfg
        if fc is not None:
            ad = fc.model.encoder.audio_adapter
            if getattr(ad, "frontend", "waveform") == "fbank":
                return ((0, ad.fbank_n_fft, ad.fbank_hop),)
            return tuple(tuple(layer) for layer in ad.feature_encoder_spec)
        from ..data.datasets import DEFAULT_SPEC

        return DEFAULT_SPEC

    def load_dataset(self, split: str):
        spec = self.cfg.data if split == "train" else self.cfg.valid_data
        table = load_tables(spec, self.cfg.selected_cols or None,
                            self.cfg.reader_separator)
        dataset_dir = os.path.dirname(os.path.abspath(
            spec.split(",")[0])) if spec else ""
        self.datasets[split] = self.dataset_cls(
            split, table, self.tokenizer, dataset_dir=dataset_dir,
            **self.dataset_kwargs())
        return self.datasets[split]

    def get_batch_iterator(self, split: str, batch_size: int, seed: int = 3407,
                           shard_id: int = 0, num_shards: int = 1,
                           ensure_equal_batch: bool = True,
                           skip_remainder_batch: bool = False) -> EpochBatchIterator:
        dataset = self.datasets[split]
        pad = self.tokenizer.pad
        return EpochBatchIterator(
            dataset,
            collate_fn=lambda samples: collate(samples, pad_idx=pad),
            batch_size=batch_size,
            seed=seed,
            shard_id=shard_id,
            num_shards=num_shards,
            shuffle=(split == "train"),
            ensure_equal_batch=ensure_equal_batch,
            skip_remainder_batch=skip_remainder_batch,
        )

    # evaluation hooks (overridden per task family)
    def begin_valid_epoch(self, model, params):
        pass

    def valid_step(self, model, params, batch):
        raise NotImplementedError

    def merge_results(self) -> Dict:
        raise NotImplementedError

    def eval_model(self, model, params, net_input, **static_kw):
        """Jitted, shape-bucketed eval forward — every task eval loop goes
        through here instead of dispatching the model eagerly."""
        from .jit_eval import JitEvaluator

        ev = getattr(self, "_jit_eval", None)
        if ev is None or ev.model is not model:
            ev = self._jit_eval = JitEvaluator(model)
        return ev(params, net_input, **static_kw)

    @property
    def eval_compiles(self) -> int:
        ev = getattr(self, "_jit_eval", None)
        return ev.n_compiles if ev is not None else 0
