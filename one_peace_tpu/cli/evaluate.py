"""Evaluation entry point (ref one_peace/evaluate.py:47-194).

Loads a checkpoint, runs the task's evaluation loop, dumps metrics JSON.

Usage:
  python -m one_peace_tpu.cli.evaluate --config eval.yaml \
      --path /path/to/ckpt.(pt|npz) [task.<k>=v ...]

(The reference spells the checkpoint as a ``common_eval.path`` override;
here it is the ``--path`` flag — there is no common_eval config section.)
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import Optional

logger = logging.getLogger("one_peace_tpu.evaluate")


def main(argv: Optional[list] = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--path", required=True, help="checkpoint path (.pt/.npz)")
    parser.add_argument("--output", default=None, help="metrics JSON output path")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from ..core.config import load_config
    from ..hub import from_pretrained
    from ..tasks import build_task

    cfg = load_config(args.config, args.overrides)
    logging.basicConfig(level=logging.INFO)

    task = build_task(cfg.task, cfg)
    if hasattr(task, "build_model"):
        # vision-transfer tasks: zoo model + raw params checkpoint
        import jax.numpy as jnp

        model = task.build_model(cfg)
        dtype = jnp.bfloat16 if cfg.common.bf16 else jnp.float32
        if args.path.endswith(".pt"):
            from ..utils.checkpoint_convert import load_torch_state_dict

            params = model.load_pretrained(load_torch_state_dict(args.path),
                                           dtype=dtype)
        else:
            from ..utils import native_checkpoint as ckpt

            from ..trainer import cast_floats

            params = cast_floats(ckpt.load_params(args.path), dtype)
    else:
        cfg.model.encoder.text_adapter.vocab_size = len(task.dictionary)
        cfg.model.head_type = cfg.task.head_type
        cfg.model.encoder.image_adapter.rel_bucket_size = cfg.task.patch_image_size // 16
        hub = from_pretrained(
            args.path, model_type=cfg.model._name,
            dtype="bf16" if cfg.common.bf16 else "float32",
            bpe_dir=cfg.task.bpe_dir or None,
            model_cfg=cfg.model, task_cfg=cfg.task,
            num_classes=cfg.task.num_classes)
        model, params = hub.model, hub.params

    import time

    from ..metrics.metrics import fetch_once

    task.load_dataset("valid")
    t0 = time.time()
    fetches_before = fetch_once.calls
    task.begin_valid_epoch(model, params)
    itr = task.get_batch_iterator("valid", cfg.dataset.batch_size_valid,
                                  ensure_equal_batch=False)
    for batch in itr.next_epoch_itr():
        task.valid_step(model, params, batch)
    stats = task.merge_results()
    stats["eval_wall_s"] = round(time.time() - t0, 3)
    stats["eval_compiled_programs"] = task.eval_compiles
    # deferred-metrics audit: the whole pass should fetch O(1) times
    # (per-batch fetches cost a ~150 ms tunnel RTT each on axon)
    stats["eval_batched_fetches"] = fetch_once.calls - fetches_before
    printable = {k: v for k, v in stats.items() if isinstance(v, (int, float))}
    print(json.dumps(printable, indent=2))
    if args.output:
        with open(args.output, "w") as fh:
            json.dump(printable, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
