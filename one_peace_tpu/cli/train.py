"""Training entry point.

Replaces ref one_peace/train.py:47-199: config layering (defaults <- YAML
<- CLI dot-overrides), task/model/criterion construction, epoch loop with
validate-and-save, preemption-safe resume.  No torchrun/process bootstrap:
one host process drives the whole mesh via pjit.

Usage:
  python -m one_peace_tpu.cli.train --config path/to/task.yaml \
      [task.data=... optimization.lr=3e-4 ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional


logger = logging.getLogger("one_peace_tpu.train")


def build_model_for_task(cfg, task):
    from .. import models  # noqa: F401  (populates the registry)
    from ..core.registry import MODELS

    if hasattr(task, "build_model"):
        # vision-transfer tasks assemble their own zoo model from the
        # encoder dims + task fields (tasks/vision_tasks.py)
        return task.build_model(cfg)
    name = cfg.model._name
    cfg.model.encoder.image_adapter.rel_bucket_size = cfg.task.patch_image_size // 16
    cfg.model.encoder.text_adapter.vocab_size = len(task.dictionary)
    cfg.model.head_type = cfg.task.head_type
    cls = MODELS.get(name)
    if name == "one_peace_classify":
        return cls(cfg.model, num_classes=getattr(cfg.task, "num_classes", 2))
    return cls(cfg.model)


def main(argv: Optional[list] = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--user-dir", default=None,
                        help="plugin module dir with extra @register'd "
                             "tasks/models/criterions")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    if args.user_dir:
        from ..core.registry import load_user_module

        load_user_module(args.user_dir)

    from ..core.config import load_config
    from ..core.metrics import ProgressLogger, aggregate, log_scalar
    from ..criterions import build_criterion
    from ..tasks import build_task
    from ..trainer import Trainer
    from ..utils import native_checkpoint as ckpt

    cfg = load_config(args.config, args.overrides)
    logging.basicConfig(level=logging.INFO)
    _BEST_METRIC["value"] = None  # fresh run (in-process reuse in tests)

    task = build_task(cfg.task, cfg)
    if not cfg.criterion._name:
        cfg.criterion._name = type(task).criterion_name
    model = build_model_for_task(cfg, task)
    criterion = build_criterion(cfg.criterion)

    task.load_dataset("train")
    if cfg.task.valid_data:
        task.load_dataset("valid")

    params = None
    if cfg.checkpoint.restore_file and os.path.exists(cfg.checkpoint.restore_file):
        path = cfg.checkpoint.restore_file
        if path.endswith(".pt") and hasattr(model, "load_pretrained"):
            # vision-transfer init from a pretrain checkpoint: trunk from
            # the .pt, task heads fresh (ref strict=False load)
            from ..utils.checkpoint_convert import load_torch_state_dict

            params = model.load_pretrained(load_torch_state_dict(path))
        elif path.endswith(".pt"):
            from ..utils.checkpoint_convert import (
                convert_retrieval_model, load_torch_state_dict, to_jax)

            params = to_jax(convert_retrieval_model(
                load_torch_state_dict(path), cfg.model))
        else:
            params = ckpt.load_params(path)

    if (params is not None and cfg.model._name == "one_peace_pretrain"
            and (cfg.model.stage2_pretrain or cfg.model.reset_logit_scale)):
        # stage-2 AL pretrain: overlay the stage-1 (VL) checkpoint onto a
        # fresh stage-2 tree — audio branch fresh, logit_scale optionally
        # reset (ref one_peace_pretrain.py:181-198, pretrain_al_3B.yaml)
        params = model.upgrade_stage1_params(params, seed=cfg.common.seed)

    trainer = Trainer(cfg, model, criterion, params=params)

    from ..core.metrics import build_sinks

    progress = ProgressLogger(cfg.common.log_format, cfg.common.log_interval,
                              cfg.common.tensorboard_logdir,
                              sinks=build_sinks(cfg.common))
    # tag split mirrors the reference's progress bars: per-update stats go
    # out as "train_inner", epoch aggregates as "train", validation as
    # "valid" (ref logging/progress_bar.py + train.py tag wiring) — same
    # sink objects, so a validation "loss" lands in valid/loss and the
    # epoch summary never collides with the per-step point at one step
    inner_progress = ProgressLogger(cfg.common.log_format,
                                    cfg.common.log_interval,
                                    tag="train_inner", sinks=progress.sinks)
    valid_progress = ProgressLogger(cfg.common.log_format,
                                    cfg.common.log_interval, tag="valid",
                                    sinks=progress.sinks)
    itr = task.get_batch_iterator(
        "train", cfg.dataset.batch_size, seed=cfg.common.seed,
        ensure_equal_batch=cfg.dataset.ensure_equal_batch,
        skip_remainder_batch=cfg.optimization.skip_remainder_batch)

    def full_state():
        """Everything needed for exact resume: trainer bundle (params, opt,
        step, rng, EMA, loss scale, train time) + iterator offset + best
        metric (ref trainer.py:365-400 + checkpoint_utils.py:37-189)."""
        return {
            "trainer": trainer.state_dict(),
            "iterator": itr.state_dict(),
            "best_metric": float("nan") if _BEST_METRIC["value"] is None
            else float(_BEST_METRIC["value"]),
        }

    # preemption resume: restores mid-epoch iterator position and EMA
    latest = ckpt.latest_checkpoint(cfg.checkpoint.save_dir)
    if latest and not cfg.checkpoint.reset_optimizer:
        logger.info("resuming from %s", latest)
        try:
            state = ckpt.restore_train_state(latest, full_state())
        except Exception:
            # legacy bundle (flat trainer state at top level, no iterator/
            # best-metric): restore what exists instead of refusing to boot
            logger.warning("checkpoint %s predates the nested train-state "
                           "bundle; resuming trainer state only", latest)
            state = {"trainer": ckpt.restore_train_state(
                latest, trainer.state_dict())}
        trainer.load_state_dict(state["trainer"])
        if "iterator" in state:
            itr.load_state_dict(state["iterator"])
        best = float(state.get("best_metric", float("nan")))
        _BEST_METRIC["value"] = None if best != best else best

    def save(step):
        ckpt.save_train_state(cfg.checkpoint.save_dir, step, full_state(),
                              keep=cfg.checkpoint.keep_last_epochs)

    max_update = cfg.optimization.max_update or int(1e9)
    max_epoch = cfg.optimization.max_epoch or int(1e9)

    import jax

    tracing = False
    last_val_step = -1
    last_save_step = -1

    def run_validation():
        nonlocal last_val_step
        with jax.profiler.TraceAnnotation("validate"):
            stats = validate(cfg, task, model, trainer, valid_progress)
        _maybe_save_best(cfg, trainer, stats)
        last_val_step = trainer.step

    while trainer.step < max_update and itr.epoch <= max_epoch:
        epoch = itr.epoch
        with aggregate(new_root=True) as agg:
            for batch in itr.next_epoch_itr():
                if cfg.common.profile_dir:
                    # window membership, not equality: resume can land
                    # inside [start, stop), and stop must never fire
                    # without a matching start
                    in_window = (cfg.common.profile_start <= trainer.step
                                 < cfg.common.profile_stop)
                    if in_window and not tracing:
                        jax.profiler.start_trace(cfg.common.profile_dir)
                        tracing = True
                    elif tracing and not in_window:
                        jax.profiler.stop_trace()
                        tracing = False
                prev_step = trainer.step
                metrics = trainer.train_step(batch)
                for k, v in metrics.items():
                    log_scalar(k, v)
                # per-UPDATE logging (ref train.py iterates grouped batches,
                # one log per update): under gradient accumulation only the
                # boundary micro-batch advances trainer.step — logging every
                # micro-batch would emit update_freq duplicate sink points
                # at one step (wandb.log step-monotonicity, dup TB points)
                if trainer.step != prev_step:
                    inner_progress.log(metrics, trainer.step)
                # interval actions fire once per OPTIMIZER update: under
                # gradient accumulation trainer.step holds its value for
                # update_freq micro-batches, so gate on it advancing
                if (trainer.step > 0 and trainer.step != last_val_step
                        and _should_validate(cfg, task, trainer.step, epoch,
                                             end_of_epoch=False)):
                    # mid-epoch validation (ref train.py:345-358:
                    # validate_interval_updates + validate-on-interval-save);
                    # runs BEFORE the interval save so a resumed state
                    # carries the updated best metric
                    run_validation()
                if (cfg.checkpoint.save_interval_updates
                        and trainer.step > 0
                        and trainer.step != last_save_step
                        and trainer.step % cfg.checkpoint.save_interval_updates == 0):
                    save(trainer.step)
                    last_save_step = trainer.step
                if trainer.step >= max_update:
                    break
            progress.print(agg.as_dict(), trainer.step)

        if (_should_validate(cfg, task, trainer.step, epoch, end_of_epoch=True)
                and trainer.step != last_val_step):
            run_validation()
        if epoch % cfg.checkpoint.save_interval == 0:
            with jax.profiler.TraceAnnotation("checkpoint_save"):
                save(trainer.step)
    if tracing:  # run ended inside the profile window
        jax.profiler.stop_trace()
    ckpt.wait_for_saves()
    progress.close()
    return 0


_BEST_METRIC = {"value": None}


def _should_validate(cfg, task, step: int, epoch: int,
                     end_of_epoch: bool) -> bool:
    """ref train.py:345-358 do_validate: epoch-interval at epoch ends,
    every ``validate_interval_updates`` updates mid-epoch, and alongside
    mid-epoch interval saves; all gated on validate_after_updates."""
    ds = cfg.dataset
    if not cfg.task.valid_data or ds.disable_validation:
        return False
    if step < ds.validate_after_updates:
        return False
    if end_of_epoch:
        return epoch % ds.validate_interval == 0
    if (cfg.checkpoint.save_interval_updates
            and step % cfg.checkpoint.save_interval_updates == 0):
        return True
    return bool(ds.validate_interval_updates
                and step % ds.validate_interval_updates == 0)


def _eval_params_source(cfg, task, trainer):
    """The parameter tree validation should score: the EMA shadow when one
    is kept and the task consumes it (ref trainer.py:962-966 passes the
    EMA model into valid_step; the classification finetunes evaluate and
    best-export EMA weights), raw train params otherwise."""
    if trainer.ema is not None and getattr(task, "uses_ema",
                                           cfg.ema.ema_eval):
        return trainer.ema.params()
    return trainer.params


def _maybe_save_best(cfg, trainer, stats, eval_params=None):
    """Track best_checkpoint_metric and export best params
    (ref checkpoint_utils.py save policy: best/last/interval).  Exports
    the SAME tree validation scored — the EMA shadow when EMA eval is on
    (``stats["_eval_params"]`` carries it from validate)."""
    from ..utils import native_checkpoint as ckpt

    if eval_params is None and stats:
        eval_params = stats.get("_eval_params")
    key = cfg.checkpoint.best_checkpoint_metric
    if not key or not stats or key not in stats:
        return
    value = stats[key]
    best = _BEST_METRIC["value"]
    better = (best is None or
              (value > best if cfg.checkpoint.maximize_best_checkpoint_metric
               else value < best))
    export = eval_params if eval_params is not None else trainer.params
    if better:
        _BEST_METRIC["value"] = value
        import os

        path = os.path.join(cfg.checkpoint.save_dir, "checkpoint_best.npz")
        ckpt.save_params(
            path, export, metadata={key: float(value), "step": trainer.step})
        logger.info("new best %s=%.4f -> %s", key, value, path)
    if cfg.checkpoint.keep_best_checkpoints > 0:
        # k-best retention (ref checkpoint_utils.py keep_best_checkpoints):
        # ranked by filename, independent of the single-best export above
        kpath = ckpt.save_best_k(
            cfg.checkpoint.save_dir, key, float(value),
            cfg.checkpoint.maximize_best_checkpoint_metric,
            cfg.checkpoint.keep_best_checkpoints, export, trainer.step)
        if kpath:
            logger.info("k-best export %s=%.4f -> %s", key, value, kpath)


def validate(cfg, task, model, trainer, progress):
    from ..metrics.metrics import fetch_once
    from ..trainer import cast_floats

    source = _eval_params_source(cfg, task, trainer)
    params = source
    if trainer.compute_dtype is not None:
        params = cast_floats(params, trainer.compute_dtype)
    fetches_before = fetch_once.calls
    task.begin_valid_epoch(model, params)
    itr = task.get_batch_iterator("valid", cfg.dataset.batch_size_valid,
                                  ensure_equal_batch=False)
    for batch in itr.next_epoch_itr():
        task.valid_step(model, params, batch)
    stats = task.merge_results()
    stats = {k: v for k, v in stats.items() if isinstance(v, (int, float))}
    # deferred-metrics audit (same as cli/evaluate.py): the whole pass
    # should fetch O(1) times — per-batch fetches cost ~150 ms tunnel RTT
    stats["eval_batched_fetches"] = fetch_once.calls - fetches_before
    progress.print(stats, trainer.step)
    stats["_eval_params"] = source
    return stats


if __name__ == "__main__":
    sys.exit(main())
