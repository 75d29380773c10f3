"""LR schedules.

``adjust_cosine`` semantics (ref: one_peace/optim/lr_scheduler/
cosine_lr_scheduler.py:18-174): warmup by updates or by ratio of total
updates, then cosine decay from peak lr to min_lr over the remaining
updates.  ``polynomial_decay`` for completeness.
"""

from __future__ import annotations

import math

from ..core.config import LRSchedulerConfig, OptimizationConfig
from ..core.registry import LR_SCHEDULERS


@LR_SCHEDULERS.register("cosine")
def cosine_schedule(cfg: LRSchedulerConfig, opt: OptimizationConfig, total_updates: int):
    peak = opt.lr
    min_lr = cfg.min_lr
    warmup = cfg.warmup_updates
    if warmup == 0 and cfg.warmup_ratio > 0:
        warmup = int(total_updates * cfg.warmup_ratio)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = peak * step / max(warmup, 1)
        t = jnp.clip((step - warmup) / max(total_updates - warmup, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (peak - min_lr) * (1 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup, warm, cos)

    return schedule


@LR_SCHEDULERS.register("polynomial_decay")
def polynomial_schedule(cfg: LRSchedulerConfig, opt: OptimizationConfig,
                        total_updates: int, power: float = 1.0):
    peak = opt.lr
    end = cfg.min_lr
    warmup = cfg.warmup_updates
    if warmup == 0 and cfg.warmup_ratio > 0:
        warmup = int(total_updates * cfg.warmup_ratio)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = peak * step / max(warmup, 1)
        t = jnp.clip((step - warmup) / max(total_updates - warmup, 1), 0.0, 1.0)
        poly = (peak - end) * (1 - t) ** power + end
        return jnp.where(step < warmup, warm, poly)

    return schedule


def build_lr_schedule(cfg: LRSchedulerConfig, opt: OptimizationConfig,
                      total_updates: int):
    name = cfg._name or "cosine"
    # accept the reference registry names too
    aliases = {"adjust_cosine": "cosine"}
    return LR_SCHEDULERS.get(aliases.get(name, name))(cfg, opt, total_updates)
