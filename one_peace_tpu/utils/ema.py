"""Exponential moving average of parameters.

Behavioral spec: ref one_peace/utils/ema_module.py:17-70 + trainer.py
EMA hooks (:243-251, 895-907): fp32 shadow copy, decay applied every
``ema_update_freq`` updates, optional start delay (copy-through before
``ema_start_update``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import EMAConfig


def _copy_tree(params, fp32: bool):
    # jnp.array forces a real device copy: ``astype`` on an already-fp32
    # leaf aliases the input, which the donating train step then deletes
    return jax.tree.map(
        lambda p: jnp.array(p, dtype=jnp.float32 if fp32 else p.dtype), params)


class EMA:
    def __init__(self, cfg: EMAConfig, params):
        self.cfg = cfg
        fp32 = cfg.ema_fp32
        # one jitted tree-copy: the eager per-leaf version costs one
        # remote dispatch per leaf per warmup step on axon (~100+ leaves)
        self._copy = jax.jit(lambda p: _copy_tree(p, fp32))
        self.shadow = self._copy(params)
        self._update = jax.jit(self._make_update())

    def _make_update(self):
        decay = self.cfg.ema_decay

        def update(shadow, params, skipped):
            # a skipped (non-finite) train step reverts params; the shadow
            # must not move either (ref aborts the whole update on overflow)
            keep = skipped > 0
            return jax.tree.map(
                lambda s, p: jnp.where(
                    keep, s, s * decay + p.astype(s.dtype) * (1 - decay)),
                shadow, params)

        return update

    def step(self, params, num_updates: int, skipped=0.0):
        cfg = self.cfg
        if num_updates < cfg.ema_start_update:
            # copy-through warmup (ref trainer: ema starts tracking late);
            # on a skipped step params were reverted, so the copy is a no-op
            self.shadow = self._copy(params)
        elif num_updates % cfg.ema_update_freq == 0:
            self.shadow = self._update(self.shadow, params,
                                       jnp.asarray(skipped, jnp.float32))

    def params(self, dtype=None):
        if dtype is None:
            return self.shadow
        return jax.tree.map(lambda s: s.astype(dtype), self.shadow)
