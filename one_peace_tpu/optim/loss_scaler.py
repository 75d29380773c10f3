"""Dynamic loss scaling for fp16 training.

Behavioral spec: ref one_peace/optim/dynamic_loss_scaler.py:11-56 — scale
starts at ``init_scale``, halves on overflow (non-finite grads), doubles
after ``scale_window`` consecutive good steps; the step is skipped on
overflow.  On TPU bf16 needs no scaler (the trainer's default); this
exists for fp16 parity and runs entirely inside jit as a pure state
transition.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossScaleState(NamedTuple):
    scale: jnp.ndarray  # current loss scale (fp32 scalar)
    good_steps: jnp.ndarray  # consecutive finite steps (int32)


def init_loss_scale(init_scale: float = 2.0**15) -> LossScaleState:
    return LossScaleState(jnp.float32(init_scale), jnp.int32(0))


def update_loss_scale(
    state: LossScaleState,
    grads_finite: jnp.ndarray,
    scale_factor: float = 2.0,
    scale_window: int = 2000,
    min_scale: float = 1e-4,
) -> LossScaleState:
    """ref dynamic_loss_scaler.py:41-60 (shrink on overflow, grow on a full
    window of good steps)."""
    grown = state.good_steps + 1 >= scale_window
    new_scale = jnp.where(
        grads_finite,
        jnp.where(grown, state.scale * scale_factor, state.scale),
        jnp.maximum(state.scale / scale_factor, min_scale),
    )
    new_good = jnp.where(grads_finite & ~grown, state.good_steps + 1, 0)
    return LossScaleState(new_scale, new_good)


def scale_loss(state: LossScaleState, loss: jnp.ndarray) -> jnp.ndarray:
    return loss * state.scale.astype(loss.dtype)


def unscale_grads(state: LossScaleState, grads):
    inv = (1.0 / state.scale).astype(jnp.float32)
    return jax.tree.map(lambda g: g * inv.astype(g.dtype), grads)
