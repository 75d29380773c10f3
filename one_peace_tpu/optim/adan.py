"""Adan optimizer as an optax gradient transformation.

Behavioral spec: ref one_peace/optim/adan.py:118-225 — Nesterov-style
momentum on the gradient difference:

  m_t = b1 m + (1-b1) g
  d_t = b2 d + (1-b2) (g - g_prev)
  v_t = b3 v + (1-b3) (g + b2 (g - g_prev))^2
  update = (m_t/bc1 + b2 d_t/bc2) / (sqrt(v_t/bc3) + eps)
  p <- (p - lr * update) / (1 + lr * wd)        (proximal form)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    d: optax.Updates
    prev_grad: optax.Updates


def scale_by_adan(
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return AdanState(jnp.zeros([], jnp.int32), zeros(), zeros(), zeros(), zeros())

    def update_fn(grads, state, params=None):
        count = state.count + 1
        # the first step uses pre_grad = grad (diff = 0), ref :198-200
        is_first = state.count == 0
        prev = jax.tree.map(
            lambda g, pg: jnp.where(is_first, g, pg), grads, state.prev_grad)
        diff = jax.tree.map(lambda g, p: g - p, grads, prev)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        d = jax.tree.map(lambda d_, df: b2 * d_ + (1 - b2) * df, state.d, diff)
        v = jax.tree.map(
            lambda v_, g, df: b3 * v_ + (1 - b3) * jnp.square(g + b2 * df),
            state.v, grads, diff)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        bc3 = 1 - b3 ** count.astype(jnp.float32)
        updates = jax.tree.map(
            lambda m_, d_, v_: (m_ / bc1 + b2 * d_ / bc2)
            / (jnp.sqrt(v_ / bc3) + eps),
            m, d, v)
        return updates, AdanState(count, m, v, d, grads)

    return optax.GradientTransformation(init_fn, update_fn)


def proximal_weight_decay(weight_decay: float, lr_schedule) -> optax.GradientTransformation:
    """Adan's proximal decay: p <- (p + update) / (1 + lr*wd), folded into
    the additive update (requires params)."""

    def init_fn(params):
        return optax.ScaleByScheduleState(jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        lr = lr_schedule(state.count)
        factor = 1.0 / (1.0 + lr * weight_decay)
        new = jax.tree.map(
            lambda u, p: (p + u) * factor - p, updates, params)
        return new, optax.ScaleByScheduleState(state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def adan(lr_schedule, betas=(0.98, 0.92, 0.99), eps: float = 1e-8,
         weight_decay: float = 0.0, clip_norm: float = 0.0):
    chain = []
    if clip_norm and clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(scale_by_adan(betas, eps))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    if weight_decay:
        chain.append(proximal_weight_decay(weight_decay, lr_schedule))
    return optax.chain(*chain)
