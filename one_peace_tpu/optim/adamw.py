"""Optimizer construction (optax).

Replaces Apex FusedAdam / DistributedFusedAdam + fairseq's param-group
machinery (ref: one_peace/optim/adam.py:51-253, utils/layer_decay.py:8-77,
trainer.py:265-342):

- AdamW with configurable betas/eps/weight_decay;
- *no-decay groups*: weight decay masked off for params with ndim <= 1,
  biases, and the model's ``no_weight_decay`` set (cls embeddings, abs pos
  tables — ref one_peace_base.py:251-259), matching ``--no-bias-decay``;
- *layer decay*: per-parameter LR multiplier decay^(L+1-layer_id) where
  layer_id is 0 for adapters, i+1 for encoder layer i, L+1 for heads
  (ref utils/layer_decay.py:8-31).  Implemented as a gradient transform
  multiplying updates by a per-leaf scale tree — sharding-transparent;
- ZeRO-1: optimizer state inherits each param's sharding automatically
  under pjit (SURVEY.md §2.3).

Update rule matches torch AdamW: decoupled weight decay applied as
``p -= lr * wd * p`` scaled by the *scheduled* lr, and Adam with
bias correction.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import OptimizationConfig, OptimizerConfig


# ---------------------------------------------------------------------------
# param classification
# ---------------------------------------------------------------------------

NO_WEIGHT_DECAY_SUFFIXES = (
    "embed_positions",
    "cls_embedding",
    "pos_embed",
    "cls_pos_embed",
)


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def decay_mask(params) -> Any:
    """True where weight decay applies (ref layer_decay.py:52-55:
    ndim <= 1 or bias or skip-list -> no decay).

    Stacked encoder-layer leaves carry a leading ``layers`` axis, so the
    effective ndim there is leaf.ndim - 1.
    """

    def mask_leaf(kp, leaf):
        path = _path_str(kp)
        ndim = np.ndim(leaf)
        if "win_layers/" in path:
            ndim -= 2  # stacked (groups, windowed-per-group) leaf
        elif "layers/" in path or path.startswith("layers"):
            ndim -= 1  # stacked per-layer leaf
        if ndim <= 1:
            return False
        if path.endswith("/b") or path.endswith("bias"):
            return False
        if any(path.endswith(s) for s in NO_WEIGHT_DECAY_SUFFIXES):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def layer_id_for_path(path: str, num_layers: int) -> Optional[int]:
    """ref utils/layer_decay.py:8-21 (get_num_layer).  Returns None for
    the stacked encoder-layer subtree (handled per-slice).

    Also understands the vision-transfer zoo trees (vision/zoo.py), mapping
    them the way the reference apps do:
    - det (ref det/models/onepeace.py:632-653 get_onepeace_lr_decay_rate):
      ``backbone/image_adapter`` -> 0, trunk layers -> i+1, everything
      else (fpn/proposer/heads/shared rel table) -> L+1;
    - seg (ref seg/optimizer/onepeace_layer_decay_optimizer_constructor.py
      :9-29 get_layer_id_for_vit): ``backbone/image_adapter`` -> 0,
      ``backbone/encoder/layers`` -> i+1, else -> L+1.
    """
    p = re.sub(r"^encoder_wrapper/", "", path)
    if p.startswith(("text_adapter", "image_adapter", "audio_adapter")):
        if "rel_pos_table" in p:
            return None  # per-layer tables: scale per leading index
        return 0
    if p.startswith("fusion/layers") or "/fusion/layers" in path:
        return None  # stacked: vector of scales
    if p.startswith("backbone/"):
        q = p[len("backbone/"):]
        if q.startswith("image_adapter"):
            if "rel_pos_table" in q:
                return None  # per-layer tables: scale per leading index
            return 0
        if q.startswith(("win_layers", "glob_layers")):
            return None  # det trunk: stacked (groups[, nwin]) leaves
        if q.startswith(("encoder/layers", "layers")):
            return None  # seg/video trunk: stacked per-layer leaves
        return num_layers + 1  # shared rel table, final norms, ...
    return num_layers + 1


def layer_decay_scales(params, num_layers: int, decay: float) -> Any:
    """Per-leaf LR multiplier tree; stacked leaves get a broadcastable
    per-layer vector (decay^(L+1-(i+1)) for layer i)."""
    max_layer = num_layers + 2  # ids 0..L+1 -> len L+2 values
    values = [decay ** (max_layer - 1 - i) for i in range(max_layer)]

    def scale_leaf(kp, leaf):
        path = _path_str(kp)
        lid = layer_id_for_path(path, num_layers)
        if lid is not None:
            return jnp.asarray(values[lid], jnp.float32)
        if "win_layers/" in path:
            # det trunk windowed stack: leading axes (groups, period-1);
            # layer index of (g, j) is g*period + j (ref det/models/
            # onepeace.py:646-647: .layers.<i>. -> i+1)
            g, nw = np.shape(leaf)[:2]
            period = num_layers // g
            mat = jnp.asarray(
                [[values[min(gi * period + j + 1, max_layer - 1)]
                  for j in range(nw)] for gi in range(g)], jnp.float32)
            return mat.reshape((g, nw) + (1,) * (np.ndim(leaf) - 2))
        n = np.shape(leaf)[0]
        if "glob_layers/" in path:
            # det trunk global stack: group g holds layer g*period+period-1
            period = num_layers // n
            ids = [min(gi * period + period, max_layer - 1) for gi in range(n)]
        elif "rel_pos_table" in path:
            ids = [min(i + 1, max_layer - 1) if n > 1 else 1 for i in range(n)]
        else:
            ids = [i + 1 for i in range(n)]
        vec = jnp.asarray([values[i] for i in ids], jnp.float32)
        return vec.reshape((n,) + (1,) * (np.ndim(leaf) - 1))

    return jax.tree_util.tree_map_with_path(scale_leaf, params)


def scale_by_tree(scales) -> optax.GradientTransformation:
    """Multiply updates by a per-leaf (broadcastable) scale tree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        # MaskedNode-safe: under a trainable_mask (optax.multi_transform)
        # frozen leaves arrive as optax.MaskedNode sentinels — pass them
        # through instead of pairing them with the full-shaped scale tree
        def mul(u, s):
            if isinstance(u, optax.MaskedNode):
                return u
            return u * s.astype(u.dtype)

        new = jax.tree.map(
            mul, updates, scales,
            is_leaf=lambda x: isinstance(x, optax.MaskedNode))
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# optimizer assembly
# ---------------------------------------------------------------------------


def build_optimizer(
    cfg: OptimizerConfig,
    opt_cfg: OptimizationConfig,
    lr_schedule: Callable,
    params,
    num_layers: int = 40,
) -> optax.GradientTransformation:
    """AdamW or Adan (+ optional layer decay, + global clip) as one optax
    chain.  ``optimizer.use_adan`` (or ``_name: adan``) selects Adan
    (ref optim/adan.py:53-223) — same clip/layer-decay plumbing, but
    scale_by_adan and the proximal post-update decay replace
    scale_by_adam + decoupled decay."""
    if getattr(cfg, "use_adan", False) or cfg._name == "adan":
        from .adan import proximal_weight_decay, scale_by_adan

        chain = []
        if opt_cfg.clip_norm and opt_cfg.clip_norm > 0:
            chain.append(optax.clip_by_global_norm(opt_cfg.clip_norm))
        chain.append(scale_by_adan(tuple(cfg.adan_betas), cfg.adam_eps))
        if opt_cfg.layer_decay and opt_cfg.layer_decay < 1.0:
            chain.append(scale_by_tree(
                layer_decay_scales(params, num_layers, opt_cfg.layer_decay)))
        chain.append(optax.scale_by_learning_rate(lr_schedule))
        if cfg.weight_decay:
            chain.append(proximal_weight_decay(cfg.weight_decay, lr_schedule))
        return optax.chain(*chain)

    chain = []
    if opt_cfg.clip_norm and opt_cfg.clip_norm > 0:
        chain.append(optax.clip_by_global_norm(opt_cfg.clip_norm))
    b1, b2 = cfg.adam_betas
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=cfg.adam_eps))
    if cfg.weight_decay:
        chain.append(
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask(params))
        )
    if opt_cfg.layer_decay and opt_cfg.layer_decay < 1.0:
        chain.append(
            scale_by_tree(layer_decay_scales(params, num_layers, opt_cfg.layer_decay))
        )
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)
