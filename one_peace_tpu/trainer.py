"""Trainer: the pjit training loop core.

Replaces the reference's Trainer (ref: one_peace/trainer.py:35-1375) with a
TPU-native design: one jitted ``train_step`` over the global batch with
parameter/optimizer-state sharding from parallel/sharding.py.  What the
reference does with explicit machinery, XLA does from annotations:

- grad all-reduce (trainer.py:804)           -> psum inserted by pjit
- ZeRO grad reduce-scatter (adam.py:67-93)   -> sharded opt state
- fp16/bf16 master-copy optimizers           -> fp32 params + bf16 compute
  (trainer.py:287-313)                          casts inside the loss
- grad-norm clip w/ all-reduced norm (:1064) -> optax.clip_by_global_norm
- NaN/Inf detector + skipped steps (:854)    -> finite-check on the global
                                                grad norm; step skipped by
                                                a where() on updates
- EMA (:895-907)                             -> utils/ema.py shadow tree

Gradient accumulation (``update_freq``) uses optax.MultiSteps — the
micro-step is still one jitted function (the reference loops micro-batches
with no_sync, trainer.py:724-742).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .core.config import FrameworkConfig
from .optim import build_lr_schedule, build_optimizer
from .parallel.mesh import make_mesh
from .parallel.sharding import batch_shardings, param_shardings, shard_params


def cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


class Trainer:
    def __init__(
        self,
        cfg: FrameworkConfig,
        model,
        criterion,
        params=None,
        mesh=None,
        total_updates: Optional[int] = None,
    ):
        self.cfg = cfg
        self.model = model
        self.criterion = criterion
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.distributed.dp, cfg.distributed.fsdp, cfg.distributed.tp,
            cfg.distributed.pp, sp=cfg.distributed.sp)
        if ("pp" in self.mesh.axis_names and self.mesh.shape["pp"] > 1
                and hasattr(model, "enable_pipeline")):
            model.enable_pipeline(self.mesh, cfg.distributed.pp_micro_batches)
        if self.mesh.devices.size > 1:
            # keep attn_impl='pallas' fused under the mesh (shard_map path)
            from .ops.attention import set_flash_mesh

            set_flash_mesh(self.mesh)
        if cfg.common.fp16:
            self.compute_dtype = jnp.float16
        elif cfg.common.bf16:
            self.compute_dtype = jnp.bfloat16
        else:
            self.compute_dtype = jnp.float32
        self.use_loss_scaling = cfg.common.fp16

        if params is None:
            params = model.init(jax.random.PRNGKey(cfg.common.seed))
        self.params = shard_params(self.mesh, params)

        total = total_updates or cfg.optimization.max_update or 100000
        self.lr_schedule = build_lr_schedule(cfg.lr_scheduler, cfg.optimization, total)
        tx = build_optimizer(
            cfg.optimizer, cfg.optimization, self.lr_schedule, self.params,
            num_layers=cfg.model.encoder.layers)
        if hasattr(model, "trainable_mask"):
            mask = model.trainable_mask(self.params)
            if not all(jax.tree.leaves(mask)):
                tx = _masked(tx, mask)
        if cfg.optimization.update_freq > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.optimization.update_freq)
        self._update_freq = max(int(cfg.optimization.update_freq), 1)
        self.tx = tx
        self.opt_state = jax.jit(
            tx.init,
            out_shardings=_opt_state_shardings(tx, self.mesh, self.params),
        )(self.params)

        # ``step`` counts OPTIMIZER updates (the reference's num_updates
        # unit — what max_update, lr schedules, validate/save intervals
        # and the EMA all mean); ``_micro`` counts train_step calls.
        # They differ only under gradient accumulation (update_freq > 1).
        self.step = 0
        self._micro = 0
        self.train_time = 0.0  # cumulative train seconds (ref trainer.py:365-400)
        self._rng = jax.random.PRNGKey(cfg.common.seed + 1)
        self._train_step = self._build_train_step()

        self.ema = None
        if cfg.ema.store_ema:
            from .utils.ema import EMA

            self.ema = EMA(cfg.ema, self.params)

    # ------------------------------------------------------------------

    def _build_train_step(self):
        compute_dtype = self.compute_dtype
        criterion = self.criterion
        model = self.model
        use_scaling = self.use_loss_scaling
        from .optim.loss_scaler import (
            init_loss_scale, scale_loss, unscale_grads, update_loss_scale)

        self.loss_scale = init_loss_scale() if use_scaling else None

        import inspect

        try:
            takes_updates = "num_updates" in inspect.signature(
                criterion.__call__).parameters
        except (TypeError, ValueError):
            takes_updates = False

        def step_fn(params, opt_state, step, batch, rng, scale_state):
            crit_kw = ({"num_updates": step // self._update_freq}
                       if takes_updates else {})

            def loss_fn(p):
                p_c = cast_floats(p, compute_dtype) if compute_dtype != jnp.float32 else p
                loss, metrics = criterion(model, p_c, batch, rng=rng,
                                          deterministic=False, **crit_kw)
                if use_scaling:
                    return scale_loss(scale_state, loss), metrics
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if use_scaling:
                grads = unscale_grads(scale_state, grads)
            gnorm = optax.global_norm(grads)
            finite = jnp.isfinite(gnorm)
            if use_scaling:
                scale_state = update_loss_scale(scale_state, finite)
                metrics = dict(metrics)
                metrics["loss_scale"] = scale_state.scale
            # skip the update on non-finite grads (the reference re-runs with
            # NanDetector then raises; we skip like its AMP retry path)
            safe_grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
            updates, new_opt_state = self.tx.update(safe_grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_params = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_params, params)
            # a skipped step must not advance optimizer state either: with
            # zeroed grads the Adam moments would still decay and the
            # schedule/bias-correction counts increment (and mid-
            # accumulation, MultiSteps would fold a zero micro-grad into
            # the average); revert wholesale so the step is a true no-op
            new_opt_state = jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new_opt_state, opt_state)
            metrics = dict(metrics)
            metrics["gnorm"] = gnorm
            # with accumulation the optimizer applies one update per
            # update_freq micro-steps; report the lr actually in effect
            metrics["lr"] = self.lr_schedule(step // self._update_freq)
            metrics["skipped"] = 1.0 - finite.astype(jnp.float32)
            return new_params, new_opt_state, metrics, scale_state

        pshard = param_shardings(self.mesh, self.params)
        oshard = jax.tree.map(
            lambda x: x.sharding if hasattr(x, "sharding") else NamedSharding(self.mesh, P()),
            self.opt_state,
            is_leaf=lambda x: hasattr(x, "sharding"),
        )
        return jax.jit(
            step_fn,
            in_shardings=(pshard, oshard, NamedSharding(self.mesh, P()), None, None, None),
            out_shardings=(pshard, oshard, None, None),
            donate_argnums=(0, 1),
        )

    # ------------------------------------------------------------------

    def train_step(self, batch: Dict[str, Any],
                   fetch_metrics: bool = True) -> Dict[str, float]:
        """One update.  ``fetch_metrics=False`` skips the host fetch of the
        metric scalars — the step is dispatched asynchronously and the
        returned dict holds device arrays (convert at your logging
        interval).  With it True (default) every step pays a device
        round-trip, which serializes dispatch against execution."""
        with jax.profiler.TraceAnnotation("train_step"):
            with jax.profiler.TraceAnnotation("batch_transfer"):
                # host->sharded in ONE hop: an intermediate jnp.asarray
                # would first materialize the whole batch on device 0 and
                # then reshard device-to-device
                batch = jax.tree.map(
                    lambda v: v if isinstance(v, jax.Array) else np.asarray(v),
                    batch)
                batch = jax.device_put(batch, batch_shardings(self.mesh, batch))
            self._rng, rng = jax.random.split(self._rng)
            t0 = time.time()
            self.params, self.opt_state, metrics, self.loss_scale = self._train_step(
                self.params, self.opt_state, jnp.asarray(self._micro), batch,
                rng, self.loss_scale)
            skipped = metrics["skipped"]  # device scalar; gates the EMA
            if fetch_metrics:
                metrics = {k: float(v) for k, v in metrics.items()}
            # without a fetch this measures dispatch, not execution
            metrics["step_time"] = time.time() - t0
            self.train_time += metrics["step_time"]
            self._micro += 1
            self.step = self._micro // self._update_freq
            if (self.ema is not None
                    and self._micro % self._update_freq == 0):
                # EMA decays once per OPTIMIZER update (params only move
                # on accumulation boundaries; stepping it per micro-batch
                # would shorten the shadow horizon update_freq-fold)
                with jax.profiler.TraceAnnotation("ema_update"):
                    self.ema.step(self.params, self.step, skipped)
            return metrics

    def valid_step(self, batch, criterion=None, fetch: bool = False):
        """Jitted validation step, cached per (criterion, batch-shape)
        bucket — the 40-layer model must never dispatch op-by-op on TPU
        (same rationale as the task eval loops' jit_eval).

        Returns DEVICE metric scalars by default: converting per batch
        costs a ~150 ms tunnel RTT each on axon, so accumulate the device
        dicts and fetch ONCE at the end of the pass
        (``metrics.fetch_once``).  ``fetch=True`` restores the eager
        float dict for interactive use."""
        criterion = criterion or self.criterion
        batch = jax.tree.map(
            lambda v: v if isinstance(v, jax.Array) else np.asarray(v), batch)
        batch = jax.device_put(batch, batch_shardings(self.mesh, batch))
        key = (id(criterion), tuple(sorted(
            (k, np.shape(v), str(getattr(v, "dtype", type(v))))
            for k, v in batch.items())))
        if not hasattr(self, "_valid_fns"):
            self._valid_fns = {}
        if key not in self._valid_fns:
            compute_dtype = self.compute_dtype
            model = self.model

            @jax.jit
            def vfn(params, batch):
                p_c = cast_floats(params, compute_dtype) \
                    if compute_dtype != jnp.float32 else params
                _, metrics = criterion(model, p_c, batch, rng=None,
                                       deterministic=True)
                return metrics

            self._valid_fns[key] = vfn
        metrics = self._valid_fns[key](self.params, batch)
        if fetch:
            return {k: float(v) for k, v in metrics.items()}
        return metrics

    # ------------------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        """Complete train-state bundle (ref one_peace/trainer.py:365-400:
        model, optimizer, step, rng, EMA shadow, loss scale, train time)."""
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
            # micro-step saved explicitly: an epoch-end save can land
            # mid-accumulation (epoch length not divisible by update_freq);
            # MultiSteps' mini_step + partial grads live in opt_state, so
            # restoring micro keeps the EMA/step gates aligned with the
            # actual optimizer-update boundaries after resume
            "micro": self._micro,
            "rng": self._rng,
            "train_time": self.train_time,
        }
        if self.loss_scale is not None:
            state["loss_scale"] = self.loss_scale
        if self.ema is not None:
            state["ema_shadow"] = self.ema.shadow
        return state

    def load_state_dict(self, state):
        self.params = shard_params(self.mesh, state["params"])
        # restored arrays arrive unsharded; re-place the optimizer state on
        # the mesh with the same shardings used at init
        oshard = _opt_state_shardings(self.tx, self.mesh, self.params)
        self.opt_state = jax.tree.map(jax.device_put, state["opt_state"], oshard)
        self.step = int(state["step"])
        # legacy bundles (pre-"micro" key) were only ever saved on
        # accumulation boundaries, where micro is derivable
        self._micro = int(state.get("micro", self.step * self._update_freq))
        self.train_time = float(state.get("train_time", 0.0))
        self._rng = jax.device_put(
            state["rng"], NamedSharding(self.mesh, P()))
        if "loss_scale" in state and self.loss_scale is not None:
            from .optim.loss_scaler import LossScaleState

            self.loss_scale = LossScaleState(*jax.tree.leaves(state["loss_scale"]))
        if "ema_shadow" in state and self.ema is not None:
            self.ema.shadow = jax.tree.map(
                jax.device_put, state["ema_shadow"],
                jax.tree.map(lambda p: p.sharding, self.params))


def _masked(tx, mask) -> optax.GradientTransformation:
    """Freeze parameters where mask is False (stage-2 pretraining,
    freeze_finetune_updates) — the JAX equivalent of requires_grad_(False):
    frozen leaves get zero updates."""
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def _opt_state_shardings(tx, mesh, params):
    """Optimizer state shards like its matching param leaves (ZeRO-1:
    Adam mu/nu are param-shaped copies and inherit the param sharding;
    scalars and counters replicate).

    Matching is by path suffix: optax state paths embed the param path
    (e.g. ``.0.mu.encoder_wrapper/fusion/layers/...``).
    """
    pshard = param_shardings(mesh, params)
    shapes = jax.eval_shape(tx.init, params)
    flat_params = {
        tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp): s
        for kp, s in jax.tree_util.tree_flatten_with_path(pshard)[0]
    }

    def leaf_shard(kp, leaf):
        key = tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        # LONGEST suffix match: a param path that is itself a suffix of
        # another param's path (e.g. ('head','w') vs ('decoder','head',
        # 'w')) must not capture the longer param's state leaves
        best = None
        best_len = 0
        for pkey, s in flat_params.items():
            if (len(pkey) > best_len and len(pkey) <= len(key)
                    and key[-len(pkey):] == pkey):
                best, best_len = s, len(pkey)
        return best if best is not None else NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_shard, shapes)
