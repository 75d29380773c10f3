"""Pipeline parallelism over the stacked-layer axis (training-grade).

The reference scaffolds torchgpipe-style pipeline parallelism
(ref: fairseq/dataclass/configs.py:395-452 --pipeline-model-parallel with
balance/devices/chunks) but never uses it for ONE-PEACE.  Here the
capability is TPU-native and differentiable end-to-end: the encoder's
stacked layer parameters are sharded along the depth axis over a ``pp``
mesh axis, micro-batches stream through the stages GPipe-style, and
stage-to-stage activation transfer is a single ``ppermute`` hop over ICI.

The shard_map is *partial-manual* (``axis_names={'pp'}``): only the pp
axis is mapped by hand; dp/fsdp/tp sharding of the per-stage compute
stays automatic, so the same Megatron/ZeRO rules from sharding.py apply
inside each stage unchanged.

Inside the mapped function:
- stage s holds layers [s*Lp, (s+1)*Lp) (the natural split of the
  scan-stacked parameter tree, leading axis sharded P('pp'));
- at clock tick t, stage s runs micro-batch (t - s) when 0 <= t - s < M
  (bubble ticks compute on garbage and are masked out — the standard
  GPipe bubble cost of (S-1)/(S-1+M));
- after each tick activations rotate s -> s+1.

Autodiff: scan + ppermute + the masked writes are all linear/transposable,
so ``jax.grad`` through ``pipeline_forward`` reproduces the serial
gradients exactly — the reverse pass is the mirrored pipeline (activations
rotate backward via the transposed ppermute).  Verified against the serial
scan in tests/test_pipeline.py (forward and grads).

``layer_body(stacked_slice, x, batch_aux, broadcast_aux) -> x`` where
``stacked_slice`` is one layer's slice of the stacked pytree (params +
per-layer extras such as drop-path rate and rng), ``batch_aux`` is the
micro-batch slice of batch-shaped side inputs (e.g. the key-padding
mask), and ``broadcast_aux`` carries non-batch, non-layer side inputs
(e.g. a shared rel-pos bias) into the mapped region replicated.  Traced
values must flow through one of these three channels — NOT through
closures (a closed-over tracer reaches the manual region carrying its
auto-mesh sharding and trips the mesh-context check).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _num_stages(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


def pipeline_forward(
    layer_body: Callable,
    stacked: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    num_micro_batches: int,
    axis: str = "pp",
    batch_aux: Any = None,
    broadcast_aux: Any = None,
    checkpoint_stages: bool = False,
) -> jnp.ndarray:
    """GPipe over ``axis``; output is identical to a serial scan.

    Args:
      layer_body: fn(stacked_slice, x, batch_aux, broadcast_aux) -> x for
        ONE layer.
      stacked: pytree with a leading ``layers`` axis on every leaf
        (divisible by the pp stage count).
      x: (B, ...) global-batch activations entering layer 0.
      mesh: mesh containing ``axis``; other axes stay auto-sharded.
      num_micro_batches: M; B must divide by M.
      batch_aux: optional pytree of (B, ...) side inputs, micro-sliced in
        lockstep with the activations (same micro-batch index as the
        activation each stage is processing).
      broadcast_aux: optional pytree passed whole (replicated) to every
        stage at every tick.
      checkpoint_stages: remat each stage's tick (training memory).
    """
    b = x.shape[0]
    m = num_micro_batches
    assert b % m == 0, (b, m)
    n_stages = _num_stages(mesh, axis)
    depth = jax.tree.leaves(stacked)[0].shape[0]
    assert depth % n_stages == 0, (depth, n_stages)
    mb = b // m
    micro = x.reshape((m, mb) + x.shape[1:])
    micro_aux = jax.tree.map(
        lambda a: a.reshape((m, mb) + a.shape[1:]), batch_aux)

    def stage_apply(local_stacked, inp, aux, bcast):
        def body(carry, sl):
            return layer_body(sl, carry, aux, bcast), None

        out, _ = jax.lax.scan(body, inp, local_stacked)
        return out

    if checkpoint_stages:
        stage_apply = jax.checkpoint(stage_apply)

    def staged(local_stacked, micro_local, aux_local, bcast):
        s = jax.lax.axis_index(axis)
        n = jax.lax.psum(1, axis)
        ticks = n_stages + m - 1

        def tick(carry, t):
            buf, outputs = carry
            # stage 0 feeds micro-batch t (clamped) from the input
            feed_idx = jnp.clip(t, 0, m - 1)
            feed = jax.lax.dynamic_index_in_dim(micro_local, feed_idx, 0,
                                                keepdims=False)
            inp = jnp.where(s == 0, feed, buf)
            # batch aux follows the micro-batch this stage is processing
            aux_idx = jnp.clip(t - s, 0, m - 1)
            aux = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, aux_idx, 0,
                                                       keepdims=False),
                aux_local)
            out = stage_apply(local_stacked, inp, aux, bcast)
            # last stage stores micro-batch (t - (S-1)) when valid
            out_idx = t - (n - 1)
            valid = (out_idx >= 0) & (out_idx < m)
            outputs = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, out, jnp.clip(out_idx, 0, m - 1), 0),
                lambda o: o,
                outputs)
            # rotate activations one stage forward
            buf_next = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (buf_next, outputs), None

        buf0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)
        outs0 = jnp.zeros((m, mb) + x.shape[1:], x.dtype)
        (_, outputs), _ = jax.lax.scan(tick, (buf0, outs0), jnp.arange(ticks))
        # only the last stage holds real outputs; broadcast them to all.
        # select, not multiply: bubble-tick compute on non-last stages can
        # legitimately produce inf/NaN (e.g. an all-masked softmax row on
        # garbage activations) and 0 * NaN = NaN would poison the psum
        outputs = jax.lax.psum(
            jnp.where(s == n - 1, outputs, jnp.zeros_like(outputs)), axis)
        return outputs

    fn = jax.shard_map(
        staged,
        mesh=mesh,
        in_specs=(P(axis), P(), jax.tree.map(lambda _: P(), micro_aux),
                  jax.tree.map(lambda _: P(), broadcast_aux)),
        out_specs=P(),
        axis_names={axis},
        check_vma=False,
    )
    out = fn(stacked, micro, micro_aux, broadcast_aux)
    return out.reshape((b,) + x.shape[1:])
