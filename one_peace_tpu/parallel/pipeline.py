"""Pipeline parallelism over the stacked-layer axis.

The reference scaffolds torchgpipe-style pipeline parallelism
(ref: fairseq/dataclass/configs.py:395-452 --pipeline-model-parallel with
balance/devices/chunks) but never uses it for ONE-PEACE.  Here the
capability TPU-native: the encoder's stacked layer parameters are sharded
along the depth axis over a ``pp`` mesh axis, micro-batches stream through
the stages GPipe-style, and stage-to-stage activation transfer is a single
``ppermute`` hop over ICI.

Inside ``shard_map``:
- stage s holds layers [s*Lp, (s+1)*Lp) (the natural split of the
  scan-stacked parameter tree);
- at clock tick t, stage s runs micro-batch (t - s) when 0 <= t - s < M
  (bubble ticks compute on garbage and are masked out — the standard
  GPipe bubble cost of (S-1)/(S-1+M));
- after each tick activations rotate s -> s+1.

Works for any per-layer body with signature body(stacked_local, x) -> x
(e.g. a partial of the fusion encoder layer).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _stage_apply(layer_body: Callable, local_params, x):
    """Run this stage's local layer slice (scan over the local depth)."""

    def body(carry, layer_params):
        return layer_body(layer_params, carry), None

    out, _ = jax.lax.scan(body, x, local_params)
    return out


def pipeline_forward(
    layer_body: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    num_micro_batches: int,
    axis: str = "pp",
) -> jnp.ndarray:
    """x: (B, ...) global batch; stacked_params: pytree with leading
    ``layers`` axis (sharded over ``axis``).  Returns the full-depth
    output, identical to a serial scan over all layers."""
    b = x.shape[0]
    m = num_micro_batches
    assert b % m == 0, (b, m)
    mb = b // m
    micro = x.reshape((m, mb) + x.shape[1:])

    def staged(local_params, micro_local):
        s = jax.lax.axis_index(axis)
        n_stages = jax.lax.psum(1, axis)
        ticks = n_stages + m - 1

        def tick(carry, t):
            buf, outputs = carry
            # stage 0 feeds micro-batch t (clamped) from the input
            feed_idx = jnp.clip(t, 0, m - 1)
            feed = jax.lax.dynamic_index_in_dim(micro_local, feed_idx, 0,
                                                keepdims=False)
            inp = jnp.where(s == 0, feed, buf)
            out = _stage_apply(layer_body, local_params, inp)
            # last stage stores micro-batch (t - (S-1)) when valid
            out_idx = t - (n_stages - 1)
            valid = (out_idx >= 0) & (out_idx < m)
            outputs = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, out, jnp.clip(out_idx, 0, m - 1), 0),
                lambda o: o,
                outputs)
            # rotate activations one stage forward
            n = jax.lax.psum(1, axis)
            buf_next = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % n) for i in range(n)])
            return (buf_next, outputs), None

        buf0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)
        outs0 = jnp.zeros((m, mb) + x.shape[1:], x.dtype)
        (_, outputs), _ = jax.lax.scan(tick, (buf0, outs0), jnp.arange(ticks))
        # only the last stage holds real outputs; broadcast them to all
        is_last = (s == n_stages - 1).astype(outputs.dtype)
        outputs = jax.lax.psum(outputs * is_last, axis)
        return outputs

    fn = jax.shard_map(
        staged,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(stacked_params, micro)
    return out.reshape((b,) + x.shape[1:])
