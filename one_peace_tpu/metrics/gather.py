"""Cross-process gather for evaluation reducers.

The reference pads variable-length per-rank embedding tensors to the max
length and all_gathers them before computing Recall/mAP
(ref one_peace/utils/data_utils.py:50-86 ``all_gather`` with size
padding).  TPU-native equivalents:

- ``gather_ragged``: host-level, ``jax.experimental.multihost_utils``
  — pads the local array to the max per-process length, process_allgathers
  values + lengths, strips padding and concatenates in process order.
  Identity on a single process.
- ``padded_all_gather``: the same semantics *inside* a jitted SPMD
  computation (shard_map/pmap body) via ``jax.lax.all_gather`` — returns
  the stacked (W, Lmax, ...) values + (W,) valid lengths (ragged results
  cannot leave jit; the caller strips on the host).  This is what a
  multi-chip eval step uses to assemble the global similarity matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def padded_all_gather(values: jnp.ndarray, valid_len: jnp.ndarray,
                      axis_name: str):
    """Inside shard_map/pmap: values (Lmax, ...) zero-padded local block,
    valid_len () int32.  Returns ((W, Lmax, ...), (W,))."""
    all_vals = jax.lax.all_gather(values, axis_name)
    all_lens = jax.lax.all_gather(valid_len, axis_name)
    return all_vals, all_lens


def strip_padding(all_vals: np.ndarray, all_lens: np.ndarray) -> np.ndarray:
    """Host-side: (W, Lmax, ...) + (W,) -> (sum lens, ...) in rank order."""
    all_vals = np.asarray(all_vals)
    all_lens = np.asarray(all_lens)
    return np.concatenate(
        [all_vals[i, : int(n)] for i, n in enumerate(all_lens)], axis=0)


def gather_ragged(local: np.ndarray) -> np.ndarray:
    """Gather a variable-length leading-dim array from every process and
    concatenate in process order; identity with one process."""
    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils

    local = np.asarray(local)
    n = np.int32(local.shape[0])
    lens = np.asarray(multihost_utils.process_allgather(n))
    max_n = int(lens.max())
    padded = np.zeros((max_n,) + local.shape[1:], local.dtype)
    padded[: local.shape[0]] = local
    all_vals = np.asarray(multihost_utils.process_allgather(padded))
    return strip_padding(all_vals, lens)


def allsum(local) -> np.ndarray:
    """Sum a scalar or fixed-shape array across processes (identity with
    one process) — the merge rule for counter-style reducers (Accuracy
    correct/total, MIoU intersection/union, ...)."""
    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(local))).sum(axis=0)


# --- eval-merge wrappers -----------------------------------------------
#
# The mesh eval loops feed IDENTICAL global batches on every process (the
# SPMD convenience path: each host supplies the full global array and jax
# transfers only its addressable shards), so per-process accumulations
# are REPLICAS — cross-process gathering them would double-count every
# sample P times.  The reducers therefore merge through these wrappers,
# which only gather when the eval data was genuinely process-sharded
# (an eval driver that feeds per-process shards via
# make_array_from_process_local_data must call
# set_process_sharded_eval(True) first).

_PROCESS_SHARDED_EVAL = False


def set_process_sharded_eval(flag: bool) -> None:
    global _PROCESS_SHARDED_EVAL
    _PROCESS_SHARDED_EVAL = bool(flag)


def eval_gather_ragged(local: np.ndarray) -> np.ndarray:
    return gather_ragged(local) if _PROCESS_SHARDED_EVAL else np.asarray(local)


def eval_allsum(local) -> np.ndarray:
    return allsum(local) if _PROCESS_SHARDED_EVAL else np.asarray(local)
