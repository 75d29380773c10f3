"""Device mesh construction.

One logical mesh with three axes replaces the reference's entire
distributed bootstrap (torchrun + NCCL process groups + DDP wrapper zoo,
SURVEY.md §1 L1 / §2.3):

- ``dp``   pure data parallel (params replicated)
- ``fsdp`` data parallel with parameter/optimizer sharding (ZeRO)
- ``tp``   tensor parallel (d_model / ffn dims sharded)

Gradient all-reduce, ZeRO gather/scatter and TP collectives are all
inserted by XLA from sharding annotations — no explicit NCCL-style code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp")


def make_mesh(dp: int = -1, fsdp: int = 1, tp: int = 1, pp: int = 1,
              devices: Optional[Sequence] = None, sp: int = 1) -> Mesh:
    """Build a (dp, fsdp, tp[, sp]) mesh; dp=-1 absorbs remaining devices.

    When pp > 1 a leading ``pp`` axis is prepended — pipeline stages sit
    outermost (cross-slice/DCN-friendly: stage hops are thin point-to-point
    activation transfers; the bandwidth-heavy fsdp/tp collectives stay
    within a stage's inner axes on ICI).  When sp > 1 a trailing ``sp``
    axis is appended — sequence parallelism (ring attention) wants its
    neighbor ``ppermute`` hops on the innermost (fastest-ICI) axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % (pp * fsdp * tp * sp) == 0, (n, pp, fsdp, tp, sp)
        dp = n // (pp * fsdp * tp * sp)
    assert dp * fsdp * tp * pp * sp == n, \
        f"mesh pp={pp} {dp}x{fsdp}x{tp} sp={sp} != {n} devices"
    axes = AXES + (("sp",) if sp > 1 else ())
    shape = (dp, fsdp, tp) + ((sp,) if sp > 1 else ())
    if pp > 1:
        arr = np.asarray(devices).reshape((pp,) + shape)
        return Mesh(arr, ("pp",) + axes)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def initialize_multihost(coordinator_address: str = None,
                         num_processes: int = None,
                         process_id: int = None) -> None:
    """Multi-host (DCN) bootstrap — the counterpart of the reference's
    distributed_init (ref fairseq/distributed/utils.py:240-315), reduced
    to one call: jax.distributed wires the hosts, after which
    ``jax.devices()`` spans the pod/slice and the same mesh + sharding
    code runs unchanged (collectives ride ICI within a slice, DCN across).

    On Cloud TPU the arguments are auto-detected from the environment;
    pass them explicitly elsewhere."""
    import jax

    # pass each explicit argument through independently: a caller may rely
    # on env auto-detection for the address but still pin num_processes/
    # process_id — silently dropping them would bring the job up with the
    # wrong topology
    kwargs = {k: v for k, v in (("coordinator_address", coordinator_address),
                                ("num_processes", num_processes),
                                ("process_id", process_id)) if v is not None}
    jax.distributed.initialize(**kwargs)
