"""Numerical sanitizer: locate the first non-finite intermediate.

The TPU-native counterpart of fairseq's NanDetector (ref:
fairseq/nan_detector.py:14-108, triggered from trainer.py:854-870).
The trainer already *skips* updates whose global grad norm is non-finite
(the analogue of the AMP retry path); this module is the post-mortem: on a
skipped step, re-run the offending batch through ``probe_modules`` with
per-stage thunks to name the first stage producing NaN/Inf, and dump
per-subtree gradient norms.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def probe_modules(probes: List[Tuple[str, Callable[[], Any]]]) -> List[Dict]:
    """Execute named thunks in order; report per-name finiteness and stats,
    stopping at the first non-finite result (the NanDetector contract:
    name the first bad module, ref nan_detector.py:14-32)."""
    report = []
    for name, thunk in probes:
        out = thunk()
        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(
                      jnp.asarray(x).dtype, jnp.floating)]
        bad = False
        stats = {}
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf, np.float32)
            finite = bool(np.isfinite(arr).all())
            stats[f"out{i}"] = {
                "finite": finite,
                "absmax": float(np.abs(arr).max()) if arr.size else 0.0,
                "nan_frac": float(np.isnan(arr).mean()) if arr.size else 0.0,
            }
            bad = bad or not finite
        report.append({"name": name, "bad": bad, "stats": stats})
        if bad:
            break
    return report


def grad_norms_by_subtree(grads) -> Dict[str, float]:
    """Per-top-level-subtree gradient norms (the reference dumps per-param
    grad norms on divergence, trainer.py:829-870; subtree granularity is
    the useful unit at 4B params)."""
    import optax

    return {key: float(optax.global_norm(sub)) for key, sub in grads.items()}
