"""Native checkpointing (orbax + flat .npz).

Replaces fairseq's checkpoint_utils (ref: fairseq/checkpoint_utils.py:
37-916): save/load of the full train state (params, optimizer state, step,
rng, data-iterator state, config snapshot), best-k/interval policies in the
train driver, and a flat ``.npz`` export for interchange.

Orbax handles sharded arrays natively — on a multi-host mesh each host
writes its shards (the analogue of FSDP's sharded state dicts,
ref trainer.py:352-363).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree, prefix=()) -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, prefix + (str(i),)))
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat: Dict[str, Any]):
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        # only a CONTIGUOUS 0..n-1 digit key set round-trips a sequence;
        # a gapped digit-keyed dict (e.g. after a branch was dropped)
        # must stay a dict instead of raising KeyError on the gap
        if (keys and all(k.isdigit() for k in keys)
                and sorted(int(k) for k in keys) == list(range(len(keys)))):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params, metadata: Optional[Dict] = None) -> None:
    """Flat .npz export of a parameter tree.

    bfloat16 leaves are stored as uint16 bit-views plus a key manifest —
    np.savez would otherwise serialize the ml_dtypes extended dtype as an
    opaque void (``|V2``) array that cannot be loaded back."""
    import ml_dtypes

    flat = {}
    bf16_keys = []
    for k, v in _flatten(params).items():
        arr = np.asarray(v)
        if arr.dtype == ml_dtypes.bfloat16:
            bf16_keys.append(k)
            arr = arr.view(np.uint16)
        flat[k] = arr
    if bf16_keys:
        flat["__bf16_keys__"] = np.frombuffer(
            json.dumps(bf16_keys).encode(), dtype=np.uint8)
    if metadata is not None:
        flat["__metadata__"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str, dtype=None):
    import jax.numpy as jnp
    import ml_dtypes

    special = ("__metadata__", "__bf16_keys__")
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files if k not in special}
        bf16_keys = (set(json.loads(data["__bf16_keys__"].tobytes()))
                     if "__bf16_keys__" in data.files else set())
    for k in bf16_keys:
        flat[k] = flat[k].view(ml_dtypes.bfloat16)
    tree = _unflatten(flat)
    from .checkpoint_convert import to_jax

    return to_jax(tree, dtype)


def load_metadata(path: str) -> Optional[Dict]:
    with np.load(path) as data:
        if "__metadata__" in data.files:
            return json.loads(bytes(data["__metadata__"]).decode())
    return None


# ---------------------------------------------------------------------------
# Full train-state checkpoints via orbax
# ---------------------------------------------------------------------------


_CHECKPOINTER = None


def _checkpointer():
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        import orbax.checkpoint as ocp

        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_train_state(ckpt_dir: str, step: int, state: Dict[str, Any],
                     keep: int = 3, async_save: bool = True) -> str:
    """Save the full train-state bundle.

    ``async_save=True`` (default) returns as soon as the device arrays are
    snapshotted; serialization/IO overlaps the next train steps — the
    analogue of the reference's ioPath async writes
    (ref fairseq/checkpoint_utils.py:557).  Call :func:`wait_for_saves`
    before process exit (or rely on the next save's implicit wait).
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # one save in flight at a time
    ckptr.save(path, state, force=True)
    if not async_save:
        ckptr.wait_until_finished()
    _prune_old(ckpt_dir, keep)
    return path


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save completes."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    wait_for_saves()  # an in-flight async save from this process counts
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def restore_train_state(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def _prune_old(ckpt_dir: str, keep: int) -> None:
    if keep <= 0:
        return
    import shutil

    steps = sorted(
        int(n[5:]) for n in os.listdir(ckpt_dir)
        if n.startswith("step_") and n[5:].isdigit()
    )
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)


_BEST_RE = re.compile(
    r"^checkpoint\.best_(?P<key>.+)_(?P<value>-?\d+(?:\.\d+)?)"
    r"\.step(?P<step>\d+)\.npz$")


def best_k_checkpoints(ckpt_dir: str, key: str) -> list:
    """[(value, step, path)] of existing k-best exports for ``key``,
    parsed from filenames (robust across resume — the ranking state lives
    in the directory itself, the way ref checkpoint_utils.py:206-238
    checkpoint_paths re-derives order from a pattern)."""
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = _BEST_RE.match(name)
        if m and m.group("key") == key:
            out.append((float(m.group("value")), int(m.group("step")),
                        os.path.join(ckpt_dir, name)))
    return out


def save_best_k(ckpt_dir: str, key: str, value: float, maximize: bool,
                k: int, params, step: int) -> Optional[str]:
    """Keep the k best param exports by ``key``
    (ref checkpoint_utils.py:37-189 keep_best_checkpoints): write
    ``checkpoint.best_{key}_{value}.step{N}.npz`` when the value ranks
    within the current top k, then delete exports that fell out.  Returns
    the written path, or None if the value did not rank.

    Ranking compares at the 4-decimal filename precision (what a restart
    can re-parse), so metrics within 1e-4 of the current k-th best count
    as ties and do not rank; the step suffix keeps equal-valued exports
    from different validations distinct on disk.  Non-finite values never
    rank."""
    if k <= 0 or not np.isfinite(value):
        return None
    value = round(float(value), 4)
    # rank best-first in BOTH directions; at equal values the later step
    # is the keeper (so the tie-break must be on -step, not reverse-step)
    rank_key = (lambda t: (-t[0], -t[1])) if maximize else \
        (lambda t: (t[0], -t[1]))
    ranked = sorted(best_k_checkpoints(ckpt_dir, key), key=rank_key)
    if len(ranked) >= k:
        worst = ranked[k - 1][0]
        if (value <= worst) if maximize else (value >= worst):
            return None
    path = os.path.join(
        ckpt_dir, f"checkpoint.best_{key}_{value:.4f}.step{step}.npz")
    save_params(path, params, metadata={key: float(value), "step": step})
    # prune beyond k
    ranked = sorted(best_k_checkpoints(ckpt_dir, key), key=rank_key)
    for _, _, stale in ranked[k:]:
        if os.path.abspath(stale) != os.path.abspath(path):
            try:
                os.remove(stale)
            except OSError:
                pass
    return path
