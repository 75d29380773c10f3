"""k-best checkpoint retention (ref checkpoint_utils.py:37-189
keep_best_checkpoints) and pluggable metric sinks (ref
logging/progress_bar.py:27-583)."""

import json
import os

import numpy as np

from one_peace_tpu.core.metrics import (
    JsonlFileSink,
    ProgressLogger,
    WandbSink,
    build_sinks,
)
from one_peace_tpu.utils.native_checkpoint import (
    best_k_checkpoints,
    load_metadata,
    save_best_k,
)

PARAMS = {"w": np.arange(4, dtype=np.float32)}


def _kept_values(d, key):
    return sorted(v for v, _, _ in best_k_checkpoints(d, key))


def test_save_best_k_maximize_ordering(tmp_path):
    d = str(tmp_path)
    seq = [0.5, 0.7, 0.6, 0.8, 0.55]
    written = [save_best_k(d, "acc", v, True, 3, PARAMS, i)
               for i, v in enumerate(seq)]
    # 0.5/0.7/0.6 fill the first three slots; 0.8 evicts 0.5; 0.55 does
    # not rank within the top 3 (0.8, 0.7, 0.6)
    assert written[0] and written[1] and written[2] and written[3]
    assert written[4] is None
    assert _kept_values(d, "acc") == [0.6, 0.7, 0.8]
    # metadata records the step the export came from
    meta = load_metadata(
        os.path.join(d, "checkpoint.best_acc_0.8000.step3.npz"))
    assert meta["step"] == 3 and meta["acc"] == 0.8


def test_save_best_k_rejects_nan_and_keeps_ties_distinct(tmp_path):
    d = str(tmp_path)
    assert save_best_k(d, "loss", float("nan"), False, 2, PARAMS, 0) is None
    assert best_k_checkpoints(d, "loss") == []
    # two validations at the same (rounded) value stay distinct on disk
    p1 = save_best_k(d, "acc", 0.93456, True, 3, PARAMS, 1)
    p2 = save_best_k(d, "acc", 0.93458, True, 3, PARAMS, 2)
    assert p1 and p2 and p1 != p2
    assert len(best_k_checkpoints(d, "acc")) == 2
    # with k full, a tie at filename precision does not rank
    save_best_k(d, "acc", 0.95, True, 3, PARAMS, 3)
    assert save_best_k(d, "acc", 0.93455, True, 3, PARAMS, 4) is None


def test_save_best_k_minimize_ordering(tmp_path):
    d = str(tmp_path)
    for i, v in enumerate([3.0, 1.0, 2.0, 0.5, 2.5]):
        save_best_k(d, "loss", v, False, 2, PARAMS, i)
    assert _kept_values(d, "loss") == [0.5, 1.0]


def test_save_best_k_survives_resume(tmp_path):
    """Ranking is re-derived from filenames, so retention keeps working
    after a process restart with no in-memory state."""
    d = str(tmp_path)
    save_best_k(d, "acc", 0.4, True, 2, PARAMS, 0)
    save_best_k(d, "acc", 0.6, True, 2, PARAMS, 1)
    # "restart": a fresh call sees the directory only
    assert save_best_k(d, "acc", 0.3, True, 2, PARAMS, 2) is None
    assert save_best_k(d, "acc", 0.9, True, 2, PARAMS, 3)
    assert _kept_values(d, "acc") == [0.6, 0.9]


def test_jsonl_sink_through_progress_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    logger = ProgressLogger("simple", 1, sinks=[JsonlFileSink(path)])
    logger.log({"loss": 1.5, "_skip": object()}, step=1)
    logger.log({"loss": 1.25}, step=2)
    logger.close()
    lines = [json.loads(x) for x in open(path)]
    assert lines == [{"step": 1, "tag": "train", "loss": 1.5},
                     {"step": 2, "tag": "train", "loss": 1.25}]


def test_unavailable_sinks_degrade_to_noop(tmp_path):
    # no wandb/aim client in this image: sinks must construct and no-op
    class C:
        tensorboard_logdir = ""
        log_file = str(tmp_path / "m.jsonl")
        wandb_project = "proj"
        aim_repo = str(tmp_path)

    sinks = build_sinks(C())
    assert len(sinks) == 3
    for s in sinks:
        s.log_stats("train", {"loss": 1.0}, 1)
        s.close()
    assert isinstance(sinks[1], WandbSink)


def test_save_best_k_minimize_tie_keeps_later_step(tmp_path):
    """At equal (rounded) values the LATER step is the keeper in BOTH
    directions — the minimize path used to evict the newer export."""
    d = str(tmp_path)
    save_best_k(d, "loss", 0.5, False, 2, PARAMS, 100)
    save_best_k(d, "loss", 0.5, False, 2, PARAMS, 200)
    save_best_k(d, "loss", 0.4, False, 2, PARAMS, 300)
    kept = {(v, s) for v, s, _ in best_k_checkpoints(d, "loss")}
    assert kept == {(0.4, 300), (0.5, 200)}, kept
