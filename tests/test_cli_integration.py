"""End-to-end CLI integration on a synthetic corpus — the analogue of the
reference's tests/test_binaries.py (train a tiny model for a few steps via
the real entry point, then evaluate)."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    img_dir = root / "images"
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    rows = ["id\timage\tcaption"]
    captions = ["a red square", "a green circle", "a blue dog",
                "the yellow cat", "an orange truck", "a purple house",
                "gray mountains", "white clouds"]
    for i, cap in enumerate(captions):
        arr = rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        p = img_dir / f"img{i}.png"
        Image.fromarray(arr).save(p)
        rows.append(f"{i}\t{p}\t{cap}")
    tsv = root / "train.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    valid_json = root / "valid_texts.json"
    valid_json.write_text(json.dumps({str(i): [c] for i, c in enumerate(captions)}))
    return root, tsv, valid_json


def _overrides(root, tsv, valid_json, tiny=True):
    ov = [
        "task._name=image_text_retrieval",
        f"task.data={tsv}",
        f"task.valid_data={tsv}",
        "task.selected_cols=id,image,caption",
        "task.patch_image_size=32",
        "task.head_type=vl",
        f"task.valid_file={valid_json}",
        "model._name=one_peace_retrieval",
        "model.encoder.embed_dim=32",
        "model.encoder.ffn_embed_dim=64",
        "model.encoder.layers=2",
        "model.encoder.attention_heads=4",
        "model.encoder.image_adapter.bucket_size=2",
        "model.encoder.image_adapter.rel_bucket_size=2",
        "model.encoder.text_adapter.bucket_size=8",
        "optimization.max_update=3",
        "optimization.lr=1e-3",
        "dataset.batch_size=8",
        "dataset.batch_size_valid=8",
        "common.bf16=false",
        "distributed.fsdp=1",
        "distributed.tp=1",
        f"checkpoint.save_dir={root}/ckpts",
    ]
    return ov


def test_train_cli_runs(corpus):
    from one_peace_tpu.cli.train import main

    root, tsv, valid_json = corpus
    rc = main(["--config", None] if False else _overrides(root, tsv, valid_json))
    assert rc == 0
    # a checkpoint was written
    assert os.path.isdir(os.path.join(root, "ckpts"))
    names = os.listdir(os.path.join(root, "ckpts"))
    assert any(n.startswith("step_") for n in names)


def test_image_classify_task_with_mixup(tmp_path):
    """Mixup/CutMix wired through the task iterator produces soft targets."""
    from PIL import Image as PILImage

    from one_peace_tpu.core.config import TaskConfig
    from one_peace_tpu.tasks import build_task

    rs = np.random.RandomState(0)
    rows = ["image\tlabel"]
    for i in range(8):
        p = tmp_path / f"i{i}.png"
        PILImage.fromarray(
            rs.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
        rows.append(f"{p}\t{i % 4}")
    (tmp_path / "train.tsv").write_text("\n".join(rows) + "\n")

    cfg = TaskConfig(_name="image_classify", data=str(tmp_path / "train.tsv"),
                     selected_cols="image,label", patch_image_size=32,
                     num_classes=4, mixup=0.8, cutmix=1.0, label_smoothing=0.1)
    task = build_task(cfg)
    task.load_dataset("train")
    itr = task.get_batch_iterator("train", batch_size=4)
    batch = next(iter(itr.next_epoch_itr()))
    assert batch["target"].shape == (4, 4)
    np.testing.assert_allclose(batch["target"].sum(1), 1.0, rtol=1e-5)


def test_mid_epoch_validation_fires(corpus, tmp_path, monkeypatch):
    """dataset.validate_interval_updates fires validation mid-epoch at
    the configured update interval (ref train.py:349-353), without a
    duplicate at the epoch boundary, and every validation pass is
    deferred-fetch (O(1) host fetches)."""
    import one_peace_tpu.cli.train as train_mod

    root, tsv, valid_json = corpus
    calls = []
    real_validate = train_mod.validate

    def spy(cfg, task, model, trainer, progress):
        stats = real_validate(cfg, task, model, trainer, progress)
        calls.append((trainer.step, stats["eval_batched_fetches"]))
        return stats

    monkeypatch.setattr(train_mod, "validate", spy)
    # 32-row train TSV (the 8-image corpus repeated with fresh ids) so
    # batch_size=8 gives 4 updates per epoch on the 8-device mesh
    rows = tsv.read_text().strip().split("\n")
    big = [rows[0]]
    for rep in range(4):
        for r in rows[1:]:
            i, rest = r.split("\t", 1)
            big.append(f"{int(i) + 8 * rep}\t{rest}")
    big_tsv = tmp_path / "train32.tsv"
    big_tsv.write_text("\n".join(big) + "\n")
    ov = _overrides(root, big_tsv, valid_json) + [
        f"task.valid_data={tsv}",
        f"checkpoint.save_dir={tmp_path}/ckpts",
        "optimization.max_update=4",      # 4 updates = exactly one epoch
        "dataset.validate_interval_updates=2",
    ]
    assert train_mod.main(ov) == 0
    steps = [s for s, _ in calls]
    assert steps == [2, 4], steps  # mid-epoch at 2; no double-fire at 4
    assert all(f <= 2 for _, f in calls), calls


@pytest.mark.slow
def test_resume_with_midepoch_validation_and_best_tracking(
        corpus, tmp_path, monkeypatch):
    """Kill-and-resume with the round-4 actors in the loop: interval
    saves + mid-epoch validation + best-metric export interact; the
    resumed run restores the best metric from the bundle and keeps
    firing validation on the update grid (VERDICT r3 #8)."""
    import one_peace_tpu.cli.train as train_mod

    root, tsv, valid_json = corpus
    rows = tsv.read_text().strip().split("\n")
    big = [rows[0]]
    for rep in range(4):
        for r in rows[1:]:
            i, rest = r.split("\t", 1)
            big.append(f"{int(i) + 8 * rep}\t{rest}")
    big_tsv = tmp_path / "train32.tsv"
    big_tsv.write_text("\n".join(big) + "\n")

    calls = []
    real_validate = train_mod.validate

    def spy(cfg, task, model, trainer, progress):
        calls.append((trainer.step, train_mod._BEST_METRIC["value"]))
        return real_validate(cfg, task, model, trainer, progress)

    monkeypatch.setattr(train_mod, "validate", spy)
    base = _overrides(root, big_tsv, valid_json) + [
        f"task.valid_data={tsv}",
        f"checkpoint.save_dir={tmp_path}/ckpts",
        "checkpoint.save_interval_updates=2",
        "checkpoint.best_checkpoint_metric=r_mean",
        "dataset.validate_interval_updates=2",
    ]
    # run 1: 4 updates (one epoch), validations at 2 and 4, saves after
    assert train_mod.main(base + ["optimization.max_update=4"]) == 0
    assert [s for s, _ in calls] == [2, 4]
    assert calls[0][1] is None          # nothing tracked before step 2
    assert calls[1][1] is not None      # step-2 validation registered
    ckpt_dir = os.path.join(str(tmp_path), "ckpts")
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_best.npz"))
    names = {n for n in os.listdir(ckpt_dir) if n.startswith("step_")}
    assert names >= {"step_2", "step_4"}, names

    # run 2 (preemption resume): picks up at step 4, best metric restored
    # from the bundle BEFORE any new validation, grid continues at 6, 8.
    # (The resumed-and-already-finished epoch revalidates once at its end
    # — step 4 — since the in-memory dedupe doesn't persist; harmless and
    # matches the reference's resume behavior.)
    calls.clear()
    assert train_mod.main(base + ["optimization.max_update=8"]) == 0
    assert [s for s, _ in calls] == [4, 6, 8]
    assert calls[0][1] is not None, "best metric lost across resume"


@pytest.mark.slow
def test_train_cli_profiler_capture(corpus, tmp_path):
    """common.profile_dir captures a jax.profiler trace over the
    [profile_start, profile_stop) update window."""
    import os

    from one_peace_tpu.cli.train import main

    root, tsv, valid_json = corpus
    prof = str(tmp_path / "prof")
    ov = _overrides(root, tsv, valid_json) + [
        f"checkpoint.save_dir={tmp_path}/ckpts",
        f"common.profile_dir={prof}",
        "common.profile_start=1",
        "common.profile_stop=2",
    ]
    assert main(ov) == 0
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert any(f.endswith(".xplane.pb") or f.endswith(".json.gz")
               for f in found), found
