"""Preemption-safe mid-epoch resume: batch order + EMA continuity.

Mirrors the reference's bundle semantics (ref one_peace/trainer.py:365-400
EMA shadow in state_dict; one_peace/data/iterators.py:179-216 iterator
fast-forward; fairseq/checkpoint_utils.py:37-189 save policy)."""

import numpy as np
import pytest

from helpers import tiny_model_config


class ProbeDataset:
    """Toy ITC dataset that records every accessed index."""

    def __init__(self, n):
        self.n = n
        self.accessed = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.accessed.append(int(i))
        rs = np.random.RandomState(i)
        return {
            "src_tokens": rs.randint(5, 99, (8,)),
            "src_images": rs.randn(3, 32, 32).astype(np.float32),
        }


def _collate(samples):
    return {
        "src_tokens": np.stack([s["src_tokens"] for s in samples]),
        "src_images": np.stack([s["src_images"] for s in samples]),
    }


def _make_trainer():
    from one_peace_tpu.core.config import FrameworkConfig
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    cfg = FrameworkConfig()
    cfg.model = tiny_model_config(head_type="vl")
    cfg.criterion._name = "image_text_retrieval_criterion"
    cfg.optimization.lr = 5e-3
    cfg.optimization.max_update = 50
    cfg.common.bf16 = False
    cfg.distributed.dp = -1
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    cfg.ema.store_ema = True
    cfg.ema.ema_start_update = 0
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    return Trainer(cfg, model, criterion)


def _make_iterator(ds):
    from one_peace_tpu.data.iterators import EpochBatchIterator

    return EpochBatchIterator(ds, _collate, batch_size=8, seed=7,
                              prefetch=0)


def _run(trainer, itr, ds, n_batches):
    """Consume exactly n_batches training steps (possibly across epochs),
    returning the dataset-access trace."""
    mark = len(ds.accessed)
    done = 0
    while done < n_batches:
        for batch in itr.next_epoch_itr():
            trainer.train_step(batch)
            done += 1
            if done >= n_batches:
                break
    return ds.accessed[mark:]


@pytest.mark.slow
def test_midepoch_preemption_resume(tmp_path):
    from one_peace_tpu.utils import native_checkpoint as ckpt

    # ---- run A: 3 steps into a 5-batch epoch, save, continue 7 more
    ds_a = ProbeDataset(40)
    trainer_a = _make_trainer()
    itr_a = _make_iterator(ds_a)
    _run(trainer_a, itr_a, ds_a, 3)
    assert itr_a.state_dict()["consumed"] == 3

    bundle = {"trainer": trainer_a.state_dict(), "iterator": itr_a.state_dict()}
    path = ckpt.save_train_state(str(tmp_path / "c"), trainer_a.step, bundle,
                                 async_save=False)
    tail_a = _run(trainer_a, itr_a, ds_a, 7)  # finish ep1 (2) + all of ep2 (5)

    # ---- run B: fresh process state, restore, continue identically
    ds_b = ProbeDataset(40)
    trainer_b = _make_trainer()
    itr_b = _make_iterator(ds_b)
    state = ckpt.restore_train_state(
        path, {"trainer": trainer_b.state_dict(),
               "iterator": itr_b.state_dict()})
    trainer_b.load_state_dict(state["trainer"])
    itr_b.load_state_dict(state["iterator"])
    assert trainer_b.step == 3
    tail_b = _run(trainer_b, itr_b, ds_b, 7)

    # identical subsequent batch order across the epoch boundary
    assert tail_a == tail_b

    # EMA shadow continuity: restored EMA tracked identically
    import jax

    for a, b in zip(jax.tree.leaves(trainer_a.ema.shadow),
                    jax.tree.leaves(trainer_b.ema.shadow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # params continuity too
    np.testing.assert_allclose(
        np.asarray(trainer_a.params["text_proj"]["w"]),
        np.asarray(trainer_b.params["text_proj"]["w"]), rtol=2e-5, atol=2e-5)
    assert trainer_b.train_time > 0


def test_iterator_double_preemption():
    """A second preemption during a resumed epoch records the true offset
    (the v1 counter restarted from zero after resume)."""
    ds = ProbeDataset(40)
    itr = _make_iterator(ds)
    g = itr.next_epoch_itr()
    next(g), next(g)
    assert itr.state_dict()["consumed"] == 2

    itr2 = _make_iterator(ProbeDataset(40))
    itr2.load_state_dict(itr.state_dict())
    g2 = itr2.next_epoch_itr()
    next(g2)
    assert itr2.state_dict()["consumed"] == 3

    # and the resumed epoch still ends cleanly, advancing the epoch counter
    remaining = list(g2)
    assert len(remaining) == 2  # 5 batches/epoch: 3 consumed, 2 left
    assert itr2.epoch == 2 and itr2.state_dict()["consumed"] == 0


def test_save_params_bf16_roundtrip(tmp_path):
    """bf16 leaves must survive the flat-npz export bit-exactly; np.savez
    writes the ml_dtypes extended dtype as an unloadable void array unless
    save_params stores a uint16 bit-view (drive-found bug)."""
    import jax.numpy as jnp

    from one_peace_tpu.utils.native_checkpoint import load_params, save_params

    tree = {
        "a": jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.bfloat16),
        "nested": {"b": jnp.arange(5, dtype=jnp.int32),
                   "c": jnp.asarray([1.5, -2.25], jnp.float32)},
    }
    path = str(tmp_path / "p.npz")
    save_params(path, tree, metadata={"step": 7})
    back = load_params(path)
    assert back["a"].dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(back["a"], np.float32),
                          np.asarray(tree["a"], np.float32))
    assert back["nested"]["b"].dtype == jnp.int32
    assert np.array_equal(back["nested"]["c"], tree["nested"]["c"])
    # load-time cast still applies to floats only
    cast = load_params(path, dtype=jnp.float32)
    assert cast["a"].dtype == jnp.float32
    assert cast["nested"]["b"].dtype == jnp.int32

    from one_peace_tpu.utils.native_checkpoint import load_metadata
    assert load_metadata(path) == {"step": 7}
