"""End-to-end training smoke tests on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from helpers import tiny_model_config


def _tiny_framework_cfg():
    from one_peace_tpu.core.config import FrameworkConfig

    cfg = FrameworkConfig()
    cfg.model = tiny_model_config(head_type="vl")
    cfg.criterion._name = "image_text_retrieval_criterion"
    cfg.optimization.lr = 5e-3
    cfg.optimization.clip_norm = 3.0
    cfg.optimization.max_update = 50
    cfg.common.bf16 = False
    cfg.distributed.dp = -1
    cfg.distributed.fsdp = 2
    cfg.distributed.tp = 2
    return cfg


@pytest.fixture(scope="module")
def trained():
    """Run a few ITC steps on the 8-device mesh; reused by assertions."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    cfg = _tiny_framework_cfg()
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (16, 8)),
        "src_images": rs.randn(16, 3, 32, 32).astype(np.float32),
    }
    history = [trainer.train_step(batch) for _ in range(5)]
    return cfg, trainer, history


def test_loss_decreases(trained):
    _, _, history = trained
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_lr_schedule_progresses(trained):
    cfg, trainer, history = trained
    assert history[1]["lr"] > 0
    assert trainer.step == 5


def test_params_sharded(trained):
    """FFN weights must actually be sharded over the mesh (ZeRO+TP)."""
    cfg, trainer, _ = trained
    leaf = trainer.params["encoder_wrapper"]["fusion"]["layers"]["text_ffn"]["wi_0"]["w"]
    sharding = leaf.sharding
    spec = sharding.spec
    assert tuple(spec) == (None, "fsdp", "tp"), spec


def test_optimizer_state_sharded_like_params(trained):
    cfg, trainer, _ = trained
    import jax

    # find a mu leaf for the same param and compare sharding specs
    def find(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    param = trainer.params["encoder_wrapper"]["fusion"]["layers"]["text_ffn"]["wi_0"]["w"]
    found = []

    def visit(x):
        if hasattr(x, "shape") and x.shape == param.shape and x is not param:
            found.append(x)

    jax.tree.map(visit, trainer.opt_state)
    assert found, "no param-shaped optimizer state leaves"
    assert any(tuple(f.sharding.spec) == tuple(param.sharding.spec) for f in found)


def test_nonfinite_grads_skip_update():
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer
    import jax

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)
    before = jax.tree.map(np.asarray, trainer.params["text_proj"])

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": np.full((8, 3, 32, 32), np.nan, np.float32),  # poison
    }
    metrics = trainer.train_step(batch)
    assert metrics["skipped"] == 1.0
    after = jax.tree.map(np.asarray, trainer.params["text_proj"])
    np.testing.assert_array_equal(before["w"], after["w"])


def test_layer_decay_scales():
    from one_peace_tpu.optim.adamw import layer_decay_scales
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    import jax

    cfg = tiny_model_config(head_type="vl")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    scales = layer_decay_scales(params, num_layers=cfg.encoder.layers, decay=0.9)
    # adapters at layer 0 -> smallest scale; heads at L+1 -> 1.0
    n_layers = cfg.encoder.layers
    adapter_scale = float(np.asarray(
        scales["encoder_wrapper"]["text_adapter"]["cls_embedding"]))
    head_scale = float(np.asarray(scales["text_proj"]["w"]))
    assert head_scale == pytest.approx(1.0)
    assert adapter_scale == pytest.approx(0.9 ** (n_layers + 1))
    # stacked layer leaves: vector increasing toward 1
    vec = np.asarray(
        scales["encoder_wrapper"]["fusion"]["layers"]["text_ffn"]["wi_0"]["w"]).ravel()
    assert vec[0] < vec[-1]


def test_decay_mask():
    from one_peace_tpu.optim.adamw import decay_mask
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    import jax

    cfg = tiny_model_config(head_type="vl")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    mask = decay_mask(params)
    # 2-D weights decay; biases / LN / gammas / cls do not
    assert mask["text_proj"]["w"] is True
    assert mask["text_proj"]["b"] is False
    assert mask["encoder_wrapper"]["text_adapter"]["cls_embedding"] is False
    layers = mask["encoder_wrapper"]["fusion"]["layers"]
    assert layers["self_attn"]["q_proj"]["w"] is True
    assert layers["self_attn_layer_norm"]["scale"] is False
    if "gamma_1" in layers:
        assert layers["gamma_1"] is False


def test_grad_accumulation_matches_large_batch():
    """update_freq=2 over half-batches must roughly track a single
    full-batch step (identical for sum-style losses; ITC is batch-coupled
    so just assert the accumulated path trains and steps once per 2
    micro-batches)."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer
    import jax

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    cfg.optimization.update_freq = 2
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)
    before = np.asarray(trainer.params["text_proj"]["w"])

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    trainer.train_step(batch)  # micro-step 1: no param change
    mid = np.asarray(trainer.params["text_proj"]["w"])
    np.testing.assert_array_equal(before, mid)
    # trainer.step counts OPTIMIZER updates (the reference's num_updates
    # unit that max_update / schedules / intervals mean) — after one
    # micro-batch of a 2-batch accumulation, no update has happened yet
    assert trainer.step == 0
    trainer.train_step(batch)  # micro-step 2: applied
    after = np.asarray(trainer.params["text_proj"]["w"])
    assert not np.array_equal(mid, after)
    assert trainer.step == 1
    trainer.train_step(batch)
    assert trainer.step == 1  # mid-accumulation again


def test_ema_decays_once_per_optimizer_update():
    """Under gradient accumulation the EMA shadow must decay once per
    OPTIMIZER update, not once per micro-batch (the reference's
    ema_module applies decay per num_updates)."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    cfg.optimization.update_freq = 2
    cfg.ema.store_ema = True
    cfg.ema.ema_decay = 0.5  # coarse so any spurious decay is visible
    model = OnePeaceRetrievalModel(cfg.model)
    trainer = Trainer(cfg, model, criterion=build_criterion(cfg.criterion))
    trainer.train_step(batch)
    trainer.train_step(batch)  # one full update; shadow decays once here
    assert trainer.step == 1
    after_update = np.asarray(
        jax.device_get(trainer.ema.shadow["text_proj"]["w"]), np.float32)
    trainer.train_step(batch)  # mid-accumulation: params do NOT move
    assert trainer.step == 1
    mid_accum = np.asarray(
        jax.device_get(trainer.ema.shadow["text_proj"]["w"]), np.float32)
    # the shadow trails the params; a per-micro-batch decay here would
    # pull it further toward the (unchanged) params — it must not move
    np.testing.assert_array_equal(after_update, mid_accum)


@pytest.mark.slow
def test_checkpoint_save_restore_roundtrip(tmp_path):
    """Preemption-safe resume: save the train state, rebuild a fresh
    trainer, restore, continue — params and step must carry over."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer
    from one_peace_tpu.utils import native_checkpoint as ckpt
    import jax

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    trainer.train_step(batch)
    trainer.train_step(batch)
    path = ckpt.save_train_state(str(tmp_path / "ckpts"), trainer.step,
                                 trainer.state_dict())
    assert ckpt.latest_checkpoint(str(tmp_path / "ckpts")) == path

    trainer2 = Trainer(cfg, model, criterion)
    state = ckpt.restore_train_state(path, trainer2.state_dict())
    trainer2.load_state_dict(state)
    assert trainer2.step == 2
    np.testing.assert_allclose(
        np.asarray(trainer2.params["text_proj"]["w"]),
        np.asarray(trainer.params["text_proj"]["w"]), rtol=1e-6)
    m1 = trainer.train_step(batch)
    m2 = trainer2.train_step(batch)
    assert m2["loss"] == pytest.approx(m1["loss"], rel=1e-4)


@pytest.mark.slow
def test_fp16_loss_scaling_path():
    """fp16 compute + dynamic loss scaling: trains, tracks the scale, and
    shrinks the scale on a poisoned batch instead of corrupting params."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    cfg.common.bf16 = False
    cfg.common.fp16 = True
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    m1 = trainer.train_step(batch)
    assert np.isfinite(m1["loss"]) and m1["skipped"] == 0.0
    scale_before = float(trainer.loss_scale.scale)
    bad = dict(batch)
    bad["src_images"] = np.full((8, 3, 32, 32), np.nan, np.float32)
    m2 = trainer.train_step(bad)
    assert m2["skipped"] == 1.0
    assert float(trainer.loss_scale.scale) < scale_before


def test_bf16_training_grads_through_conv_frontends():
    """bf16 compute must differentiate through the hMLP/audio conv stacks
    (regression: preferred_element_type used to break the conv VJP)."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    cfg.common.bf16 = True
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)
    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    m = trainer.train_step(batch)
    assert np.isfinite(m["loss"]) and m["skipped"] == 0.0 and m["gnorm"] > 0


def test_train_step_with_shard_map_pallas_attention(monkeypatch):
    """Full pjit train step with attn_impl='pallas' on the 2x2x2 mesh: the
    shard_map-wrapped kernel (interpret mode) must run inside the scanned
    encoder, fwd AND bwd, and match the XLA-attention step numerically."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.ops import flash_attention as fa
    from one_peace_tpu.trainer import Trainer

    monkeypatch.setattr(fa, "INTERPRET", True)

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }

    losses = {}
    for impl in ("pallas", "xla"):
        cfg = _tiny_framework_cfg()
        cfg.distributed.dp = 2
        cfg.model.encoder.attn_impl = impl
        model = OnePeaceRetrievalModel(cfg.model)
        criterion = build_criterion(cfg.criterion)
        trainer = Trainer(cfg, model, criterion)
        m1 = trainer.train_step(batch)
        m2 = trainer.train_step(batch)
        assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
        losses[impl] = (m1["loss"], m2["loss"])
    # step-1 losses are identical; step-2 (after one AdamW update) amplifies
    # accumulation-order noise through the normalized update direction
    np.testing.assert_allclose(losses["pallas"][0], losses["xla"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(losses["pallas"][1], losses["xla"][1],
                               rtol=2e-3, atol=2e-3)


def test_valid_step_jitted_and_bucketed(trained):
    """valid_step compiles once per batch-shape bucket and matches the
    training criterion's metrics.  The default return is DEVICE scalars
    (deferred fetch — per-batch conversion costs a tunnel RTT on axon);
    fetch=True restores eager floats."""
    import jax

    cfg, trainer, _ = trained
    rs = np.random.RandomState(1)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    m1 = trainer.valid_step(batch)
    assert all(isinstance(v, jax.Array) for v in m1.values()), {
        k: type(v) for k, v in m1.items()}
    mf = trainer.valid_step(batch, fetch=True)
    assert isinstance(mf["loss"], float)
    assert np.isfinite(m1["loss"])
    n_fns = len(trainer._valid_fns)
    m2 = trainer.valid_step(batch)  # same bucket: no new compile
    assert len(trainer._valid_fns) == n_fns
    assert m2["loss"] == m1["loss"]
    batch2 = {
        "src_tokens": rs.randint(5, 99, (8, 12)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    trainer.valid_step(batch2)  # new shape: new bucket
    assert len(trainer._valid_fns) == n_fns + 1


def test_skipped_step_leaves_optimizer_state_untouched():
    """A non-finite step must be a true no-op: Adam moments, counts and
    the MultiSteps accumulator all revert (zeroed grads would otherwise
    decay moments and advance the schedule)."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer
    import jax

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)
    rs = np.random.RandomState(0)
    good = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    trainer.train_step(good)  # move opt state off init
    before = jax.tree.map(np.asarray, jax.tree.leaves(trainer.opt_state))
    poison = dict(good)
    poison["src_images"] = np.full((8, 3, 32, 32), np.nan, np.float32)
    metrics = trainer.train_step(poison)
    assert metrics["skipped"] == 1.0
    after = jax.tree.map(np.asarray, jax.tree.leaves(trainer.opt_state))
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, a)


def test_layer_decay_with_trainable_mask():
    """layer_decay < 1 composed with a trainable_mask (multi_transform's
    MaskedNode sentinels) must not crash scale_by_tree, and frozen leaves
    must receive zero updates."""
    import jax
    import jax.numpy as jnp
    from one_peace_tpu.core.config import OptimizationConfig, OptimizerConfig
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.optim.adamw import build_optimizer
    from one_peace_tpu.optim.lr_schedule import build_lr_schedule
    from one_peace_tpu.core.config import LRSchedulerConfig
    from one_peace_tpu.trainer import _masked

    cfg = tiny_model_config(head_type="text")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt_cfg = OptimizationConfig(lr=1e-3, max_update=10, layer_decay=0.9)
    o_cfg = OptimizerConfig()
    sched = build_lr_schedule(LRSchedulerConfig(), opt_cfg, 10)
    tx = build_optimizer(o_cfg, opt_cfg, sched, params,
                         num_layers=cfg.encoder.layers)
    # freeze the text adapter, train everything else
    mask = jax.tree.map(lambda _: True, params)
    mask["encoder_wrapper"]["text_adapter"] = jax.tree.map(
        lambda _: False, mask["encoder_wrapper"]["text_adapter"])
    tx = _masked(tx, mask)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)  # crashed before
    froz = jax.tree.leaves(updates["encoder_wrapper"]["text_adapter"])
    assert all(float(np.abs(np.asarray(u)).max()) == 0.0 for u in froz)
    live = np.asarray(updates["text_proj"]["w"])
    assert float(np.abs(live).max()) > 0.0


def test_freeze_finetune_updates_traced_window():
    """The encoder is frozen for the first freeze_finetune_updates updates
    and unfreezes INSIDE the one compiled step (traced num_updates)."""
    import jax
    import optax as _optax
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.classify import OnePeaceClassifyModel
    from one_peace_tpu.trainer import Trainer

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    cfg.model.head_type = "image"
    cfg.criterion._name = "classify_criterion"
    model = OnePeaceClassifyModel(cfg.model, num_classes=4,
                                  freeze_finetune_updates=2)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)
    rs = np.random.RandomState(0)
    batch = {
        "net_input": {"src_images": rs.randn(8, 3, 32, 32).astype(np.float32)},
        "target": rs.randint(0, 4, (8,)),
    }
    enc0 = np.asarray(jax.tree.leaves(
        trainer.params["encoder_wrapper"])[0])
    head0 = np.asarray(jax.tree.leaves(trainer.params["classify_head"])[0])
    trainer.train_step(batch)   # update 0: frozen
    trainer.train_step(batch)   # update 1: frozen
    enc_frozen = np.asarray(jax.tree.leaves(
        trainer.params["encoder_wrapper"])[0])
    head_after = np.asarray(jax.tree.leaves(trainer.params["classify_head"])[0])
    np.testing.assert_array_equal(enc0, enc_frozen)   # encoder untouched
    assert not np.allclose(head0, head_after)         # head trains
    trainer.train_step(batch)   # update 2: unfrozen now
    enc_unfrozen = np.asarray(jax.tree.leaves(
        trainer.params["encoder_wrapper"])[0])
    assert not np.allclose(enc0, enc_unfrozen)


def test_ema_eval_source_and_best_export(tmp_path):
    """When cfg.ema.store_ema, validation scores the EMA shadow and
    checkpoint_best exports the SAME (EMA) tree — the reference passes the
    EMA model into valid_step (ref trainer.py:962-966) and best-exports
    EMA weights in the classification finetunes (main_ft.py model_ema_eval).
    cfg.ema.ema_eval=false (or task.uses_ema=False) restores raw params."""
    import jax

    from one_peace_tpu.cli.train import (_BEST_METRIC, _eval_params_source,
                                         _maybe_save_best)
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer
    from one_peace_tpu.utils import native_checkpoint as ckpt

    cfg = _tiny_framework_cfg()
    cfg.ema.store_ema = True
    cfg.ema.ema_decay = 0.5  # large step so shadow visibly lags params
    cfg.checkpoint.save_dir = str(tmp_path)
    cfg.checkpoint.best_checkpoint_metric = "r_mean"
    model = OnePeaceRetrievalModel(cfg.model)
    trainer = Trainer(cfg, model, build_criterion(cfg.criterion))
    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (16, 8)),
        "src_images": rs.randn(16, 3, 32, 32).astype(np.float32),
    }
    for _ in range(3):
        trainer.train_step(batch)

    path = ["encoder_wrapper", "fusion", "layers", "text_ffn", "wi_0", "w"]

    def leaf(tree):
        for k in path:
            tree = tree[k]
        return np.asarray(tree, np.float32)

    class Task:  # no uses_ema attribute -> cfg.ema.ema_eval decides
        pass

    src = _eval_params_source(cfg, Task(), trainer)
    np.testing.assert_allclose(leaf(src), leaf(trainer.ema.shadow))
    assert not np.allclose(leaf(src), leaf(trainer.params))

    _BEST_METRIC["value"] = None
    _maybe_save_best(cfg, trainer, {"r_mean": 1.0, "_eval_params": src})
    saved = ckpt.load_params(str(tmp_path / "checkpoint_best.npz"))
    np.testing.assert_allclose(leaf(saved), leaf(trainer.ema.shadow),
                               rtol=1e-6)

    cfg.ema.ema_eval = False
    assert _eval_params_source(cfg, Task(), trainer) is trainer.params

    cfg.ema.ema_eval = True
    task = Task()
    task.uses_ema = False  # task override beats the config default
    assert _eval_params_source(cfg, task, trainer) is trainer.params


def test_mid_accumulation_resume_completes_pending_update():
    """An epoch-end save can land MID-accumulation (epoch length not
    divisible by update_freq). The bundle carries MultiSteps' partial
    grads in opt_state and now the micro-step too — after resume, ONE more
    micro-batch must complete the pending accumulation (step advances,
    params move). The legacy derivation micro = step*update_freq restarted
    the window, permanently desyncing the EMA/step gates from the actual
    optimizer updates."""
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    cfg = _tiny_framework_cfg()
    cfg.distributed.fsdp = 1
    cfg.distributed.tp = 1
    cfg.optimization.update_freq = 2
    model = OnePeaceRetrievalModel(cfg.model)
    criterion = build_criterion(cfg.criterion)
    trainer = Trainer(cfg, model, criterion)

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }
    for _ in range(3):  # 1.5 accumulation windows
        trainer.train_step(batch)
    assert trainer.step == 1 and trainer._micro == 3

    state = jax.device_get(trainer.state_dict())
    trainer2 = Trainer(cfg, OnePeaceRetrievalModel(cfg.model), criterion)
    trainer2.load_state_dict(state)
    assert trainer2.step == 1 and trainer2._micro == 3

    before = np.asarray(trainer2.params["text_proj"]["w"])
    trainer2.train_step(batch)  # completes the half-done accumulation
    assert trainer2.step == 2
    assert not np.array_equal(before,
                              np.asarray(trainer2.params["text_proj"]["w"]))
