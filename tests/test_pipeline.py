"""Pipeline parallelism vs serial layer scan on the CPU mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from one_peace_tpu.parallel.pipeline import pipeline_forward


def _layer_body(layer_params, x, aux, bcast=None):
    y = jnp.tanh(x @ layer_params["w"] + layer_params["b"])
    if aux is not None:
        y = y * aux
    return y


def _setup(layers=8, d=16, b=8):
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    stacked = {
        "w": jax.vmap(lambda k: jax.random.normal(k, (d, d)) * 0.3)(keys),
        "b": jnp.zeros((layers, d)),
    }
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d))
    aux = (jax.random.uniform(jax.random.PRNGKey(2), (b, d)) > 0.3).astype(
        jnp.float32)
    return stacked, x, aux


def _serial(stacked, x, aux):
    def body(c, lp):
        return _layer_body(lp, c, aux), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def _pp_mesh(n=4):
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:n]).reshape(n)
    return Mesh(devices, ("pp",))


def test_pipeline_matches_serial():
    mesh = _pp_mesh()
    stacked, x, _ = _setup()
    want = _serial(stacked, x, None)
    for m in (2, 4, 8):
        got = pipeline_forward(_layer_body, stacked, x, mesh,
                               num_micro_batches=m, axis="pp")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_batch_aux_micro_sliced():
    """Batch-shaped side inputs must follow their micro-batch through the
    stages (each stage sees the aux slice of the activation it holds)."""
    mesh = _pp_mesh()
    stacked, x, aux = _setup()
    want = _serial(stacked, x, aux)
    got = pipeline_forward(_layer_body, stacked, x, mesh,
                           num_micro_batches=4, batch_aux=aux)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_serial():
    """GPipe is exact: grads w.r.t. params AND inputs equal the serial
    scan's (the reverse pass pipelines through the transposed ppermute)."""
    mesh = _pp_mesh()
    stacked, x, aux = _setup()

    def loss_pp(stacked, x):
        out = pipeline_forward(_layer_body, stacked, x, mesh,
                               num_micro_batches=4, batch_aux=aux,
                               checkpoint_stages=True)
        return jnp.sum(out ** 2)

    def loss_serial(stacked, x):
        return jnp.sum(_serial(stacked, x, aux) ** 2)

    gp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked, x)
    gs = jax.jit(jax.grad(loss_serial, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_trainer_pipeline_training_step():
    """Full Trainer integration: pp=2 x dp=2 x fsdp=2 mesh, encoder routed
    through the pipeline, one ITC step == the serial-mesh step's loss, and
    training proceeds (finite, decreasing over a few steps)."""
    from helpers import tiny_model_config
    from one_peace_tpu.core.config import FrameworkConfig
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 99, (8, 8)),
        "src_images": rs.randn(8, 3, 32, 32).astype(np.float32),
    }

    losses = {}
    for pp in (2, 1):
        cfg = FrameworkConfig()
        cfg.model = tiny_model_config(head_type="vl")
        cfg.criterion._name = "image_text_retrieval_criterion"
        cfg.optimization.lr = 5e-3
        cfg.optimization.max_update = 50
        cfg.common.bf16 = False
        cfg.distributed.pp = pp
        cfg.distributed.dp = 2
        cfg.distributed.fsdp = 2 if pp == 1 else 2
        cfg.distributed.tp = 2 if pp == 1 else 1
        cfg.distributed.pp_micro_batches = 4
        model = OnePeaceRetrievalModel(cfg.model)
        criterion = build_criterion(cfg.criterion)
        trainer = Trainer(cfg, model, criterion)
        if pp > 1:
            assert model.wrapper.fusion.pp_mesh is not None
            # stacked layer params actually sharded over pp
            w = trainer.params["encoder_wrapper"]["fusion"]["layers"][
                "self_attn"]["q_proj"]["w"]
            assert "pp" in str(w.sharding.spec)
        m = [trainer.train_step(batch) for _ in range(3)]
        assert all(np.isfinite(h["loss"]) for h in m)
        losses[pp] = [h["loss"] for h in m]
    # GPipe is exact: identical first-step loss; post-update steps track
    # within accumulation-order noise amplified by the AdamW normalization
    np.testing.assert_allclose(losses[2][0], losses[1][0],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(losses[2][1:], losses[1][1:],
                               rtol=2e-3, atol=2e-3)
