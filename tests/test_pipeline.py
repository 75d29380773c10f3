"""Pipeline parallelism vs serial layer scan on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from one_peace_tpu.parallel.mesh import make_mesh
from one_peace_tpu.parallel.pipeline import pipeline_forward


def _layer_body(layer_params, x):
    return jnp.tanh(x @ layer_params["w"] + layer_params["b"])


def test_pipeline_matches_serial():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("pp",))
    layers, d = 8, 16
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    stacked = {
        "w": jax.vmap(lambda k: jax.random.normal(k, (d, d)) * 0.3)(keys),
        "b": jnp.zeros((layers, d)),
    }
    x = jax.random.normal(jax.random.PRNGKey(1), (8, d))

    def serial(x):
        def body(c, lp):
            return _layer_body(lp, c), None

        out, _ = jax.lax.scan(body, x, stacked)
        return out

    want = serial(x)
    for m in (2, 4, 8):
        got = pipeline_forward(_layer_body, stacked, x, mesh,
                               num_micro_batches=m, axis="pp")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
