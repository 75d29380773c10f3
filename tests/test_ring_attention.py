"""Ring attention vs full attention on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_peace_tpu.ops.attention import multihead_attention
from one_peace_tpu.ops.ring_attention import ring_attention_sharded
from one_peace_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("with_bias,with_mask", [(True, True), (False, False)])
def test_matches_full_attention(with_bias, with_mask):
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    b, l, h, d = 2, 32, 4, 16  # L sharded 8 ways -> chunks of 4
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, l, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, h, d))
    bias = jax.random.normal(jax.random.PRNGKey(3), (h, l, l)) if with_bias else None
    mask = None
    if with_mask:
        m = np.zeros((b, l), bool)
        m[0, -5:] = True
        mask = jnp.asarray(m)
    scaling = d**-0.5

    ref = multihead_attention(q, k, v, bias, mask, scaling, impl="xla")
    out = ring_attention_sharded(mesh, q, k, v, bias, mask, scaling, axis="tp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
