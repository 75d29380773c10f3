"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_peace_tpu.ops.attention import multihead_attention
from one_peace_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run the Pallas kernel in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    orig = fa.pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", patched)


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


@pytest.mark.parametrize("l", [10, 64])
@pytest.mark.parametrize("with_bias", [True, False])
@pytest.mark.parametrize("with_mask", [True, False])
def test_matches_xla(l, with_bias, with_mask):
    b, h, d = 2, 4, 16
    q = _rand((b, l, h, d), 0)
    k = _rand((b, l, h, d), 1)
    v = _rand((b, l, h, d), 2)
    bias = _rand((h, l, l), 3) if with_bias else None
    mask = None
    if with_mask:
        mask = np.zeros((b, l), bool)
        mask[0, -3:] = True
        mask = jnp.asarray(mask)
    scaling = d**-0.5
    ref = multihead_attention(q, k, v, bias, mask, scaling, impl="xla")
    out = fa.flash_attention(q, k, v, bias, mask, scaling)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_batched_bias():
    b, l, h, d = 2, 12, 4, 16
    q, k, v = _rand((b, l, h, d), 0), _rand((b, l, h, d), 1), _rand((b, l, h, d), 2)
    bias = _rand((b, h, l, l), 3)
    scaling = d**-0.5
    ref = multihead_attention(q, k, v, bias, None, scaling, impl="xla")
    out = fa.flash_attention(q, k, v, bias, None, scaling)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("l", [128, 257, 272, 570])
def test_unpadded_l_matches_xla(l):
    """v3 passes UNPADDED arrays: l=128 exercises the mask-free aligned
    path, 257 the single-tile partial block (image branch), 272 the
    16-aligned-but-not-128-aligned case (masked_kv without masked_q in
    the bwd; q-tile exactly covers l), 570 the ceil-grid multi-tile
    overhang (blk_q=512, 2 q-tiles over lpad=640)."""
    b, h, d = 1, 2, 16
    q = _rand((b, l, h, d), 0)
    k = _rand((b, l, h, d), 1)
    v = _rand((b, l, h, d), 2)
    bias = _rand((h, l, l), 3)
    mask = np.zeros((b, l), bool)
    mask[0, -5:] = True
    mask = jnp.asarray(mask)
    scaling = d**-0.5
    ref = multihead_attention(q, k, v, bias, mask, scaling, impl="xla")
    out = fa.flash_attention(q, k, v, bias, mask, scaling)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_unpadded_l_gradients_match():
    """Backward through the partial-block path (l=137, lpad=256)."""
    b, l, h, d = 1, 137, 2, 8
    q, k, v = _rand((b, l, h, d), 0), _rand((b, l, h, d), 1), _rand((b, l, h, d), 2)
    bias = _rand((h, l, l), 3)
    scaling = d**-0.5

    def loss_flash(q, k, v, bias):
        return jnp.sum(fa.flash_attention(q, k, v, bias, None, scaling) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(multihead_attention(q, k, v, bias, None, scaling,
                                           impl="xla") ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_force_pad_escape_hatch(monkeypatch):
    """ONE_PEACE_ATTN_PAD=1 restores the v2 pad-outside path, same math."""
    monkeypatch.setattr(fa, "_FORCE_PAD", True)
    b, l, h, d = 1, 37, 2, 16
    q, k, v = _rand((b, l, h, d), 0), _rand((b, l, h, d), 1), _rand((b, l, h, d), 2)
    bias = _rand((h, l, l), 3)
    scaling = d**-0.5
    ref = multihead_attention(q, k, v, bias, None, scaling, impl="xla")
    out = fa.flash_attention(q, k, v, bias, None, scaling)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match():
    b, l, h, d = 1, 16, 2, 8
    q, k, v = _rand((b, l, h, d), 0), _rand((b, l, h, d), 1), _rand((b, l, h, d), 2)
    bias = _rand((h, l, l), 3)
    scaling = d**-0.5

    def loss_flash(q, k, v, bias):
        return jnp.sum(fa.flash_attention(q, k, v, bias, None, scaling) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(multihead_attention(q, k, v, bias, None, scaling, impl="xla") ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# multi-device path: shard_map-wrapped kernel on the 8-device CPU mesh
# ---------------------------------------------------------------------------

def _mesh222():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    return Mesh(devs, ("dp", "fsdp", "tp"))


@pytest.mark.parametrize("with_mask", [True, False])
@pytest.mark.parametrize("bias_kind", ["shared", "batched", "none"])
def test_shard_map_forward(monkeypatch, with_mask, bias_kind):
    from one_peace_tpu.ops import attention as attn

    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(attn, "_FLASH_MESH", _mesh222())

    b, l, h, d = 4, 20, 4, 16
    q, k, v = _rand((b, l, h, d), 0), _rand((b, l, h, d), 1), _rand((b, l, h, d), 2)
    bias = {"shared": _rand((h, l, l), 3),
            "batched": _rand((b, h, l, l), 3),
            "none": None}[bias_kind]
    mask = None
    if with_mask:
        mask = np.zeros((b, l), bool)
        mask[0, -3:] = True
        mask = jnp.asarray(mask)
    scaling = d**-0.5
    assert attn._flash_mode() == "shard_map"
    out = jax.jit(lambda *a: multihead_attention(*a, scaling, impl="pallas"))(
        q, k, v, bias, mask)
    ref = multihead_attention(q, k, v, bias, mask, scaling, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_shard_map_gradients(monkeypatch):
    """Bias cotangent needs a psum over the data axes (bias is replicated
    there); q/k/v cotangents stay batch-sharded."""
    from one_peace_tpu.ops import attention as attn

    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(attn, "_FLASH_MESH", _mesh222())

    b, l, h, d = 4, 16, 4, 8
    q, k, v = _rand((b, l, h, d), 0), _rand((b, l, h, d), 1), _rand((b, l, h, d), 2)
    bias = _rand((h, l, l), 3)
    mask = np.zeros((b, l), bool)
    mask[1, -2:] = True
    mask = jnp.asarray(mask)
    scaling = d**-0.5

    def loss(impl):
        def f(q, k, v, bias):
            return jnp.sum(
                multihead_attention(q, k, v, bias, mask, scaling, impl=impl) ** 2)
        return f

    g1 = jax.jit(jax.grad(loss("pallas"), argnums=(0, 1, 2, 3)))(q, k, v, bias)
    g2 = jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2, 3)))(q, k, v, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_shard_map_indivisible_falls_back(monkeypatch):
    """h=3 does not divide tp=2: dispatch must return the XLA result."""
    from one_peace_tpu.ops import attention as attn

    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(attn, "_FLASH_MESH", _mesh222())

    b, l, h, d = 4, 12, 3, 16
    q, k, v = _rand((b, l, h, d), 0), _rand((b, l, h, d), 1), _rand((b, l, h, d), 2)
    scaling = d**-0.5
    out = multihead_attention(q, k, v, None, None, scaling, impl="pallas")
    ref = multihead_attention(q, k, v, None, None, scaling, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_softmax_optin_close_to_fp32():
    """ONE_PEACE_SOFTMAX=bf16 (here: the module flag) must stay within
    bf16 rounding of the fp32 softmax on the XLA path — it is a measured
    serving option, not a different function."""
    import numpy as np

    from one_peace_tpu.ops import attention as A
    from one_peace_tpu.ops import flash_attention as fa

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 24, 4, 16), jnp.float32)
    k = jnp.asarray(rs.randn(2, 24, 4, 16), jnp.float32)
    v = jnp.asarray(rs.randn(2, 24, 4, 16), jnp.float32)
    bias = jnp.asarray(rs.randn(4, 24, 24), jnp.float32)
    ref = np.asarray(A.multihead_attention(q, k, v, bias, None, 0.25,
                                           impl="xla"))
    saved = fa._SOFTMAX_BF16
    fa._SOFTMAX_BF16 = True
    try:
        out = np.asarray(A.multihead_attention(q, k, v, bias, None, 0.25,
                                               impl="xla"))
    finally:
        fa._SOFTMAX_BF16 = saved
    assert np.abs(out - ref).max() < 0.05  # bf16 rounding, not divergence
    assert np.abs(out - ref).max() > 0  # and the knob actually engaged
