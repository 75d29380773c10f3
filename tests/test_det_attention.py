"""Det global-layer flash attention (Pallas, interpret mode on CPU) vs the
materializing XLA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_peace_tpu.ops import det_attention as da
from one_peace_tpu.ops import flash_attention as fa
from one_peace_tpu.vision.det_backbone import shared_bias_from_table

HEADS, DH = 4, 16
SRC_BUCKET, BUCKET = 4, 8
HG = WG = 8
L = HG * WG
SCALING = DH ** -0.5


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fa, "INTERPRET", True)


def _table(rs):
    return jnp.asarray(rs.randn((2 * SRC_BUCKET - 1) ** 2 + 3, HEADS), jnp.float32)


def _qkv(rs, b=2, l=L):
    return (jnp.asarray(rs.randn(b, l, HEADS, DH), jnp.float32),
            jnp.asarray(rs.randn(b, l, HEADS, DH), jnp.float32),
            jnp.asarray(rs.randn(b, l, HEADS, DH), jnp.float32))


def test_toeplitz_factor_equals_gathered_bias():
    rs = np.random.RandomState(0)
    table = _table(rs)
    toep = da.toeplitz_tables(table, SRC_BUCKET, BUCKET)
    got = da._bias_from_toeplitz(toep, HG, WG)
    want = shared_bias_from_table(table, SRC_BUCKET, BUCKET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_toeplitz_slice_matches_smaller_grid():
    """The bias depends only on relative coords: slicing the bucket-sized
    factor to an (h, w) sub-grid equals the (h, w) gather."""
    rs = np.random.RandomState(1)
    table = _table(rs)
    toep = da.toeplitz_tables(table, SRC_BUCKET, BUCKET)
    h = w = 6
    off = BUCKET - h
    sliced = toep[:, off:off + 2 * h - 1, :w, :w]
    got = da._bias_from_toeplitz(sliced, h, w)
    full = shared_bias_from_table(table, SRC_BUCKET, BUCKET)
    full = full.reshape(HEADS, BUCKET, BUCKET, BUCKET, BUCKET)
    want = full[:, :h, :w, :h, :w].reshape(HEADS, h * w, h * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("use_toep,use_decomp",
                         [(True, True), (True, False), (False, True),
                          (False, False)])  # no-bias: heads must not be
                                            # derived from toep/bh (crash)
def test_kernel_matches_xla(use_toep, use_decomp):
    rs = np.random.RandomState(2)
    q, k, v = _qkv(rs)
    toep = da.toeplitz_tables(_table(rs), SRC_BUCKET, BUCKET) if use_toep else None
    rel_h = jnp.asarray(0.1 * rs.randn(2 * HG - 1, DH), jnp.float32) if use_decomp else None
    rel_w = jnp.asarray(0.1 * rs.randn(2 * WG - 1, DH), jnp.float32) if use_decomp else None
    b = q.shape[0]
    out = da.det_flash_attention(q, k, v, toep, rel_h, rel_w, (HG, WG), SCALING)
    ref = da._xla_reference(q.reshape(b, L, -1), k.reshape(b, L, -1),
                            v.reshape(b, L, -1), toep, rel_h, rel_w,
                            (HG, WG), SCALING, HEADS)
    np.testing.assert_allclose(np.asarray(out.reshape(b, L, -1)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_flow_to_all_tables():
    """bwd (XLA vjp) must produce cotangents for q/k/v AND the shared
    Toeplitz factor and decomposed tables (all trainable in det FT)."""
    rs = np.random.RandomState(3)
    q, k, v = _qkv(rs, b=1)
    toep = da.toeplitz_tables(_table(rs), SRC_BUCKET, BUCKET)
    rel_h = jnp.asarray(0.1 * rs.randn(2 * HG - 1, DH), jnp.float32)
    rel_w = jnp.asarray(0.1 * rs.randn(2 * WG - 1, DH), jnp.float32)
    b = 1

    def loss_kernel(q, k, v, toep, rel_h, rel_w):
        o = da.det_flash_attention(q, k, v, toep, rel_h, rel_w, (HG, WG), SCALING)
        return jnp.sum(o ** 2)

    def loss_ref(q3, k3, v3, toep, rel_h, rel_w):
        o = da._xla_reference(q3, k3, v3, toep, rel_h, rel_w,
                              (HG, WG), SCALING, HEADS)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, toep, rel_h, rel_w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        q.reshape(b, L, -1), k.reshape(b, L, -1), v.reshape(b, L, -1),
        toep, rel_h, rel_w)
    for name, a, want in zip("q k v toep rel_h rel_w".split(), g1, g2):
        np.testing.assert_allclose(np.asarray(a).reshape(want.shape),
                                   np.asarray(want), rtol=1e-4, atol=1e-4,
                                   err_msg=name)


def test_det_backbone_kernel_path_matches_xla():
    """Full DetBackbone forward: attn_impl='pallas' (interpret) ==
    attn_impl='xla' with materialized bias."""
    from one_peace_tpu.vision.det_backbone import DetBackbone

    rs = np.random.RandomState(4)
    imgs = jnp.asarray(rs.randn(1, 3, 64, 64), jnp.float32)
    outs = {}
    for impl in ("pallas", "xla"):
        backbone = DetBackbone(
            embed_dim=32, ffn_embed_dim=64, heads=HEADS, layers=4,
            bucket_size=4, pretrain_bucket_size=SRC_BUCKET, window_size=2,
            global_period=2, checkpoint_activations=False, attn_impl=impl)
        params = backbone.init(jax.random.PRNGKey(0))
        params["rel_pos_table"] = _table(np.random.RandomState(5))
        outs[impl] = np.asarray(backbone(params, imgs))
    np.testing.assert_allclose(outs["pallas"], outs["xla"],
                               rtol=2e-5, atol=2e-5)


def test_kernel_asymmetric_tiles(monkeypatch):
    """c != ck exercises the general dy-slab window (c+ck-1 rows)."""
    monkeypatch.setenv("ONE_PEACE_DET_BLKQ", "16")   # c = 2 rows
    monkeypatch.setenv("ONE_PEACE_DET_BLKK", "32")   # ck = 4 rows
    rs = np.random.RandomState(6)
    q, k, v = _qkv(rs)
    toep = da.toeplitz_tables(_table(rs), SRC_BUCKET, BUCKET)
    rel_h = jnp.asarray(0.1 * rs.randn(2 * HG - 1, DH), jnp.float32)
    rel_w = jnp.asarray(0.1 * rs.randn(2 * WG - 1, DH), jnp.float32)
    b = q.shape[0]
    out = da.det_flash_attention(q, k, v, toep, rel_h, rel_w, (HG, WG), SCALING)
    ref = da._xla_reference(q.reshape(b, L, -1), k.reshape(b, L, -1),
                            v.reshape(b, L, -1), toep, rel_h, rel_w,
                            (HG, WG), SCALING, HEADS)
    np.testing.assert_allclose(np.asarray(out.reshape(b, L, -1)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_toep,use_decomp",
                         [(True, True), (True, False), (False, True)])
def test_pallas_bwd_matches_xla_vjp(use_toep, use_decomp, monkeypatch):
    """The two-pass Pallas backward == the materializing einsum vjp for
    every bias combination (dq/dk/dv/dtoep/drel_h/drel_w)."""
    monkeypatch.setenv("ONE_PEACE_DET_BLKQ", "16")   # c = 2: several q tiles
    monkeypatch.setenv("ONE_PEACE_DET_BWD_BLKK", "24")  # ck != c in the bwd
    rs = np.random.RandomState(7)
    q, k, v = _qkv(rs, b=2)
    toep = (da.toeplitz_tables(_table(rs), SRC_BUCKET, BUCKET)
            if use_toep else None)
    rel_h = (jnp.asarray(0.1 * rs.randn(2 * HG - 1, DH), jnp.float32)
             if use_decomp else None)
    rel_w = (jnp.asarray(0.1 * rs.randn(2 * WG - 1, DH), jnp.float32)
             if use_decomp else None)
    b = q.shape[0]
    args = [a for a in (toep, rel_h, rel_w) if a is not None]

    def loss(impl):
        def f(q, k, v, *rest):
            it = iter(rest)
            tp = next(it) if use_toep else None
            rh = next(it) if use_decomp else None
            rw = next(it) if use_decomp else None
            monkeypatch.setenv("ONE_PEACE_DET_BWD", impl)
            o = da.det_flash_attention(q, k, v, tp, rh, rw, (HG, WG),
                                       SCALING)
            return jnp.sum(jnp.sin(o))
        return f

    n = 3 + len(args)
    g_pal = jax.grad(loss("pallas"), argnums=tuple(range(n)))(q, k, v, *args)
    g_xla = jax.grad(loss("xla"), argnums=tuple(range(n)))(q, k, v, *args)
    names = ["q", "k", "v"] + (["toep"] if use_toep else []) + \
        (["rel_h", "rel_w"] if use_decomp else [])
    for name, a, want in zip(names, g_pal, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def _mesh22():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    return Mesh(devs, ("dp", "fsdp"))


def test_shard_map_det_forward_and_grads(monkeypatch):
    """Under a registered mesh the det kernel runs through shard_map
    (batch over the data axes, bias tables replicated with psum'd
    cotangents) and matches the single-device path exactly."""
    from one_peace_tpu.ops import attention as attn

    monkeypatch.setattr(attn, "_FLASH_MESH", _mesh22())
    rs = np.random.RandomState(8)
    b = 4
    q, k, v = _qkv(rs, b=b)
    toep = da.toeplitz_tables(_table(rs), SRC_BUCKET, BUCKET)
    rel_h = jnp.asarray(0.1 * rs.randn(2 * HG - 1, DH), jnp.float32)
    rel_w = jnp.asarray(0.1 * rs.randn(2 * WG - 1, DH), jnp.float32)
    assert attn._flash_mode() == "shard_map"

    def loss(q, k, v, toep, rel_h, rel_w):
        o = da.det_flash_attention(q, k, v, toep, rel_h, rel_w,
                                   (HG, WG), SCALING)
        return jnp.sum(jnp.sin(o))

    g_sm = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(
        q, k, v, toep, rel_h, rel_w)
    monkeypatch.setattr(attn, "_FLASH_MESH", None)
    g_direct = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(
        q, k, v, toep, rel_h, rel_w)
    for name, a, b_ in zip("q k v toep rel_h rel_w".split(), g_sm, g_direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_shard_map_det_indivisible_batch_falls_back(monkeypatch):
    """A batch that does not divide the data axes still computes (direct
    path), it just loses the fused sharding."""
    from one_peace_tpu.ops import attention as attn

    monkeypatch.setattr(attn, "_FLASH_MESH", _mesh22())
    rs = np.random.RandomState(9)
    q, k, v = _qkv(rs, b=3)  # 3 % 4 != 0
    toep = da.toeplitz_tables(_table(rs), SRC_BUCKET, BUCKET)
    out = da.det_flash_attention(q, k, v, toep, None, None, (HG, WG),
                                 SCALING)
    ref = da._xla_reference(
        q.reshape(3, L, -1), k.reshape(3, L, -1), v.reshape(3, L, -1),
        toep, None, None, (HG, WG), SCALING, HEADS)
    np.testing.assert_allclose(np.asarray(out.reshape(3, L, -1)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_head_pack_lane_legality():
    """qkv blocks carry m*dh lanes; Mosaic needs a 128-multiple.  The
    support gate must reject geometries with no legal pack (falling back
    to XLA) instead of passing them to a lowering failure."""
    assert da._head_pack(16, 64) == 2      # measured default
    assert da._head_pack(16, 128) == 2     # measured default
    assert da._head_pack(8, 96) == 4       # 384 lanes
    assert da._head_pack(6, 96) is None    # no divisor of 6 works
    assert da._head_pack(7, 64) is None    # 448 lanes is not 128-aligned
    assert da._head_pack(4, 32) == 4       # 128 lanes, full pack
    assert da._head_pack(16, 8) == 16      # tiny heads pack fully
    for heads, dh in [(16, 64), (8, 96), (4, 32)]:
        m = da._head_pack(heads, dh)
        assert heads % m == 0 and (m * dh) % 128 == 0 and m * dh <= 512
