#!/usr/bin/env python
"""Validate + measure the v3 unpadded-L Pallas attention on the real chip.

The v3 kernel passes logically-sized (B, L, H*Dh) arrays and lets Mosaic
DMA partial blocks; the out-of-bounds fill is UNINITIALIZED VMEM on real
hardware (interpret mode zero-fills, so CPU tests cannot catch a masking
bug).  This script checks fwd + bwd parity against the XLA path at the
image-branch length (257) and a multi-tile overhang (570), then times the
8-layer proxy under v3 / v2 (ONE_PEACE_ATTN_PAD=1 semantics) / XLA.

  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_attn_pad_mode.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_one_peace")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from one_peace_tpu.ops import flash_attention as fa  # noqa: E402
from one_peace_tpu.ops.attention import multihead_attention  # noqa: E402

BATCH = int(os.environ.get("BENCH_IMG_BATCH", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 10))


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


def check_parity(l, h=24, d=64, b=4):
    """v3 (partial blocks + in-kernel masking) must be BIT-IDENTICAL to v2
    (pad-outside): same kernel math on the same padded geometry, only the
    DMA source differs.  vs XLA both sit ~6e-4 off (MXU fp32 matmul
    precision — measured identically distant from an fp64 ground truth),
    so the XLA check is a loose sanity bound only."""
    scaling = d ** -0.5
    q, k, v = (_rand((b, l, h, d), i) for i in range(3))
    bias = _rand((h, l, l), 3)
    mask = np.zeros((b, l), bool)
    mask[:, -5:] = True
    mask = jnp.asarray(mask)

    out = np.asarray(jax.jit(
        lambda *a: fa.flash_attention(*a, scaling))(q, k, v, bias, mask))
    fa._FORCE_PAD = True
    ref2 = np.asarray(jax.jit(
        lambda *a: fa.flash_attention(*a, scaling))(q, k, v, bias, mask))
    fa._FORCE_PAD = False
    refx = np.asarray(jax.jit(
        lambda *a: multihead_attention(*a, scaling, impl="xla"))(
            q, k, v, bias, mask))
    e2 = float(np.abs(out - ref2).max())
    ex = float(np.abs(out - refx).max())
    print(f"fwd L={l}: |v3-v2|={e2:.2e} |v3-xla|={ex:.2e}", flush=True)
    assert e2 == 0.0, f"fwd v3 != v2 at L={l} (masking bug)"
    assert ex < 5e-3, f"fwd parity vs XLA FAILED at L={l}"

    def loss_p(q, k, v, bias):
        return jnp.sum(fa.flash_attention(q, k, v, bias, mask, scaling) ** 2)

    g1 = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    fa._FORCE_PAD = True
    g2 = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)),
                 )(q, k, v, bias)
    fa._FORCE_PAD = False
    # bit-exactness only holds when the Pallas bwd engages in both arms;
    # over the VMEM budget both fall back to the XLA einsum vjp, where the
    # two padded geometries (lpad vs l) reassociate floats differently.
    lpad = -(-l // 128) * 128
    lsub = fa._pick_lsub(l, lpad)
    m = fa._heads_per_program(h, d)
    pallas_bwd = fa._bwd_vmem_bytes(b, lsub, lpad, m, d, 4, False,
                                    True) <= fa._BWD_VMEM_BUDGET
    for name, a, b_ in zip("q k v bias".split(), g1, g2):
        e = float(np.abs(np.asarray(a) - np.asarray(b_)).max())
        scale = float(np.abs(np.asarray(b_)).max())
        print(f"bwd L={l} d{name}: |v3-v2|={e:.2e} "
              f"({'pallas' if pallas_bwd else 'xla-fallback'})", flush=True)
        if pallas_bwd:
            assert e == 0.0, f"bwd v3 != v2 at L={l} d{name} (masking bug)"
        else:
            assert e < 3e-3 * max(scale, 1.0), \
                f"bwd fallback parity FAILED at L={l} d{name}"


def time_proxy(attn_impl, force_pad, coarse_q=False):
    from one_peace_tpu.core.config import ModelConfig
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel

    fa._FORCE_PAD = force_pad
    fa._COARSE_Q = coarse_q
    cfg = ModelConfig(head_type="val")
    cfg.encoder.layers = 8
    cfg.encoder.attn_impl = attn_impl
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).randn(BATCH, 3, 256, 256),
                       jnp.bfloat16)

    @jax.jit
    def embed(params, imgs):
        return model(params, src_images=imgs, encoder_type="image")

    t0 = time.time()
    out = embed(params, imgs)
    np.asarray(out[0, :8])
    print(f"# compile {time.time()-t0:.0f}s impl={attn_impl} pad={force_pad}",
          flush=True)

    t0 = time.time()
    outs = [embed(params, imgs) for _ in range(STEPS)]
    np.asarray(outs[-1][0, :8])
    dt = time.time() - t0
    label = {("pallas", False): "pallas-v3-unpadded",
             ("pallas", True): "pallas-v2-pad",
             ("xla", False): "xla"}[(attn_impl, force_pad)]
    if coarse_q and attn_impl == "pallas":
        label += "-coarseQ"
    rate = STEPS * BATCH / dt
    print(f"{label}: {rate:.1f} img/s", flush=True)
    return rate


def main():
    print("== parity (real Mosaic partial blocks) ==", flush=True)
    check_parity(257)   # image branch: one 384-row tile over 257 rows
    check_parity(570)   # blk_q=512 ceil-grid: 2 tiles over lpad=640
    print("== proxy throughput ==", flush=True)
    if "--parity-only" in sys.argv:
        return
    r3 = time_proxy("pallas", False)
    rc = time_proxy("pallas", False, coarse_q=True)
    r2 = time_proxy("pallas", True, coarse_q=True)
    rx = time_proxy("xla", False)
    print(f"fineQ vs coarseQ: {100*(r3/rc-1):+.1f}%  "
          f"v3 vs v2: {100*(r3/r2-1):+.1f}%  "
          f"v3 vs xla: {100*(r3/rx-1):+.1f}%", flush=True)


if __name__ == "__main__":
    main()
