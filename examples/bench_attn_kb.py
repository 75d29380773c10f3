#!/usr/bin/env python
"""Chip gate for the has_kb specialization (mask-free key-bias skip).

Mask-free branches (the image branch) now thread ``key_bias=None`` through
the Pallas kernels, which compile the (1, Lk) row add and the (B, lpad)
VMEM fetch away entirely.  Mathematically this drops an add of exact
zeros, so the kernel must be BIT-IDENTICAL to the old zeros-row path on
real hardware (interpret mode zero-fills OOB, so CPU tests cannot certify
the dummy-block DMA); this script checks fwd + bwd bit-identity at the
image length and a multi-tile overhang, then times the 8-layer proxy
forward mask-free (where the specialization engages) to size the win.

  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_attn_kb.py
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

BATCH = int(os.environ.get("BENCH_IMG_BATCH", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 10))


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


def check_parity(l, h=24, d=64, b=4):
    scaling = d ** -0.5
    q, k, v = (_rand((b, l, h, d), i) for i in range(3))
    bias = _rand((h, l, l), 3)
    q3, k3, v3 = (a.reshape(b, l, h * d) for a in (q, k, v))
    zeros_kb = jnp.zeros((b, l), jnp.float32)

    none_out = np.asarray(jax.jit(lambda *a: fa._flash_attention_core(
        *a, None, scaling, h))(q3, k3, v3, bias))
    zero_out = np.asarray(jax.jit(lambda *a: fa._flash_attention_core(
        *a, scaling, h))(q3, k3, v3, bias, zeros_kb))
    e = float(np.abs(none_out - zero_out).max())
    print(f"fwd L={l}: |none-zeros|={e:.2e}", flush=True)
    assert e == 0.0, f"fwd has_kb specialization != zeros row at L={l}"

    def loss_none(q_, k_, v_, bias_):
        return jnp.sum(fa._flash_attention_core(
            q_, k_, v_, bias_, None, scaling, h) ** 2)

    def loss_zero(q_, k_, v_, bias_):
        return jnp.sum(fa._flash_attention_core(
            q_, k_, v_, bias_, zeros_kb, scaling, h) ** 2)

    g1 = jax.jit(jax.grad(loss_none, argnums=(0, 1, 2, 3)))(q3, k3, v3, bias)
    g2 = jax.jit(jax.grad(loss_zero, argnums=(0, 1, 2, 3)))(q3, k3, v3, bias)
    for name, a, b_ in zip("q k v bias".split(), g1, g2):
        e = float(np.abs(np.asarray(a) - np.asarray(b_)).max())
        print(f"bwd L={l} d{name}: |none-zeros|={e:.2e}", flush=True)
        assert e == 0.0, f"bwd has_kb parity FAILED at L={l} d{name}"


def time_proxy(tag):
    from one_peace_tpu.core.config import ModelConfig
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel

    cfg = ModelConfig(head_type="val")
    cfg.encoder.layers = 8
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).randn(BATCH, 3, 256, 256),
                       jnp.bfloat16)

    @jax.jit
    def embed(params, imgs):
        return model(params, src_images=imgs, encoder_type="image")

    t0 = time.time()
    np.asarray(embed(params, imgs)[0, :8])
    print(f"# compile {time.time()-t0:.0f}s {tag}", flush=True)
    t0 = time.time()
    outs = [embed(params, imgs) for _ in range(STEPS)]
    np.asarray(outs[-1][0, :8])
    rate = STEPS * BATCH / (time.time() - t0)
    print(f"{tag}: {rate:.1f} img/s", flush=True)
    return rate


def main():
    print("== has_kb bit-identity (real Mosaic) ==", flush=True)
    check_parity(257)
    check_parity(570)
    if "--parity-only" in sys.argv:
        return
    print("== proxy throughput (mask-free image branch) ==", flush=True)
    time_proxy("has_kb=None (current default)")


if __name__ == "__main__":
    main()
