#!/usr/bin/env python
"""Validate + measure the fused projection dots on the real chip.

ONE_PEACE_FUSED_PROJ packs the qkv projections into one (d, 3d) matmul
(read zero-copy by the Pallas attention via lane-offset index maps) and
the GeGLU wi pair into one (d, 2f) matmul.  Parity gate: given the same
qkv VALUES, packed attention must be BIT-identical to the separate-array
kernel on real Mosaic partial blocks (interpret mode zero-fills OOB and
cannot catch offset/masking bugs).  Then times the 8-layer proxy fused vs
unfused, fwd and train fwd+bwd.

  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_fused_proj.py
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

import one_peace_tpu.models.encoder as enc  # noqa: E402
from one_peace_tpu.ops import flash_attention as fa  # noqa: E402

BATCH = int(os.environ.get("BENCH_IMG_BATCH", 256))
TRAIN_BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", 32))
STEPS = int(os.environ.get("BENCH_STEPS", 10))


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


def check_parity(l=257, h=24, d=64, b=4):
    scaling = d ** -0.5
    q, k, v = (_rand((b, l, h, d), i) for i in range(3))
    bias = _rand((h, l, l), 3)
    mask = np.zeros((b, l), bool)
    mask[:, -5:] = True
    mask = jnp.asarray(mask)
    qkv = jnp.concatenate([q.reshape(b, l, h * d), k.reshape(b, l, h * d),
                           v.reshape(b, l, h * d)], axis=-1)

    out_p = np.asarray(jax.jit(
        lambda *a: fa.flash_attention_packed(*a, scaling, h))(qkv, bias, mask))
    out_s = np.asarray(jax.jit(
        lambda *a: fa.flash_attention(*a, scaling))(q, k, v, bias, mask)
        ).reshape(b, l, h * d)
    e = float(np.abs(out_p - out_s).max())
    print(f"fwd L={l}: |packed-separate|={e:.2e}", flush=True)
    assert e == 0.0, "packed fwd != separate (offset/masking bug)"

    def loss_p(qkv, bias):
        return jnp.sum(fa.flash_attention_packed(qkv, bias, mask, scaling, h) ** 2)

    def loss_s(q, k, v, bias):
        return jnp.sum(fa.flash_attention(q, k, v, bias, mask, scaling) ** 2)

    dqkv, dbias_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(qkv, bias)
    dq, dk, dv, dbias_s = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2, 3)))(
        q, k, v, bias)
    ref = np.concatenate([np.asarray(x).reshape(b, l, h * d)
                          for x in (dq, dk, dv)], axis=-1)
    e = float(np.abs(np.asarray(dqkv) - ref).max())
    eb = float(np.abs(np.asarray(dbias_p) - np.asarray(dbias_s)).max())
    print(f"bwd L={l}: |d(qkv)-[dq|dk|dv]|={e:.2e} |dbias|={eb:.2e}", flush=True)
    assert e == 0.0 and eb == 0.0, "packed bwd != separate"


def build(fused):
    from one_peace_tpu.core.config import ModelConfig
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel

    enc._FUSED_PROJ = fused
    cfg = ModelConfig(head_type="val")
    cfg.encoder.layers = 8
    cfg.encoder.attn_impl = "pallas"
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    return model, params


def time_fwd(fused):
    model, params = build(fused)
    imgs = jnp.asarray(np.random.RandomState(0).randn(BATCH, 3, 256, 256),
                       jnp.bfloat16)

    @jax.jit
    def embed(params, imgs):
        return model(params, src_images=imgs, encoder_type="image")

    t0 = time.time()
    out = embed(params, imgs)
    np.asarray(out[0, :8])
    print(f"# fwd compile {time.time()-t0:.0f}s fused={fused}", flush=True)
    t0 = time.time()
    outs = [embed(params, imgs) for _ in range(STEPS)]
    np.asarray(outs[-1][0, :8])
    rate = STEPS * BATCH / (time.time() - t0)
    print(f"fwd fused={fused}: {rate:.1f} img/s", flush=True)
    return rate


def time_train(fused):
    model, params = build(fused)
    imgs = jnp.asarray(np.random.RandomState(0).randn(TRAIN_BATCH, 3, 256, 256),
                       jnp.bfloat16)

    @jax.jit
    def step(params, imgs):
        def loss(p):
            emb = model(p, src_images=imgs, encoder_type="image")
            return jnp.mean(emb.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        return l, jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype),
                               params, g)

    t0 = time.time()
    l, params2 = step(params, imgs)
    np.asarray(l)
    print(f"# train compile {time.time()-t0:.0f}s fused={fused}", flush=True)
    t0 = time.time()
    for _ in range(STEPS):
        l, params = step(params, imgs)
    np.asarray(l)
    rate = STEPS * TRAIN_BATCH / (time.time() - t0)
    print(f"train fused={fused}: {rate:.1f} img/s", flush=True)
    return rate


def main():
    print("== parity (real Mosaic partial blocks) ==", flush=True)
    check_parity(257)
    if "--parity-only" in sys.argv:
        return
    print("== proxy throughput ==", flush=True)
    f1 = time_fwd(True)
    f0 = time_fwd(False)
    t1 = time_train(True)
    t0_ = time_train(False)
    print(f"fwd fused vs not: {100*(f1/f0-1):+.1f}%   "
          f"train fused vs not: {100*(t1/t0_-1):+.1f}%", flush=True)


if __name__ == "__main__":
    main()
