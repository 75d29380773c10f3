#!/usr/bin/env python
"""Measure the opt-in bf16 softmax (ONE_PEACE_SOFTMAX=bf16) on the proxy.

Runs the 8-layer same-dims proxy image branch and reports img/s; run once
per mode (the env var is read at import):

  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_softmax_mode.py
  ONE_PEACE_SOFTMAX=bf16 PYTHONPATH=... python examples/bench_softmax_mode.py

Pass ``--drift`` to also print the cosine similarity of the embeddings
against the fp32-softmax reference computed in-process via the XLA path.
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

from one_peace_tpu.core.config import ModelConfig  # noqa: E402
from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel  # noqa: E402

BATCH = int(os.environ.get("BENCH_IMG_BATCH", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 10))


def main():
    mode = os.environ.get("ONE_PEACE_SOFTMAX", "fp32")
    cfg = ModelConfig(head_type="val")
    cfg.encoder.layers = 8  # proxy: same dims, 8 layers
    cfg.encoder.attn_impl = os.environ.get("BENCH_ATTN", "pallas")
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
    print(f"# compile {time.time()-t0:.0f}s mode={mode} "
          f"attn={cfg.encoder.attn_impl}", flush=True)

    t0 = time.time()
    outs = [embed(params, imgs) for _ in range(STEPS)]
    np.asarray(outs[-1][0, :8])
    dt = time.time() - t0
    print(f"softmax={mode} attn={cfg.encoder.attn_impl}: "
          f"{STEPS*BATCH/dt:.1f} img/s", flush=True)

    if "--drift" in sys.argv:
        ref = np.asarray(outs[-1], np.float32)
        # fp32 reference via the XLA path with the env forced off in-process
        from one_peace_tpu.ops import flash_attention as fa
        saved = fa._SOFTMAX_BF16
        fa._SOFTMAX_BF16 = False
        try:
            cfg.encoder.attn_impl = "xla"
            ref32 = np.asarray(
                jax.jit(lambda p, x: model(p, src_images=x,
                                           encoder_type="image"))(params, imgs),
                np.float32)
        finally:
            fa._SOFTMAX_BF16 = saved
            cfg.encoder.attn_impl = os.environ.get("BENCH_ATTN", "pallas")
        cos = (ref * ref32).sum(-1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(ref32, axis=-1))
        print(f"drift vs fp32-XLA: min cos {cos.min():.6f}, "
              f"max |delta| {np.abs(ref - ref32).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
