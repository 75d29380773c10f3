#!/usr/bin/env python
"""Measure the int8 serving modes on the 8-layer same-dims proxy.

Runs the proxy image branch three ways in one process — bf16 baseline,
int8 FFN (quantize_ffn_params), int8 FFN+attention projections
(include_attn=True) — and reports img/s plus the embedding drift of each
quantized mode against the bf16 run.

  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_int8_mode.py
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
from one_peace_tpu.ops.quant import quantize_ffn_params  # noqa: E402

BATCH = int(os.environ.get("BENCH_IMG_BATCH", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 10))


def run(model, params, imgs, tag):
    embed = jax.jit(lambda p, x: model(p, src_images=x, encoder_type="image"))
    t0 = time.time()
    out = embed(params, imgs)
    np.asarray(out[0, :8])
    print(f"# compile {time.time()-t0:.0f}s {tag}", flush=True)
    t0 = time.time()
    outs = [embed(params, imgs) for _ in range(STEPS)]
    np.asarray(outs[-1][0, :8])
    dt = time.time() - t0
    print(f"{tag}: {STEPS*BATCH/dt:.1f} img/s", flush=True)
    return np.asarray(outs[-1], np.float32)


def main():
    cfg = ModelConfig(head_type="val")
    cfg.encoder.layers = 8  # proxy: same dims, 8 layers
    cfg.encoder.attn_impl = os.environ.get("BENCH_ATTN", "pallas")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).randn(BATCH, 3, 256, 256),
                       jnp.bfloat16)

    ref = run(model, params, imgs, f"bf16 attn={cfg.encoder.attn_impl}")

    for tag, include_attn in (("int8-ffn", False), ("int8-ffn+attn", True)):
        q = dict(params)
        q["encoder_wrapper"] = quantize_ffn_params(
            params["encoder_wrapper"], include_attn=include_attn)
        got = run(model, q, imgs, f"{tag} attn={cfg.encoder.attn_impl}")
        cos = (got * ref).sum(-1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
        print(f"{tag} drift vs bf16: min cos {cos.min():.6f}, "
              f"max |delta| {np.abs(got - ref).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
