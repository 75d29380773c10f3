#!/usr/bin/env python
"""Measure the vision-branch (1.5B) training step on the real chip.

The serving headline (bench.py) is driver-recorded; this script pins the
TRAINING side at the reference's single-accelerator training geometry:
the 1.5B vision branch (image adapter + 40 layers with the image FFN
only — what det/seg/video finetuning trains, ref README.md:65-67),
forward + backward under remat + AdamW, bf16 params/activations.

The FULL 4B model cannot train on one 16 GB chip in ANY framework
(params+grads+Adam m/v ≈ 32 GB; measured here: XLA asks 21.7 GB with
bf16 opt state) — 4B training shards over the fsdp axis, which the
driver's multichip dryrun certifies.

  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_train_4b.py

Never run concurrently with pytest (host contention costs ~35%).
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

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", 16))
STEPS = int(os.environ.get("BENCH_STEPS", 8))
LAYERS = int(os.environ.get("BENCH_LAYERS", 40))


def main():
    import optax

    from one_peace_tpu.core.config import ModelConfig
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel

    # head_type="image" prunes to the 1.5B vision branch (the retrieval
    # model re-derives use_*_moe from head_type, ref :43-51)
    cfg = ModelConfig(head_type="image")
    cfg.encoder.layers = LAYERS
    cfg.encoder.checkpoint_activations = True  # remat per layer
    cfg.encoder.remat_policy = os.environ.get("BENCH_REMAT", "full")
    model = OnePeaceRetrievalModel(cfg)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"# params={n_params/1e9:.2f}B init={time.time()-t0:.0f}s", flush=True)

    tx = optax.adamw(1e-4, b1=0.9, b2=0.98, weight_decay=0.05)
    opt_state = jax.jit(tx.init)(params)

    imgs = jnp.asarray(np.random.RandomState(0).randn(BATCH, 3, 256, 256),
                       jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, imgs):
        def loss_fn(p):
            emb = model(p, src_images=imgs, encoder_type="image",
                        deterministic=True)
            # ITC-shaped surrogate: in-batch similarity cross-entropy
            sim = (emb @ emb.T).astype(jnp.float32) * 20.0
            tgt = jnp.arange(sim.shape[0])
            return optax.softmax_cross_entropy_with_integer_labels(
                sim, tgt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, imgs)
    np.asarray(loss)
    print(f"# train compile+first {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state, imgs)
    np.asarray(loss)
    dt = time.time() - t0
    rate = STEPS * BATCH / dt
    # analytic FLOPs: serving fwd ~797.3 GF/img at 40 layers (bench.py's
    # closed-form count; the non-layer part is <2%), scaled linearly to
    # BENCH_LAYERS; train under FULL per-layer remat ~= 4x fwd matmul
    # work (fwd + replay + 2x bwd).  APPROXIMATE: BENCH_REMAT=qkv replays
    # slightly less than 1x, so its util reads ~1% high; peak 197 is
    # v5e bf16.
    gf_item = 797.3 * (LAYERS / 40) * 4
    tflops = rate * gf_item / 1000
    print(f"train {'1.5B vision-branch' if LAYERS == 40 else f'{LAYERS}L'} "
          f"ITC step: {rate:.2f} img/s "
          f"({dt/STEPS*1000:.0f} ms/step at B={BATCH}) "
          f"~{tflops:.1f} TFLOP/s ~= {tflops/197*100:.1f}% of v5e bf16 peak "
          f"(approx; full-remat FLOP model)", flush=True)


if __name__ == "__main__":
    main()
