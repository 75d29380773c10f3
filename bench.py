#!/usr/bin/env python
"""Benchmark: ONE-PEACE 4B embedding throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images + audio clips embedded per second per chip with the full-size
4B model (d=1536, ffn=6144, 40 layers, 24 heads — README.md:58-64 of the
reference), bf16 params/activations, fused Pallas bias-attention.

vs_baseline: ratio against the target of "v5e-8 >= 5x A100 throughput"
(BASELINE.md): per-chip value * 8 chips / (5 * A100_EST), where A100_EST is
an estimate of the reference's per-A100 embedding throughput derived from
peak-FLOPs accounting (no throughput number exists in the reference repo —
SURVEY.md §6).  vs_baseline >= 1.0 means the 8-chip target is met.
"""

import json
import os
import sys
import time

# persistent compilation cache: axon remote compiles are minutes; cache makes
# repeat bench runs start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_one_peace")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from one_peace_tpu.core.config import ModelConfig  # noqa: E402
from one_peace_tpu.models.adapters.audio import conv_output_length  # noqa: E402
from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel  # noqa: E402

# Reference-throughput estimate for one A100 embedding images with the 4B
# model (xformers + bf16): ~45% MFU of 312 TFLOP/s peak over ~1.0 TFLOP per
# 256px image through the 1.5B vision branch + shared trunk -> ~140 img/s.
A100_EST_ITEMS_PER_S = 140.0
N_CHIPS_TARGET = 8
# 256/32 measured 138.4 items/s vs 136.6 at 128/16 (v5e, bf16)
IMG_BATCH = int(os.environ.get("BENCH_IMG_BATCH", 256))
AUD_BATCH = int(os.environ.get("BENCH_AUD_BATCH", 32))
AUDIO_SECONDS = 10
STEPS = int(os.environ.get("BENCH_STEPS", 8))


def fetch(x):
    """Force device->host completion.  On the axon platform
    ``block_until_ready`` returns before execution completes; a host copy
    is the reliable fence."""
    return np.asarray(x)


def main():
    # the v2 transpose-free lane-packed Pallas kernel beats XLA on the
    # 8-layer proxy (fwd 644 vs 576 img/s, train 153 vs 129) -> default
    cfg = ModelConfig(head_type="val")
    cfg.encoder.attn_impl = os.environ.get("BENCH_ATTN", "pallas")
    model = OnePeaceRetrievalModel(cfg)

    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    init_s = time.time() - t0
    print(f"# params={n_params/1e9:.2f}B init={init_s:.0f}s "
          f"device={jax.devices()[0]}", file=sys.stderr)

    imgs = jnp.asarray(np.random.RandomState(0).randn(IMG_BATCH, 3, 256, 256),
                       jnp.bfloat16)
    wav = jnp.asarray(
        np.random.RandomState(1).randn(AUD_BATCH, 16000 * AUDIO_SECONDS),
        jnp.float32)
    t_frames = conv_output_length(16000 * AUDIO_SECONDS,
                                  cfg.encoder.audio_adapter.feature_encoder_spec)
    pad = jnp.zeros((AUD_BATCH, t_frames + 1), bool)

    @jax.jit
    def embed_images(params, imgs):
        return model(params, src_images=imgs, encoder_type="image")

    @jax.jit
    def embed_audio(params, wav, pad):
        return model(params, src_audios=wav, audio_padding_masks=pad,
                     encoder_type="audio")

    # warmup/compile
    t0 = time.time()
    fetch(embed_images(params, imgs))
    print(f"# image compile {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    fetch(embed_audio(params, wav, pad))
    print(f"# audio compile {time.time()-t0:.0f}s", file=sys.stderr)

    # FLOPs accounting for an auditable MFU claim.  The closed-form count
    # is primary: XLA's compiled cost_analysis counts a while-loop body
    # ONCE, not x trip-count, so the 40-layer lax.scan trunk comes back
    # ~40x small (measured r3: 22 GF/image vs the true ~0.8 TF).  The
    # cost-analysis number is still printed to stderr as a cross-check of
    # the per-layer term (analytic/n_layers should be ~ cost_analysis).
    img_flops = _analytic_flops(cfg, seq_len=257, batch=IMG_BATCH,
                                frontend="image")
    aud_flops = _analytic_flops(cfg, seq_len=t_frames + 1, batch=AUD_BATCH,
                                frontend="audio",
                                wav_samples=16000 * AUDIO_SECONDS)
    xla_img = _flops_of(embed_images, (params, imgs))
    if xla_img:
        print(f"# xla cost_analysis (scan body counted once): "
              f"{xla_img/IMG_BATCH/1e9:.1f} GF/image vs analytic/layer "
              f"{img_flops/IMG_BATCH/cfg.encoder.layers/1e9:.1f} GF",
              file=sys.stderr)

    # timed steady state: dispatch every step, fence ONCE at the end.
    # TPU execution is in-order, so fetching the final outputs forces all
    # queued steps; a per-step fetch would pay a full tunnel round-trip
    # (~150 ms observed even for 8-byte copies) 2*STEPS times — a
    # measurement artifact, not device throughput.  The final fetch (the
    # only reliable fence on this platform) stays inside the window.
    t0 = time.time()
    outs = []
    for _ in range(STEPS):
        outs.append(embed_images(params, imgs))
        outs.append(embed_audio(params, wav, pad))
    fetch(outs[-1])
    fetch(outs[-2])
    dt = time.time() - t0
    items = STEPS * (IMG_BATCH + AUD_BATCH)
    per_chip = items / dt
    vs_baseline = per_chip * N_CHIPS_TARGET / (5 * A100_EST_ITEMS_PER_S)

    tflops = None
    mfu = None
    peak = _peak_tflops()
    if img_flops and aud_flops:
        total_flops = STEPS * (img_flops + aud_flops)
        tflops = total_flops / dt / 1e12
        mfu = tflops / peak if peak else None
        print(f"# measured {tflops:.1f} TFLOP/s"
              + (f" = {100*mfu:.1f}% MFU of {peak:.0f} bf16 peak" if mfu else ""),
              file=sys.stderr)
        print(f"# flops/item: image {img_flops/IMG_BATCH/1e9:.1f} GF, "
              f"audio {aud_flops/AUD_BATCH/1e9:.1f} GF "
              f"(A100 denominator {A100_EST_ITEMS_PER_S} items/s is an "
              f"estimate; audit via TFLOP/s above)", file=sys.stderr)

    # per-branch comparators, same batches and same fence discipline as
    # the mixed loop: (a) a bf16 image-only number the int8 loop below is
    # directly comparable to (the r3 "+23%" had no like-for-like
    # comparator in the artifact), (b) an audio-only number that
    # localizes per-branch TFLOP/s (an audio clip costs ~2x an image)
    t0 = time.time()
    outs_i = [embed_images(params, imgs) for _ in range(STEPS)]
    fetch(outs_i[-1])
    dt_img = time.time() - t0
    bf16_img = STEPS * IMG_BATCH / dt_img
    t0 = time.time()
    outs_a = [embed_audio(params, wav, pad) for _ in range(STEPS)]
    fetch(outs_a[-1])
    dt_aud = time.time() - t0
    aud_per_s = STEPS * AUD_BATCH / dt_aud
    if img_flops and aud_flops:
        print(f"# per-branch: image {STEPS*img_flops/dt_img/1e12:.1f} "
              f"TFLOP/s ({bf16_img:.1f} img/s), audio "
              f"{STEPS*aud_flops/dt_aud/1e12:.1f} TFLOP/s "
              f"({aud_per_s:.1f} clip/s)", file=sys.stderr)

    # second reported number: opt-in int8-FFN serving path (numerics-
    # opt-in, so it rides alongside the parity headline instead of
    # replacing it); BENCH_INT8_ATTN=1 additionally quantizes the
    # self-attention projections (quantize='ffn_attn')
    int8_value = None
    int8_aud = None
    if os.environ.get("BENCH_INT8", "1") != "0":
        try:
            from one_peace_tpu.ops.quant import quantize_ffn_params

            include_attn = os.environ.get("BENCH_INT8_ATTN", "0") == "1"
            scope = "FFN+attn" if include_attn else "FFN"
            params_q = quantize_ffn_params(params,
                                           include_attn=include_attn)

            # the quantized tree has a different pytree structure, so the
            # existing jitted embed functions retrace automatically — no
            # separate _q variants needed
            fetch(embed_images(params_q, imgs))  # compile
            t0 = time.time()
            outs_q = [embed_images(params_q, imgs) for _ in range(STEPS)]
            fetch(outs_q[-1])
            dtq = time.time() - t0
            int8_value = STEPS * IMG_BATCH / dtq
            print(f"# int8-{scope} serving "
                  f"(opt-in): {int8_value:.1f} img/s/chip vs bf16 "
                  f"image-only {bf16_img:.1f} "
                  f"({100*(int8_value/bf16_img-1):+.1f}%)", file=sys.stderr)

            fetch(embed_audio(params_q, wav, pad))  # compile
            t0 = time.time()
            outs_aq = [embed_audio(params_q, wav, pad)
                       for _ in range(STEPS)]
            fetch(outs_aq[-1])
            dtq = time.time() - t0
            int8_aud = STEPS * AUD_BATCH / dtq
            print(f"# int8-{scope} audio serving (opt-in): {int8_aud:.1f} "
                  f"clip/s/chip vs bf16 audio-only {aud_per_s:.1f} "
                  f"({100*(int8_aud/aud_per_s-1):+.1f}%)", file=sys.stderr)
        except Exception as e:  # int8 path must never sink the headline
            int8_aud = None
            print(f"# int8 branch skipped: {e}", file=sys.stderr)

    record = {
        "metric": "images+audio clips embedded/sec/chip at 4B",
        "value": round(per_chip, 3),
        "unit": "items/s/chip",
        "vs_baseline": round(vs_baseline, 4),
    }
    if tflops is not None:
        record["tflops"] = round(tflops, 2)
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
    record["bf16_img_per_s"] = round(bf16_img, 3)
    record["aud_clip_per_s"] = round(aud_per_s, 3)
    if int8_value is not None:
        record["int8_img_per_s"] = round(int8_value, 3)
    if int8_value is not None and int8_aud is not None:
        record["int8_clip_per_s"] = round(int8_aud, 3)
    print(json.dumps(record))


def _flops_of(jitted, args):
    """XLA's own FLOPs estimate for one call (None if unsupported on this
    backend — e.g. remote compile without cost analysis)."""
    try:
        flops = jitted.lower(*args).compile().cost_analysis()["flops"]
        return float(flops) if flops and flops > 0 else None
    except Exception:
        return None


def _peak_tflops():
    """Per-chip dense bf16 peak for the local device kind."""
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    table = {
        "v5 lite": 197.0, "v5e": 197.0, "v5litepod": 197.0,
        "v4": 275.0, "v5p": 459.0, "v6e": 918.0, "v6 lite": 918.0,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 197.0  # assume v5e (the bench target) when the kind is opaque


def _analytic_flops(cfg, seq_len: int, batch: int, frontend: str,
                    wav_samples: int = 0) -> float:
    """Closed-form FLOPs for one embedding batch (2 FLOPs per MAC):
    40-layer trunk matmuls + attention + frontend convs.  Used when XLA
    cost analysis is unavailable; within a few % of it (elementwise ops
    excluded)."""
    d = cfg.encoder.embed_dim
    f = cfg.encoder.ffn_embed_dim
    n_layers = cfg.encoder.layers
    L = seq_len
    per_layer = 2 * (4 * L * d * d) + 2 * (2 * L * L * d) + 2 * (3 * L * d * f)
    flops = n_layers * per_layer
    if frontend == "image":
        # hMLP: conv4 (3->d/4, k4 s4) + conv2 (d/4->d/2) + conv2 (d/2->d)
        hw = 256
        flops += 2 * ((hw // 4) ** 2 * (d // 4) * 3 * 16
                      + (hw // 8) ** 2 * (d // 2) * (d // 4) * 4
                      + (hw // 16) ** 2 * d * (d // 2) * 4)
    elif frontend == "audio":
        t = wav_samples
        cin = 1
        for (ch, k, s) in cfg.encoder.audio_adapter.feature_encoder_spec:
            t = (t - k) // s + 1
            flops += 2 * t * ch * cin * k
            cin = ch
        flops += 2 * t * d * cin  # post-extract projection
    return float(batch * flops)


if __name__ == "__main__":
    main()
