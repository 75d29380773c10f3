#!/usr/bin/env python
"""Profile one embedding branch on the real chip and rank device op costs.

Traces STEPS steady-state steps of the image or audio branch (8-layer proxy
by default — same dims as the 4B model, fewer layers — or the full 40-layer
model with --full), then parses the chrome trace and prints total device
time grouped by fusion/op name.  This is the round's profile-guided-perf
entry point: run it, read the top table, attack the top non-matmul row.

  PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_branch.py
  ... profile_branch.py --branch audio
  ... profile_branch.py --full --steps 3
"""

import glob
import gzip
import json
import os
import re
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
from one_peace_tpu.models.adapters.audio import conv_output_length  # noqa: E402
from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel  # noqa: E402


def build(branch: str, full: bool, attn_impl: str):
    cfg = ModelConfig(head_type="val")
    if not full:
        cfg.encoder.layers = 8
    cfg.encoder.attn_impl = attn_impl
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if branch == "image":
        batch = int(os.environ.get("BENCH_IMG_BATCH", 256))
        x = jnp.asarray(np.random.RandomState(0).randn(batch, 3, 256, 256),
                        jnp.bfloat16)

        @jax.jit
        def step(p, x):
            return model(p, src_images=x, encoder_type="image")

        return step, (params, x), batch
    batch = int(os.environ.get("BENCH_AUD_BATCH", 32))
    wav = jnp.asarray(np.random.RandomState(1).randn(batch, 160000),
                      jnp.float32)
    t = conv_output_length(160000,
                           cfg.encoder.audio_adapter.feature_encoder_spec)
    pad = jnp.zeros((batch, t + 1), bool)

    @jax.jit
    def step(p, wav, pad):
        return model(p, src_audios=wav, audio_padding_masks=pad,
                     encoder_type="audio")

    return step, (params, wav, pad), batch


def parse_trace(logdir: str, steps: int, layers: int):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"no trace under {logdir}", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Map pid/tid -> names so we only count device op lanes (not host
    # threads or the steps/annotations lanes that double-count time).
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_us, track_us = {}, {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        track = tid_name.get((e.get("pid"), e.get("tid")), "")
        proc = pid_name.get(e.get("pid"), "")
        key = f"{proc} / {track}"
        track_us[key] = track_us.get(key, 0.0) + e["dur"]
        if "TPU" in proc and ("XLA Op" in track or "Ops" in track):
            # strip the .N suffix XLA appends to repeated fusions
            name = re.sub(r"\.\d+$", "", e["name"])
            op_us[name] = op_us.get(name, 0.0) + e["dur"]
    print("\n== tracks (total us) ==")
    for k, v in sorted(track_us.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v/1e3:10.2f} ms  {k}")
    if not op_us:
        # fall back: aggregate every X event by name, noisiest first
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                name = re.sub(r"\.\d+$", "", e["name"])
                op_us[name] = op_us.get(name, 0.0) + e["dur"]
    total = sum(op_us.values())
    print(f"\n== ops (sum {total/1e3:.1f} ms over {steps} steps; "
          f"per-layer = /{steps}/{layers}) ==")
    for name, us in sorted(op_us.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {us/1e3:9.2f} ms  {us/steps/layers:8.1f} us/lyr  "
              f"{100*us/total:5.1f}%  {name[:90]}")


def main():
    branch = "audio" if "--branch" in sys.argv and \
        sys.argv[sys.argv.index("--branch") + 1] == "audio" else "image"
    full = "--full" in sys.argv
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 5
    attn = os.environ.get("BENCH_ATTN", "pallas")
    step, args, batch = build(branch, full, attn)
    layers = 40 if full else 8

    t0 = time.time()
    out = step(*args)
    np.asarray(out[0, :8])
    print(f"# compile {time.time()-t0:.0f}s branch={branch} "
          f"layers={layers} attn={attn}", flush=True)

    logdir = f"/tmp/op_profile_{branch}_{layers}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    t0 = time.time()
    outs = [step(*args) for _ in range(steps)]
    np.asarray(outs[-1][0, :8])
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"{branch} x{layers}L: {steps*batch/dt:.1f} items/s "
          f"({1e3*dt/steps:.1f} ms/step)", flush=True)
    parse_trace(logdir, steps, layers)


if __name__ == "__main__":
    main()
