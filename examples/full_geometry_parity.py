"""Full-geometry numerics parity: 40 layers / 1536 dim / 24 heads.

SURVEY.md §7 hard part #1 is "exact numerics across 40 layers — error
compounds"; the tiny 2-layer parity tests cannot bound depth-40 drift.
This harness runs the independent torch fixture (tests/torch_fixture.py,
fairseq-naming state dict, reference forward math) against the JAX
implementation at the REAL model geometry (ref README.md:58-64: 4B params,
hidden 1536, 24 heads, 40 layers — all three modality FFN branches)
through all three branches + the VL concat path, layer by layer.

Modes:
  generate  — run BOTH sides, write the golden fixture
              (tests/fixtures/full_geometry_golden.npz: torch final
              embeddings + per-layer drift curves) and print the drift
              table for PARITY.md.
  check     — regenerate the (deterministic) state dict, run the JAX side
              only, compare against the committed golden.  This is what
              tests/test_full_geometry_parity.py (slow tier) runs.

The state dict is seeded (np.random.RandomState — numpy guarantees stream
stability), so the golden file pins the torch-side result forever without
committing 16 GB of weights.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN = os.path.join(REPO, "tests", "fixtures", "full_geometry_golden.npz")

SD_SEED = 0
TOKENS = np.array(
    [[5, 61, 78, 19, 40, 22, 90, 4, 77, 120, 33, 2, 1, 1, 1, 1],
     [9, 71, 28, 55, 6, 192, 88, 40, 13, 7, 21, 50, 31, 90, 46, 2]],
    np.int64)  # row 0 carries trailing pads; ids < 200 so the smoke
               # config's tiny vocab serves the same inputs
IMAGE_SEED, IMAGE_SHAPE = 11, (1, 3, 256, 256)   # L = 257, the real 256px grid
AUDIO_SEED, AUDIO_LEN = 12, 32000                # 2 s @ 16 kHz -> ~100 frames


def real_config():
    from one_peace_tpu.core.config import ModelConfig

    cfg = ModelConfig(head_type="val")  # defaults ARE the 4B geometry
    enc = cfg.encoder
    assert (enc.embed_dim, enc.ffn_embed_dim, enc.layers,
            enc.attention_heads) == (1536, 6144, 40, 24)
    if os.environ.get("ONE_PEACE_PARITY_SMOKE"):  # plumbing shakeout only
        enc.embed_dim, enc.ffn_embed_dim = 48, 96
        enc.layers, enc.attention_heads = 3, 4
        enc.text_adapter.vocab_size = 200
    return cfg


def _inputs(cfg):
    from one_peace_tpu.models.adapters.audio import conv_output_length

    imgs = np.random.RandomState(IMAGE_SEED).randn(*IMAGE_SHAPE).astype(np.float32)
    wav = np.random.RandomState(AUDIO_SEED).randn(1, AUDIO_LEN).astype(np.float32)
    t_out = conv_output_length(AUDIO_LEN, cfg.encoder.audio_adapter.feature_encoder_spec)
    apad = np.zeros((1, t_out + 1), bool)
    apad[0, -7:] = True  # exercise the audio padding path at depth
    return imgs, wav, apad


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def torch_side(cfg, sd):
    """Final embeddings + per-layer encoder states for every branch."""
    import torch_fixture as tf

    imgs, wav, apad = _inputs(cfg)
    out = {}
    layer_states = {}

    # final embeddings (L2-normalized CLS proj per unimodal branch)
    out["text"] = tf.retrieval_forward(sd, cfg, "text", src_tokens=TOKENS).numpy()
    out["image"] = tf.retrieval_forward(sd, cfg, "image", src_images=imgs).numpy()
    out["audio"] = tf.retrieval_forward(
        sd, cfg, "audio", src_audios=wav, audio_padding_masks=apad).numpy()
    out["vl"] = tf.retrieval_forward(
        sd, cfg, "vl", src_tokens=TOKENS[:1], src_images=imgs).numpy()

    # per-layer hidden states, text + image branches (the drift curve)
    x, pad, biases = tf.text_adapter_forward(sd, cfg, TOKENS)
    states = tf.encoder_layer_states(sd, cfg, x, pad, biases, "text",
                                     (x.shape[1], 0, 0))
    layer_states["text"] = [s.numpy() for s in states]
    x, pad, biases = tf.image_adapter_forward(sd, cfg, imgs)
    states = tf.encoder_layer_states(sd, cfg, x, pad, biases, "image",
                                     (0, x.shape[1], 0))
    layer_states["image"] = [s.numpy() for s in states]
    return out, layer_states


def jax_side(cfg, params, model, with_layers=True):
    import jax.numpy as jnp

    imgs, wav, apad = _inputs(cfg)
    out = {}
    out["text"] = np.asarray(model(params, src_tokens=jnp.asarray(TOKENS),
                                   encoder_type="text"))
    out["image"] = np.asarray(model(params, src_images=jnp.asarray(imgs),
                                    encoder_type="image"))
    out["audio"] = np.asarray(model(params, src_audios=jnp.asarray(wav),
                                    audio_padding_masks=jnp.asarray(apad),
                                    encoder_type="audio"))
    text_f, image_f, _ = model.wrapper(
        params["encoder_wrapper"], src_tokens=jnp.asarray(TOKENS[:1]),
        src_images=jnp.asarray(imgs), encoder_type="vl")
    out["vl"] = np.concatenate([np.asarray(text_f), np.asarray(image_f)], axis=1)

    layer_states = {}
    if with_layers:
        wrapper = model.wrapper
        tp = params["encoder_wrapper"]
        xj, padj, biasj = wrapper.text_adapter(tp["text_adapter"],
                                               jnp.asarray(TOKENS))
        _, hid = wrapper.fusion(tp["fusion"], xj, padj, biasj, "text",
                                (xj.shape[1], 0, 0), return_all_hiddens=True)
        layer_states["text"] = [np.asarray(h) for h in hid]
        xj, padj, biasj = wrapper.image_adapter(tp["image_adapter"],
                                                jnp.asarray(imgs))
        _, hid = wrapper.fusion(tp["fusion"], xj, padj, biasj, "image",
                                (0, xj.shape[1], 0), return_all_hiddens=True)
        layer_states["image"] = [np.asarray(h) for h in hid]
    return out, layer_states


def build_jax(cfg, sd):
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.utils.checkpoint_convert import (
        convert_retrieval_model, to_jax)

    model = OnePeaceRetrievalModel(cfg)
    params = to_jax(convert_retrieval_model(sd, cfg))
    return model, params


def generate():
    import torch_fixture as tf

    cfg = real_config()
    print("generating 4B state dict (seed %d)..." % SD_SEED, flush=True)
    sd = tf.make_random_state_dict(cfg, seed=SD_SEED)
    print("torch side...", flush=True)
    t_out, t_layers = torch_side(cfg, sd)
    print("jax side...", flush=True)
    model, params = build_jax(cfg, sd)
    j_out, j_layers = jax_side(cfg, params, model)

    save = {}
    for k, v in t_out.items():
        save[f"emb_{k}"] = v.astype(np.float32)
        print(f"final {k}: cos={_cos(j_out[k], v):.9f} "
              f"max|d|={np.abs(j_out[k] - v).max():.3e}", flush=True)
    for branch in t_layers:
        cs = np.array([_cos(j, t) for j, t in
                       zip(j_layers[branch], t_layers[branch])])
        md = np.array([float(np.abs(j - t).max()) for j, t in
                       zip(j_layers[branch], t_layers[branch])])
        save[f"layer_cos_{branch}"] = cs
        save[f"layer_maxd_{branch}"] = md
        print(f"{branch} drift curve (layer: cos, max|d|):", flush=True)
        for i in range(len(cs)):
            print(f"  L{i:02d}: {cs[i]:.9f}  {md[i]:.3e}")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, **save)
    print("wrote", GOLDEN, flush=True)


def check(tol=1e-3):
    """JAX-side regression vs the committed torch golden (cosine >= 1-tol
    at depth 40 — the BASELINE drift criterion at the real geometry)."""
    import torch_fixture as tf

    cfg = real_config()
    sd = tf.make_random_state_dict(cfg, seed=SD_SEED)
    model, params = build_jax(cfg, sd)
    del sd
    j_out, _ = jax_side(cfg, params, model, with_layers=False)
    golden = np.load(GOLDEN)
    report = {}
    for k in ("text", "image", "audio", "vl"):
        c = _cos(j_out[k], golden[f"emb_{k}"])
        report[k] = c
        assert c >= 1 - tol, (k, c)
    return report


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "generate"
    if mode == "generate":
        generate()
    else:
        print(check())
