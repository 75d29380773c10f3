"""Int8 FFN quantization: accuracy vs the fp32 path."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_model_config


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_quantized_linear_accuracy():
    from one_peace_tpu.ops.quant import quantize_weight, quantized_linear

    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 128) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(128) * 0.01, jnp.float32)
    x = jnp.asarray(rs.randn(4, 64), jnp.float32)
    q = quantize_weight(w)
    q["b"] = b
    got = quantized_linear(q, x)
    want = x @ w + b
    assert _cos(got, want) > 0.999


def test_quantized_model_embeddings_close():
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.ops.quant import quantize_ffn_params

    cfg = tiny_model_config(head_type="val")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    qparams = dict(params)
    qparams["encoder_wrapper"] = quantize_ffn_params(params["encoder_wrapper"])

    tokens = jnp.asarray(np.random.RandomState(1).randint(5, 99, (2, 8)))
    ref = model(params, src_tokens=tokens, encoder_type="text")
    got = model(qparams, src_tokens=tokens, encoder_type="text")
    assert _cos(got, ref) > 0.995
    # int8 leaves actually present
    leaf = qparams["encoder_wrapper"]["fusion"]["layers"]["text_ffn"]["wi_0"]
    assert leaf["w_q"].dtype == jnp.int8


def test_quantized_attention_embeddings_close():
    """include_attn=True additionally converts q/k/v/out_proj; embeddings
    stay close and the attention leaves are really int8."""
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.ops.quant import quantize_ffn_params

    cfg = tiny_model_config(head_type="val")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    qparams = dict(params)
    qparams["encoder_wrapper"] = quantize_ffn_params(
        params["encoder_wrapper"], include_attn=True)

    tokens = jnp.asarray(np.random.RandomState(1).randint(5, 99, (2, 8)))
    ref = model(params, src_tokens=tokens, encoder_type="text")
    got = model(qparams, src_tokens=tokens, encoder_type="text")
    assert _cos(got, ref) > 0.995
    layers = qparams["encoder_wrapper"]["fusion"]["layers"]
    attn = layers["self_attn"]
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        assert attn[name]["w_q"].dtype == jnp.int8
    # k_proj has no bias; the others keep theirs
    assert "b" not in attn["k_proj"] and "b" in attn["q_proj"]


def test_one_jit_function_serves_bf16_and_quantized_trees():
    """bench.py reuses ONE jitted embed function for both the bf16 and
    the int8-quantized param trees (different pytree structures must
    retrace, not crash or cross-contaminate) — the exact call pattern the
    driver's bench artifact executes."""
    import jax
    import jax.numpy as jnp

    from helpers import tiny_model_config
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.ops.quant import quantize_ffn_params

    cfg = tiny_model_config(head_type="val")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 32),
                       jnp.float32)

    @jax.jit
    def embed(p, x):
        return model(p, src_images=x, encoder_type="image")

    out_f = np.asarray(embed(params, imgs))
    params_q = quantize_ffn_params(params)
    out_q = np.asarray(embed(params_q, imgs))  # retrace on new structure
    out_f2 = np.asarray(embed(params, imgs))   # original entry still cached
    np.testing.assert_array_equal(out_f, out_f2)
    assert np.isfinite(out_q).all()
    # quantization error is small but nonzero — proves the int8 path ran
    d = np.abs(out_q - out_f).max()
    assert 0 < d < 0.05, d


def test_quantized_tree_keeps_sharding_rules():
    """w_q/w_scale leaves must inherit the TP/FSDP placements of the bf16
    weights they replace — otherwise int8 serving on a mesh silently
    replicates the whole FFN stack on every device."""
    from one_peace_tpu.parallel.sharding import spec_for_path

    assert spec_for_path("encoder_wrapper/fusion/layers/self_attn/q_proj/w_q", 3) \
        == __import__("jax").sharding.PartitionSpec(None, "fsdp", "tp")
    assert spec_for_path("encoder_wrapper/fusion/layers/image_ffn/wi_0/w_q", 3) \
        == __import__("jax").sharding.PartitionSpec(None, "fsdp", "tp")
    assert spec_for_path("encoder_wrapper/fusion/layers/image_ffn/wo/w_q", 3) \
        == __import__("jax").sharding.PartitionSpec(None, "tp", "fsdp")
    assert spec_for_path("encoder_wrapper/fusion/layers/image_ffn/wo/w_scale", 2) \
        == __import__("jax").sharding.PartitionSpec(None, "fsdp")


def test_int8_matmul_pallas_interpret():
    """The Pallas int8 kernel (ONE_PEACE_INT8_IMPL=pallas) must be
    CPU-testable through the interpreter like every other kernel in ops/;
    exercises the int32 VMEM accumulator, the per-row/per-channel scale
    application, and all three padding paths (M, K, N not block
    multiples)."""
    import pytest

    from one_peace_tpu.ops import flash_attention as fa
    from one_peace_tpu.ops.quant_pallas import int8_matmul

    if jax.default_backend() == "cpu":
        mp = pytest.MonkeyPatch()
        mp.setattr(fa, "INTERPRET", True)
    else:
        mp = None
    try:
        rs = np.random.RandomState(0)
        for m, k, n in [(8, 64, 128), (13, 100, 70), (260, 520, 515)]:
            x_q = rs.randint(-127, 128, (m, k)).astype(np.int8)
            w_q = rs.randint(-127, 128, (k, n)).astype(np.int8)
            sx = (rs.rand(m) * 0.01 + 1e-4).astype(np.float32)
            sw = (rs.rand(n) * 0.01 + 1e-4).astype(np.float32)
            got = np.asarray(int8_matmul(
                jnp.asarray(x_q), jnp.asarray(w_q), jnp.asarray(sx),
                jnp.asarray(sw), out_dtype=jnp.float32))
            want = (x_q.astype(np.int64) @ w_q.astype(np.int64)
                    ).astype(np.float64) * sx[:, None] * sw[None, :]
            np.testing.assert_allclose(got, want.astype(np.float32),
                                       rtol=1e-5, atol=1e-6)
    finally:
        if mp is not None:
            mp.undo()


def test_quantized_vision_trunks_close():
    """zoo.quantize_serving_params converts det/video trunk FFNs to int8
    (stacked layers via the vmapped quantizer) and the backbone layer fns
    dispatch on the converted tree; outputs must stay close to fp32."""
    from one_peace_tpu.vision.det_backbone import DetBackbone
    from one_peace_tpu.vision.zoo import quantize_serving_params

    rs = np.random.RandomState(0)
    backbone = DetBackbone(embed_dim=32, ffn_embed_dim=64, heads=4, layers=4,
                           bucket_size=4, pretrain_bucket_size=4,
                           window_size=2, global_period=2,
                           checkpoint_activations=False, attn_impl="xla")
    params = backbone.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(rs.randn(1, 3, 64, 64), jnp.float32)
    ref = np.asarray(backbone(params, imgs))
    qparams = quantize_serving_params(params)
    got = np.asarray(backbone(qparams, imgs))
    assert _cos(got, ref) > 0.999
    # the quantized tree really is int8 (stacked: leading layer axis kept)
    flat = jax.tree.leaves(qparams)
    assert any(a.dtype == jnp.int8 for a in flat)


def test_quantized_video_trunk_close():
    from one_peace_tpu.vision.video_backbone import VideoClassifierV2
    from one_peace_tpu.vision.zoo import quantize_serving_params

    rs = np.random.RandomState(1)
    model = VideoClassifierV2(embed_dim=32, ffn_embed_dim=64, heads=4,
                              layers=2, num_classes=5, num_frames=4,
                              bucket_size=4)
    params = model.init(jax.random.PRNGKey(0))
    vids = jnp.asarray(rs.randn(1, 4, 3, 64, 64), jnp.float32)
    ref = np.asarray(model(params, vids))
    got = np.asarray(model(quantize_serving_params(params), vids))
    assert _cos(got, ref) > 0.999
