"""Det/video backbone checkpoint conversion from pretrain state dicts."""

import jax
import jax.numpy as jnp
import numpy as np

from one_peace_tpu.utils.vision_checkpoint import (
    convert_det_backbone,
    convert_video_backbone,
    to_vision_state_dict,
)
from one_peace_tpu.vision.det_backbone import DetBackbone
from one_peace_tpu.vision.video_backbone import VideoBackbone

D, F, HEADS, LAYERS = 32, 64, 4, 4
PRETRAIN_BUCKET = 4


def _fake_vision_sd(rs, layers=LAYERS, bucket=PRETRAIN_BUCKET):
    """Flat sd in the post-convert_to_vision.py naming."""
    sd = {}
    q = D // 4
    sd["image_adapter.embed_images.0.weight"] = rs.randn(q, 3, 4, 4).astype("f")
    sd["image_adapter.embed_images.0.bias"] = rs.randn(q).astype("f")
    sd["image_adapter.embed_images.1.layer_norm.weight"] = rs.randn(q).astype("f")
    sd["image_adapter.embed_images.1.layer_norm.bias"] = rs.randn(q).astype("f")
    sd["image_adapter.embed_images.3.weight"] = rs.randn(q, q, 2, 2).astype("f")
    sd["image_adapter.embed_images.3.bias"] = rs.randn(q).astype("f")
    sd["image_adapter.embed_images.4.layer_norm.weight"] = rs.randn(q).astype("f")
    sd["image_adapter.embed_images.4.layer_norm.bias"] = rs.randn(q).astype("f")
    sd["image_adapter.embed_images.6.weight"] = rs.randn(D, q, 2, 2).astype("f")
    sd["image_adapter.embed_images.6.bias"] = rs.randn(D).astype("f")
    sd["image_adapter.pos_embed"] = rs.randn(bucket ** 2 + 1, D).astype("f")
    sd["image_adapter.cls_embedding"] = rs.randn(1, 1, D).astype("f")
    sd["image_adapter.rel_pos_table_list.0.weight"] = rs.randn(
        (2 * bucket - 1) ** 2 + 3, HEADS).astype("f")
    for i in range(layers):
        p = f"encoder.layers.{i}"
        for proj in ("q_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = rs.randn(D, D).astype("f")
            sd[f"{p}.self_attn.{proj}.bias"] = rs.randn(D).astype("f")
        sd[f"{p}.self_attn.k_proj.weight"] = rs.randn(D, D).astype("f")
        sd[f"{p}.self_attn.ln.weight"] = rs.randn(D).astype("f")
        sd[f"{p}.self_attn.ln.bias"] = rs.randn(D).astype("f")
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{p}.{ln}.weight"] = rs.randn(D).astype("f")
            sd[f"{p}.{ln}.bias"] = rs.randn(D).astype("f")
        sd[f"{p}.image_ffn.0.wi_0.weight"] = rs.randn(F, D).astype("f")
        sd[f"{p}.image_ffn.0.wi_1.weight"] = rs.randn(F, D).astype("f")
        sd[f"{p}.image_ffn.2.weight"] = rs.randn(F).astype("f")
        sd[f"{p}.image_ffn.2.bias"] = rs.randn(F).astype("f")
        sd[f"{p}.image_ffn.3.weight"] = rs.randn(D, F).astype("f")
        sd[f"{p}.image_ffn.3.bias"] = rs.randn(D).astype("f")
        sd[f"{p}.gamma_1"] = rs.randn(D).astype("f")
        sd[f"{p}.gamma_2"] = rs.randn(D).astype("f")
    return sd


def _pretrain_named(sd):
    """Rename a vision sd back to the pretrain one-peace.pt naming, plus
    branches convert_to_vision.py must drop."""
    out = {}
    for k, v in sd.items():
        if k.startswith("image_adapter."):
            out["encoder_wrapper." + k] = v
        else:
            out[k.replace("encoder.", "encoder_wrapper.fusion_model.")] = v
    out["image_proj.weight"] = np.zeros((D, D), "f")
    out["image_proj.bias"] = np.zeros((D,), "f")
    out["encoder_wrapper.fusion_model.image_layer_norm.weight"] = np.ones(D, "f")
    out["encoder_wrapper.fusion_model.image_layer_norm.bias"] = np.zeros(D, "f")
    out["encoder_wrapper.text_adapter.cls_embedding"] = np.zeros((1, 1, D), "f")
    out["decoder_wrapper.image_adapter.cls_embedding"] = np.zeros((1, 1, D), "f")
    out["logit_scale"] = np.asarray(2.65, "f")
    return out


def _same_structure(a, b):
    ta, tb = jax.tree.structure(a), jax.tree.structure(b)
    assert ta == tb, (ta, tb)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert la.shape == lb.shape, (la.shape, lb.shape)


def test_to_vision_state_dict_matches_reference_remap():
    rs = np.random.RandomState(0)
    vis = _fake_vision_sd(rs)
    pre = _pretrain_named(vis)
    got = to_vision_state_dict(pre)
    assert set(got) == set(vis)
    for k in vis:
        np.testing.assert_array_equal(got[k], vis[k])
    # pass-through when already vision-named
    again = to_vision_state_dict(got)
    assert set(again) == set(vis)


def test_convert_det_backbone_structure_and_values():
    rs = np.random.RandomState(1)
    vis = _fake_vision_sd(rs)
    backbone = DetBackbone(
        embed_dim=D, ffn_embed_dim=F, heads=HEADS, layers=LAYERS,
        bucket_size=8, pretrain_bucket_size=PRETRAIN_BUCKET,
        window_size=4, global_period=2, checkpoint_activations=False)
    ref_tree = backbone.init(jax.random.PRNGKey(0))
    params = convert_det_backbone(vis, backbone)
    _same_structure(ref_tree, params)
    # trunk weight layout: torch (out, in) -> ours (in, out); layer 0 is
    # win_layers[group 0][slot 0], layer 1 is glob_layers[group 0]
    np.testing.assert_allclose(
        np.asarray(params["win_layers"]["self_attn"]["q_proj"]["w"][0, 0]),
        vis["encoder.layers.0.self_attn.q_proj.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["glob_layers"]["image_ffn"]["wo"]["w"][1]),
        vis["encoder.layers.3.image_ffn.3.weight"].T, rtol=1e-6)
    # shared table kept at pretrain size; decomposed tables zero
    assert params["rel_pos_table"].shape == ((2 * PRETRAIN_BUCKET - 1) ** 2 + 3,
                                             HEADS)
    assert float(jnp.abs(params["win_layers"]["self_attn"]["rel_pos_h"]).max()) == 0
    # abs pos interpolated 4 -> 8 grid (+CLS row untouched)
    assert params["image_adapter"]["pos_embed"].shape == (65, D)
    np.testing.assert_allclose(
        np.asarray(params["image_adapter"]["pos_embed"][0]),
        vis["image_adapter.pos_embed"][0], rtol=1e-6)
    # converted params actually run
    out = backbone(params, jnp.zeros((1, 3, 64, 64)))
    assert out.shape == (1, 4, 4, D)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_video_backbone_structure_and_freeze_start():
    rs = np.random.RandomState(2)
    vis = _fake_vision_sd(rs)
    backbone = VideoBackbone(
        embed_dim=D, ffn_embed_dim=F, heads=HEADS, layers=LAYERS,
        bucket_size=PRETRAIN_BUCKET, num_frames=2)
    ref_tree = backbone.init(jax.random.PRNGKey(0))
    params = convert_video_backbone(vis, backbone, key=jax.random.PRNGKey(3))
    _same_structure(ref_tree, params)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["self_attn"]["v_proj"]["w"][2]),
        vis["encoder.layers.2.self_attn.v_proj.weight"].T, rtol=1e-6)
    # adapters start as identity/zero contributions (fc2 == 0), temporal
    # embedding zero: the adapted model equals the frozen trunk at load
    for name in ("t_adapter", "s_adapter", "mlp_adapter"):
        assert float(jnp.abs(params["layers"][name]["fc2"]["w"]).max()) == 0
    assert float(jnp.abs(params["temporal_embedding"]).max()) == 0
    out = backbone(params, jnp.zeros((1, 2, 3, 64, 64)))
    assert out.shape == (2, 17, D)
    assert np.isfinite(np.asarray(out)).all()
