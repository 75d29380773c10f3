"""Assembled vision models: build, load pretrain weights, run inference."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_encoder_config
from test_vision_checkpoint import (
    _fake_vision_sd, D, F, HEADS, LAYERS, PRETRAIN_BUCKET)

from one_peace_tpu.vision.zoo import (
    OnePeaceDetector,
    OnePeaceSegmenter,
    OnePeaceVideoClassifier,
)


def test_detector_build_load_detect():
    rs = np.random.RandomState(0)
    det = OnePeaceDetector(
        num_classes=5, image_size=128, fpn_channels=16,
        embed_dim=D, ffn_embed_dim=F, heads=HEADS, layers=LAYERS,
        pretrain_bucket_size=PRETRAIN_BUCKET, window_size=4, global_period=2,
        checkpoint_activations=False)
    sd = _fake_vision_sd(rs)
    params = det.load_pretrained(sd, key=jax.random.PRNGKey(1))
    # trunk weights actually came from the checkpoint
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["glob_layers"]["self_attn"]["q_proj"]
                   ["w"][0]),
        sd["encoder.layers.1.self_attn.q_proj.weight"].T, rtol=1e-6)
    imgs = jnp.asarray(rs.randn(2, 3, 128, 128), jnp.float32)
    results = det.detect(params, imgs, score_thresh=0.0, max_proposals=16,
                         max_dets=8)
    assert len(results) == 2
    for r in results:
        assert r["boxes"].shape[1] == 4
        assert len(r["scores"]) <= 8
        if len(r["boxes"]):
            assert "masks" in r and r["masks"].shape[1:] == (28, 28)
            assert np.isfinite(r["masks"]).all()


def test_segmenter_build_load_logits():
    rs = np.random.RandomState(1)
    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    seg = OnePeaceSegmenter(cfg, num_classes=7, channels=16,
                            conv_inplane=8, deform_num_heads=4,
                            init_values=0.5)
    params = seg.init(jax.random.PRNGKey(0))

    # pretrain-named sd built from the segmenter's own shapes
    def t(x):
        return np.ascontiguousarray(np.asarray(x).T)

    base = seg.backbone.encoder.init(jax.random.PRNGKey(2))
    sd = {}
    lay = base["layers"]
    for i in range(cfg.layers):
        p = f"encoder_wrapper.fusion_model.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = t(lay["self_attn"]["q_proj"]["w"][i]) + i
        sd[f"{p}.self_attn.q_proj.bias"] = np.asarray(lay["self_attn"]["q_proj"]["b"][i])
        sd[f"{p}.self_attn.k_proj.weight"] = t(lay["self_attn"]["k_proj"]["w"][i])
        sd[f"{p}.self_attn.v_proj.weight"] = t(lay["self_attn"]["v_proj"]["w"][i])
        sd[f"{p}.self_attn.v_proj.bias"] = np.asarray(lay["self_attn"]["v_proj"]["b"][i])
        sd[f"{p}.self_attn.out_proj.weight"] = t(lay["self_attn"]["out_proj"]["w"][i])
        sd[f"{p}.self_attn.out_proj.bias"] = np.asarray(lay["self_attn"]["out_proj"]["b"][i])
        for ln, name in (("self_attn_layer_norm", "self_attn_layer_norm"),
                         ("final_layer_norm", "final_layer_norm")):
            sd[f"{p}.{ln}.weight"] = np.asarray(lay[name]["scale"][i])
            sd[f"{p}.{ln}.bias"] = np.asarray(lay[name]["bias"][i])
        if "ln" in lay["self_attn"]:
            sd[f"{p}.self_attn.ln.weight"] = np.asarray(lay["self_attn"]["ln"]["scale"][i])
            sd[f"{p}.self_attn.ln.bias"] = np.asarray(lay["self_attn"]["ln"]["bias"][i])
        ffn = lay["image_ffn"]
        sd[f"{p}.image_ffn.0.wi_0.weight"] = t(ffn["wi_0"]["w"][i])
        sd[f"{p}.image_ffn.0.wi_1.weight"] = t(ffn["wi_1"]["w"][i])
        if "ffn_ln" in ffn:
            sd[f"{p}.image_ffn.2.weight"] = np.asarray(ffn["ffn_ln"]["scale"][i])
            sd[f"{p}.image_ffn.2.bias"] = np.asarray(ffn["ffn_ln"]["bias"][i])
        sd[f"{p}.image_ffn.3.weight"] = t(ffn["wo"]["w"][i])
        sd[f"{p}.image_ffn.3.bias"] = np.asarray(ffn["wo"]["b"][i])
        if "gamma_1" in lay:
            sd[f"{p}.gamma_1"] = np.asarray(lay["gamma_1"][i])
            sd[f"{p}.gamma_2"] = np.asarray(lay["gamma_2"][i])

    ia = seg.backbone.image_adapter.init(jax.random.PRNGKey(3))
    pre = "encoder_wrapper.image_adapter"
    sd[f"{pre}.cls_embedding"] = np.asarray(ia["cls_embedding"])
    sd[f"{pre}.pos_embed"] = np.asarray(ia["pos_embed"])
    if "hmlp" in ia:
        h = ia["hmlp"]
        for i, (cname, lnname) in enumerate(
                [("conv1", "ln1"), ("conv2", "ln2"), ("conv3", None)]):
            idx = (0, 3, 6)[i]
            w = np.asarray(h[cname]["w"]).transpose(3, 2, 0, 1)
            sd[f"{pre}.embed_images.{idx}.weight"] = np.ascontiguousarray(w)
            if "b" in h[cname]:
                sd[f"{pre}.embed_images.{idx}.bias"] = np.asarray(h[cname]["b"])
            if lnname:
                lnidx = (1, 4)[i]
                sd[f"{pre}.embed_images.{lnidx}.layer_norm.weight"] = \
                    np.asarray(h[lnname]["scale"])
                sd[f"{pre}.embed_images.{lnidx}.layer_norm.bias"] = \
                    np.asarray(h[lnname]["bias"])
    if "rel_pos_table" in ia:
        sd[f"{pre}.rel_pos_table_list.0.weight"] = np.asarray(
            ia["rel_pos_table"][0])

    loaded = seg.load_pretrained(sd, key=jax.random.PRNGKey(4))
    # trunk layer 0 q_proj picked up the +0 offset version (i.e. the sd)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["encoder"]["layers"]["self_attn"]
                   ["q_proj"]["w"][1]),
        np.asarray(lay["self_attn"]["q_proj"]["w"][1]) + 1, rtol=1e-5)
    # head stays fresh and the model runs
    imgs = jnp.asarray(np.random.RandomState(5).randn(1, 3, 64, 64),
                       jnp.float32)
    logits = seg.logits(loaded, imgs)
    assert logits.shape == (1, 16, 16, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_video_classifier_build_load():
    rs = np.random.RandomState(2)
    vid = OnePeaceVideoClassifier(
        num_classes=9, embed_dim=D, ffn_embed_dim=F, heads=HEADS,
        layers=LAYERS, bucket_size=PRETRAIN_BUCKET, num_frames=2)
    sd = _fake_vision_sd(rs)
    params = vid.load_pretrained(sd, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["layers"]["self_attn"]["out_proj"]
                   ["w"][3]),
        sd["encoder.layers.3.self_attn.out_proj.weight"].T, rtol=1e-6)
    logits = vid(params, jnp.asarray(rs.randn(2, 2, 3, 64, 64), jnp.float32))
    assert logits.shape == (2, 9)
    assert np.isfinite(np.asarray(logits)).all()
