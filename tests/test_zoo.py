"""Assembled vision models: build, load pretrain weights, run inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_encoder_config
from test_vision_checkpoint import (
    _fake_vision_sd, D, F, HEADS, LAYERS, PRETRAIN_BUCKET)

from one_peace_tpu.vision.zoo import (
    OnePeaceDetector,
    OnePeaceSegmenter,
    OnePeaceVideoClassifier,
)


@pytest.mark.slow
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


def test_vision_layer_decay_scales():
    """Layer-decay path rules must map the zoo trees the way the reference
    apps do (ref det/models/onepeace.py:632-653, seg/optimizer/
    onepeace_layer_decay_optimizer_constructor.py:9-29): adapter -> id 0,
    trunk layer i -> i+1, neck/heads -> L+1."""
    from one_peace_tpu.optim.adamw import layer_decay_scales

    decay = 0.9
    L = LAYERS  # 4

    def expect(layer_id):
        return decay ** (L + 1 - layer_id)

    det = OnePeaceDetector(
        num_classes=5, image_size=64, fpn_channels=16,
        embed_dim=D, ffn_embed_dim=F, heads=HEADS, layers=L,
        pretrain_bucket_size=PRETRAIN_BUCKET, window_size=4, global_period=2,
        checkpoint_activations=False)
    params = det.init(jax.random.PRNGKey(0))
    scales = layer_decay_scales(params, num_layers=L, decay=decay)
    bk = scales["backbone"]
    assert float(np.asarray(
        bk["image_adapter"]["pos_embed"])) == np.float32(expect(0))
    # windowed stack: (groups=2, nwin=1) -> layer ids 1 and 3
    win = np.asarray(bk["win_layers"]["self_attn"]["q_proj"]["w"]).ravel()
    np.testing.assert_allclose(win, [expect(1), expect(3)], rtol=1e-6)
    # global stack: (groups=2,) -> layer ids 2 and 4
    glob = np.asarray(bk["glob_layers"]["self_attn"]["q_proj"]["w"]).ravel()
    np.testing.assert_allclose(glob, [expect(2), expect(4)], rtol=1e-6)
    # neck + heads + shared rel table at L+1 -> scale 1.0
    for leaf in (scales["fpn"]["scale_4.0"]["lateral"]["w"],
                 scales["box_head"]["stages"][0]["cls"]["w"],
                 bk["rel_pos_table"]):
        assert float(np.asarray(leaf)) == 1.0

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    seg = OnePeaceSegmenter(cfg, num_classes=7, channels=16,
                            conv_inplane=8, deform_num_heads=4,
                            init_values=0.5)
    sparams = seg.init(jax.random.PRNGKey(1))
    sscales = layer_decay_scales(sparams, num_layers=cfg.layers, decay=decay)
    Ls = cfg.layers
    vec = np.asarray(sscales["backbone"]["encoder"]["layers"]["self_attn"]
                     ["q_proj"]["w"]).ravel()
    np.testing.assert_allclose(
        vec, [decay ** (Ls + 1 - (i + 1)) for i in range(Ls)], rtol=1e-6)
    assert float(np.asarray(
        sscales["backbone"]["image_adapter"]["cls_embedding"])
    ) == np.float32(decay ** (Ls + 1))
    assert all(float(np.asarray(s)) == 1.0
               for s in jax.tree.leaves(sscales["head"]))


def test_segmenter_rejects_mmseg_checkpoint():
    """A finetuned mmseg checkpoint (SyncBN stats / decode_head keys) has
    no GN mapping — the loader must fail loudly, not silently drop keys."""
    import pytest

    cfg = tiny_encoder_config()
    cfg.image_adapter.bucket_size = 4
    cfg.image_adapter.rel_bucket_size = 4
    seg = OnePeaceSegmenter(cfg, num_classes=7, channels=16,
                            conv_inplane=8, deform_num_heads=4,
                            init_values=0.5)
    bad = {"backbone.spm.stem.1.running_mean": np.zeros((8,), np.float32)}
    with pytest.raises(ValueError, match="mmseg"):
        seg.load_pretrained(bad)
