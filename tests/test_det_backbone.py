"""Detection trunk: windows, rel-pos interpolation, pyramid, e2e cascade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_window_partition_roundtrip():
    from one_peace_tpu.vision.det_backbone import (
        window_partition, window_unpartition)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 10, 14, 8).astype(np.float32))
    win, pad_hw = window_partition(x, 4)
    assert win.shape == (2 * 3 * 4, 4, 4, 8)
    back = window_unpartition(win, 4, pad_hw, (10, 14))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_rel_table_interpolation_matches_torch_bicubic():
    """Ref onepeace.py:128-141 uses F.interpolate(mode='bicubic')."""
    import torch
    import torch.nn.functional as F
    from one_peace_tpu.vision.det_backbone import interpolate_rel_table

    rs = np.random.RandomState(1)
    src_bucket, dst_bucket, heads = 4, 7, 3
    src = 2 * src_bucket - 1
    dst = 2 * dst_bucket - 1
    table = rs.randn(src * src + 3, heads).astype(np.float32)

    ours = np.asarray(interpolate_rel_table(
        jnp.asarray(table), src_bucket, dst_bucket))

    t = torch.as_tensor(table[:-3]).view(1, src, src, heads).permute(0, 3, 1, 2)
    ref_grid = F.interpolate(t, size=(dst, dst), mode="bicubic")
    ref = torch.cat([ref_grid.permute(0, 2, 3, 1).reshape(dst * dst, heads),
                     torch.as_tensor(table[-3:])], dim=0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_decomposed_rel_bias_matches_torch():
    """detectron2 add_decomposed_rel_pos math (ref onepeace.py:205-210),
    re-derived independently in torch."""
    import torch
    from one_peace_tpu.vision.det_backbone import decomposed_rel_bias

    rs = np.random.RandomState(2)
    b, h, w, heads, dh = 2, 3, 4, 2, 5
    q = rs.randn(b, h * w, heads, dh).astype(np.float32)
    rel_h = rs.randn(2 * h - 1, dh).astype(np.float32)
    rel_w = rs.randn(2 * w - 1, dh).astype(np.float32)

    ours = np.asarray(decomposed_rel_bias(
        jnp.asarray(q), jnp.asarray(rel_h), jnp.asarray(rel_w), (h, w)))

    # torch re-derivation (detectron2 utils.add_decomposed_rel_pos)
    qt = torch.as_tensor(q).permute(0, 2, 1, 3).reshape(b * heads, h * w, dh)
    r_q = qt.reshape(b * heads, h, w, dh)
    idx_h = torch.arange(h)[:, None] - torch.arange(h)[None, :] + h - 1
    idx_w = torch.arange(w)[:, None] - torch.arange(w)[None, :] + w - 1
    Rh = torch.as_tensor(rel_h)[idx_h]
    Rw = torch.as_tensor(rel_w)[idx_w]
    rel_h_t = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w_t = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    ref = (rel_h_t[:, :, :, :, None] + rel_w_t[:, :, :, None, :]).reshape(
        b, heads, h * w, h * w).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _tiny_backbone(**kw):
    from one_peace_tpu.vision.det_backbone import DetBackbone

    args = dict(embed_dim=32, ffn_embed_dim=64, heads=2, layers=4,
                bucket_size=8, pretrain_bucket_size=4, window_size=4,
                global_period=4, checkpoint_activations=False)
    args.update(kw)
    return DetBackbone(**args)


def test_det_backbone_shapes_and_finiteness():
    bb = _tiny_backbone()
    params = bb.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0)
                       .randn(2, 3, 128, 128).astype(np.float32))
    out = jax.jit(lambda p, x: bb(p, x))(params, imgs)
    assert out.shape == (2, 8, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_windowed_matches_global_when_window_covers_grid():
    """With window_size == grid size and a zero rel table, a windowed layer
    must equal a global layer: partition is then the identity."""
    from one_peace_tpu.vision.det_backbone import det_layer, init_det_layer

    params = init_det_layer(jax.random.PRNGKey(3), 32, 64, 2, 8,
                            use_decomposed_rel_pos=False)
    x = jnp.asarray(np.random.RandomState(4)
                    .randn(2, 8, 8, 32).astype(np.float32))
    out_win = det_layer(params, 2, x, 8, None, 0.0)
    out_glob = det_layer(params, 2, x, 0, None, 0.0)
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(out_glob),
                               rtol=1e-5, atol=1e-5)


def test_learned_pyramid_shapes():
    from one_peace_tpu.vision.det_backbone import SimpleFeaturePyramid

    fpn = SimpleFeaturePyramid(in_dim=32, out_channels=16)
    params = fpn.init(jax.random.PRNGKey(5))
    f16 = jnp.asarray(np.random.RandomState(6)
                      .randn(2, 8, 8, 32).astype(np.float32))
    outs = jax.jit(lambda p, x: fpn(p, x))(params, f16)
    assert outs["p4"].shape == (2, 32, 32, 16)
    assert outs["p8"].shape == (2, 16, 16, 16)
    assert outs["p16"].shape == (2, 8, 8, 16)
    assert outs["p32"].shape == (2, 4, 4, 16)
    assert outs["p64"].shape == (2, 2, 2, 16)
    # learned: p4 depends on the transposed-conv weights
    params2 = jax.tree.map(lambda x: x, params)
    params2["scale_4.0"]["up1"]["w"] = params2["scale_4.0"]["up1"]["w"] + 1.0
    outs2 = fpn(params2, f16)
    assert not np.allclose(np.asarray(outs["p4"]), np.asarray(outs2["p4"]))


@pytest.mark.parametrize("res", [512])
def test_e2e_jitted_cascade_inference_512(res):
    """Windowed trunk -> learned pyramid -> RoIAlign -> 3-stage cascade,
    jitted end-to-end at >= 512px (VERDICT r1 item 5 'done' criterion)."""
    from one_peace_tpu.vision.det_backbone import (
        DetBackbone, SimpleFeaturePyramid)
    from one_peace_tpu.vision.cascade_rcnn import CascadeBoxHead

    bb = _tiny_backbone(bucket_size=res // 16, window_size=8)
    fpn = SimpleFeaturePyramid(in_dim=32, out_channels=16)
    head = CascadeBoxHead(in_channels=16, num_classes=5, fc_dim=32)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    params = {"bb": bb.init(k1), "fpn": fpn.init(k2), "head": head.init(k3)}

    imgs = jnp.asarray(np.random.RandomState(8)
                       .randn(1, 3, res, res).astype(np.float32))
    props = jnp.asarray(
        np.array([[10, 10, 100, 100], [50, 60, 200, 260],
                  [0, 0, 511, 511], [300, 300, 400, 380]], np.float32))
    bidx = jnp.zeros((4,), jnp.int32)

    @jax.jit
    def infer(params, imgs, props, bidx):
        f16 = bb(params["bb"], imgs)
        pyr = fpn(params["fpn"], f16)
        return head(params["head"], pyr["p16"], props, bidx)

    scores, boxes = infer(params, imgs, props, bidx)
    assert scores.shape[0] == 4 and boxes.shape == (4, 4)
    assert np.isfinite(np.asarray(scores)).all()
    assert np.isfinite(np.asarray(boxes)).all()


def test_decomposed_rel_bias_subgrid_centering():
    """When the runtime grid is smaller than the table (global layers at
    lower eval resolution), the table must be resized so displacement 0
    reads the table CENTER (detectron2 get_rel_pos), not an off-center
    row."""
    import jax.numpy as jnp

    from one_peace_tpu.vision.det_backbone import decomposed_rel_bias

    bucket, h, dh = 8, 4, 4
    # ramp table: row r has constant value r
    ramp = jnp.broadcast_to(
        jnp.arange(2 * bucket - 1, dtype=jnp.float32)[:, None],
        (2 * bucket - 1, dh))
    q = jnp.ones((1, h * h, 1, dh), jnp.float32)
    bias = decomposed_rel_bias(q, ramp, ramp, (h, h))[0, 0]
    # zero displacement (diagonal) must see the ramp's center value
    # (bucket-1) in both axes: dh * (center_h + center_w)
    center = float(dh * 2 * (bucket - 1))
    diag = np.asarray(jnp.diagonal(bias))
    np.testing.assert_allclose(diag, center, rtol=1e-5)
