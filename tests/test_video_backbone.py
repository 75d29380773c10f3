"""AIM-style video backbone: temporal adapters, frozen-trunk mask, train."""

import jax
import jax.numpy as jnp
import numpy as np


def _tiny(num_classes=0, **kw):
    args = dict(embed_dim=32, ffn_embed_dim=64, heads=2, layers=2,
                bucket_size=2, num_frames=4)
    args.update(kw)
    if num_classes:
        from one_peace_tpu.vision.video_backbone import VideoClassifierV2

        return VideoClassifierV2(num_classes, **args)
    from one_peace_tpu.vision.video_backbone import VideoBackbone

    return VideoBackbone(**args)


def _frames(b=2, t=4, res=32, seed=0):
    return jnp.asarray(np.random.RandomState(seed)
                       .randn(b, t, 3, res, res).astype(np.float32))


def test_shapes_and_temporal_sensitivity():
    """Permuting frame order must change the output (mean-pooling over
    frames — the round-1 classifier — is order-invariant; the temporal
    adapters + temporal embedding are not)."""
    model = _tiny(num_classes=5)
    params = model.init(jax.random.PRNGKey(0))
    # give the zero-init temporal pieces signal so order matters
    params["backbone"]["temporal_embedding"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), params["backbone"]["temporal_embedding"].shape)
    frames = _frames()
    logits = jax.jit(lambda p, f: model(p, f))(params, frames)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()

    shuffled = frames[:, ::-1]
    logits_shuffled = model(params, shuffled)
    assert not np.allclose(np.asarray(logits), np.asarray(logits_shuffled),
                           atol=1e-6)


def test_trainable_mask_freezes_trunk():
    model = _tiny(num_classes=3)
    params = model.init(jax.random.PRNGKey(0))
    mask = model.trainable_mask(params)
    flat_p = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen = [kp for kp, m in flat_p if not m]
    trainable = [kp for kp, m in flat_p if m]
    names = lambda kps: {  # noqa: E731
        "/".join(str(getattr(k, "key", k)) for k in kp) for kp in kps}
    tn = names(trainable)
    fn = names(frozen)
    assert any("t_adapter" in x for x in tn)
    assert any("temporal_embedding" in x for x in tn)
    assert any("head" in x for x in tn)
    assert any("q_proj" in x for x in fn)
    assert any("image_ffn" in x for x in fn)
    assert not any("q_proj" in x for x in tn)


def test_tiny_train_smoke_adapters_move_trunk_frozen():
    import optax

    model = _tiny(num_classes=3)
    params = model.init(jax.random.PRNGKey(0))
    mask = model.trainable_mask(params)
    labels = jax.tree.map(lambda m: "t" if m else "f", mask)
    tx = optax.multi_transform(
        {"t": optax.adam(1e-3), "f": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)
    frames = _frames()
    y = jnp.asarray(np.array([0, 2]))

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            logits = model(p, frames, deterministic=False,
                           rng=jax.random.PRNGKey(5))
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    p0_adapter = np.asarray(
        params["backbone"]["layers"]["t_adapter"]["fc1"]["w"])
    p0_trunk = np.asarray(
        params["backbone"]["layers"]["self_attn"]["q_proj"]["w"])
    losses = []
    for _ in range(5):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert not np.allclose(
        np.asarray(params["backbone"]["layers"]["t_adapter"]["fc1"]["w"]),
        p0_adapter)
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["layers"]["self_attn"]["q_proj"]["w"]),
        p0_trunk)


def test_subgrid_token_indices_pick_2d_subgrid():
    """Sub-bucket frame grids must select the 2-D sub-grid, not a flat
    prefix: the gathered relative bucket for grid pair ((0,0),(1,1)) at
    bucket 4 is (dy+3)*7+(dx+3) with dy=dx=-1."""
    from one_peace_tpu.models.rel_pos import make_image_bucket_position
    from one_peace_tpu.vision.video_backbone import subgrid_token_indices

    bs = 4
    idx = subgrid_token_indices(2, 2, bs)
    assert idx.tolist() == [0, 1, 2, 5, 6]  # CLS, (0,0),(0,1),(1,0),(1,1)
    rp = make_image_bucket_position(bs)[np.ix_(idx, idx)]
    # pair (0,0)->(1,1): relative (dy, dx) = (-1, -1)
    assert rp[1, 4] == (-1 + bs - 1) * (2 * bs - 1) + (-1 + bs - 1)
    # pair (1,1)->(0,1): relative (dy, dx) = (1, 0)
    assert rp[4, 2] == (1 + bs - 1) * (2 * bs - 1) + (0 + bs - 1)
    # CLS rows keep the three special buckets
    nrd = (2 * bs - 1) ** 2 + 3
    assert rp[0, 0] == nrd - 1 and rp[0, 1] == nrd - 3 and rp[1, 0] == nrd - 2


def test_video_backbone_subgrid_resolution():
    """Frames below bucket_size*16 px run with the correct sub-grid
    positional tables (regression: flat-prefix slicing)."""
    from one_peace_tpu.vision.video_backbone import VideoBackbone

    bb = VideoBackbone(embed_dim=32, ffn_embed_dim=64, heads=4, layers=2,
                       bucket_size=4, num_frames=2,
                       checkpoint_activations=False)
    params = bb.init(jax.random.PRNGKey(0))
    frames = jnp.asarray(np.random.RandomState(0).randn(1, 2, 3, 32, 32),
                         jnp.float32)  # 32px -> 2x2 grid < bucket 4
    out = bb(params, frames)
    assert out.shape == (2, 5, 32)
    assert bool(jnp.isfinite(out).all())
