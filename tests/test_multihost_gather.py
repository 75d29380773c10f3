"""Padded variable-length eval gather (ref utils/data_utils.py:50-86).

Exercised on the 8-device CPU mesh via per-shard partial feeds: each
"rank" holds a different number of valid rows; the gathered result must
be the rank-ordered concatenation of only the valid rows."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def test_padded_all_gather_on_device_mesh():
    from one_peace_tpu.metrics.gather import padded_all_gather, strip_padding

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("dp",))
    w, lmax, d = 8, 4, 3
    rs = np.random.RandomState(0)
    valid = np.array([4, 1, 3, 2, 4, 0, 2, 1], np.int32)
    vals = np.zeros((w, lmax, d), np.float32)
    expected = []
    for i in range(w):
        rows = rs.randn(valid[i], d).astype(np.float32)
        vals[i, : valid[i]] = rows
        expected.append(rows)
    expected = np.concatenate(expected, axis=0)

    @jax.jit
    def run(vals, valid):
        f = shard_map(
            lambda v, n: padded_all_gather(v[0], n[0], "dp"),
            mesh=mesh,
            in_specs=(P("dp"), P("dp")),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return f(vals, valid)

    all_vals, all_lens = run(jnp.asarray(vals), jnp.asarray(valid))
    out = strip_padding(np.asarray(all_vals), np.asarray(all_lens))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_gather_ragged_single_process_identity():
    from one_peace_tpu.metrics.gather import gather_ragged

    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    np.testing.assert_array_equal(gather_ragged(x), x)


def test_recall_merge_uses_gather(monkeypatch):
    """Recall.merge_results must route its accumulators through the
    cross-process gather."""
    from one_peace_tpu.metrics import gather as g
    from one_peace_tpu.metrics.metrics import Recall

    calls = []
    orig = g.gather_ragged

    def spy(x):
        calls.append(x.shape)
        return orig(x)

    monkeypatch.setattr(g, "gather_ragged", spy)
    # declare genuinely process-sharded accumulation (the default assumes
    # the mesh eval's replicated global batches and skips the gather)
    monkeypatch.setattr(g, "_PROCESS_SHARDED_EVAL", True)
    r = Recall()
    rs = np.random.RandomState(1)
    r.initialize(np.arange(6), rs.randn(6, 4).astype(np.float32))
    r.compute(np.arange(3), rs.randn(3, 4).astype(np.float32))
    r.compute(np.arange(3, 6), rs.randn(3, 4).astype(np.float32))
    stats = r.merge_results()
    assert len(calls) == 2  # ids + logits both gathered
    assert stats["img_count"] == 6


def test_detection_ap_multihost_merge(monkeypatch):
    """A sharded DetectionAP (each "process" scoring half the images) must
    reproduce the single-host AP after merge: simulate a 2-process world by
    monkeypatching process_count and gather_ragged to append the second
    shard's packed per-image records in call order (incl. mask IoU
    matrices for segm AP)."""
    from one_peace_tpu.metrics import metrics as M

    def fake_images(n_img, seed):
        r = np.random.RandomState(seed)
        imgs = []
        for _ in range(n_img):
            nd, ng = r.randint(0, 5), r.randint(0, 4)
            db = np.sort(r.rand(nd, 2, 2) * 50, axis=1).reshape(nd, 4)
            gb = np.sort(r.rand(ng, 2, 2) * 50, axis=1).reshape(ng, 4)
            imgs.append({
                "det": (db, r.rand(nd), r.randint(0, 3, nd),
                        r.rand(nd, 8, 8) > 0.5),
                "gt": (gb, r.randint(0, 3, ng), r.rand(ng, 8, 8) > 0.5,
                       r.rand(ng) < 0.2),
            })
        return imgs

    all_imgs = fake_images(5, 1) + fake_images(4, 2)

    def feed(metric, imgs):
        for im in imgs:
            db, ds, dl, dm = im["det"]
            gb, gl, gm, gc = im["gt"]
            metric.compute(db, ds, dl, gb, gl, det_masks=dm, gt_masks=gm,
                           gt_crowd=gc)

    # single-host reference over the union
    ref = M.DetectionAP(num_classes=3)
    ref.initialize()
    feed(ref, all_imgs)
    ref_stats = ref.merge_results()
    assert "ap_mask" in ref_stats

    # shard 0 view with the gather faked to append shard 1's arrays
    ap = M.DetectionAP(num_classes=3)
    ap.initialize()
    feed(ap, all_imgs[:5])
    shard1 = M.DetectionAP(num_classes=3)
    shard1.initialize()
    feed(shard1, all_imgs[5:])
    other = M._pack_ragged_images(shard1.images)
    order = list(other.keys())
    calls = {"i": 0}

    from one_peace_tpu.metrics import gather as G

    def fake_gather(local):
        key = order[calls["i"]]
        calls["i"] += 1
        return np.concatenate([np.asarray(local), other[key]], axis=0)

    import jax as _jax

    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    monkeypatch.setattr(G, "gather_ragged", fake_gather)
    monkeypatch.setattr(G, "_PROCESS_SHARDED_EVAL", True)
    stats = ap.merge_results()
    assert calls["i"] == len(order)
    assert stats == ref_stats


def test_replicated_eval_does_not_double_count(monkeypatch):
    """DEFAULT mesh-eval semantics: every process feeds the same global
    batches, so per-process accumulations are replicas — the reducers'
    merges must NOT cross-process gather/sum them (that would count the
    dataset process_count times)."""
    import jax as _jax

    from one_peace_tpu.metrics.metrics import Accuracy

    monkeypatch.setattr(_jax, "process_count", lambda: 4)
    a = Accuracy()
    a.initialize()
    a.compute(ncorrect=3.0, count=10)
    stats = a.merge_results()
    assert stats["count"] == 10  # not 40
    assert abs(stats["accuracy"] - 30.0) < 1e-6
