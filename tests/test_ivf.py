"""IVFIndex (examples/ivf_index.py — demoted experiment, round 3):
exactness oracle (nprobe == C), recall, spill/grow, persistence."""

import numpy as np
import pytest

from tests.conftest import load_example

_ivf = load_example("ivf_index")
IVFIndex, train_centroids = _ivf.IVFIndex, _ivf.train_centroids


def exact_topk(q, x, k):
    d = 1.0 - q @ x.T
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def clustered(rng, n_clusters, per_cluster, dim=384, spread=0.15):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per_cluster, axis=0)
    pts += spread * rng.standard_normal(pts.shape).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts


def test_full_probe_is_exact(unit_vectors):
    """Probing every list must reproduce brute force exactly (f32)."""
    x = unit_vectors(2000)
    q = unit_vectors(16)
    ix = IVFIndex(dtype="f32", n_centroids=16, nprobe=16, list_capacity=256)
    ix.train(x, iters=5)
    ix.add(x)
    d, i = ix.search(q, k=10, nprobe=16)
    ed, ei = exact_topk(q, x, 10)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(d, ed, atol=1e-5)


def test_recall_clustered(rng):
    x = clustered(rng, n_clusters=32, per_cluster=128)
    q = x[rng.choice(len(x), 64, replace=False)]
    ix = IVFIndex(dtype="f32", n_centroids=32, nprobe=8, list_capacity=512)
    ix.train(x, iters=10)
    ix.add(x)
    d, i = ix.search(q, k=10)
    _, ei = exact_topk(q, x, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, ei)])
    assert recall >= 0.9, recall


def test_i8_matches_f32_ranking(unit_vectors):
    x = unit_vectors(1000)
    q = unit_vectors(8)
    kw = dict(n_centroids=8, nprobe=8, list_capacity=256)
    a = IVFIndex(dtype="f32", **kw)
    b = IVFIndex(dtype="i8", **kw)
    for ix in (a, b):
        ix.train(x, iters=5, seed=1)
        ix.add(x)
    da, ia = a.search(q, k=10)
    db, ib = b.search(q, k=10)
    overlap = np.mean([len(set(r) & set(s)) / 10 for r, s in zip(ia, ib)])
    assert overlap >= 0.9, overlap
    np.testing.assert_allclose(da, db, atol=0.02)


def test_spill_and_grow(unit_vectors):
    """Tiny lists force spill to next-nearest and eventually a grow;
    every row must remain findable under full probe."""
    x = unit_vectors(300)
    ix = IVFIndex(dtype="f32", n_centroids=4, nprobe=4, list_capacity=8)
    ix.train(x[:100], iters=3)
    ids = ix.add(x)
    assert len(ix) == 300
    assert ix.list_capacity > 8  # grew
    d, i = ix.search(x[:32], k=1)
    np.testing.assert_array_equal(i[:, 0], ids[:32])
    assert np.all(d[:, 0] < 1e-4)


def test_empty_and_single(unit_vectors):
    ix = IVFIndex(dtype="f32", n_centroids=4, nprobe=2, list_capacity=16)
    ix.train(unit_vectors(64), iters=2)
    d, i = ix.search(unit_vectors(3), k=5)
    assert (i == -1).all() and np.isinf(d).all()
    v = unit_vectors(1)[0]
    ix.add(v)
    d1, i1 = ix.search(v, k=3)
    assert i1[0] == 0 and d1[0] < 1e-5
    assert i1[1] == -1 and np.isinf(d1[1])


def test_add_before_train_raises(unit_vectors):
    ix = IVFIndex(n_centroids=4)
    with pytest.raises(RuntimeError):
        ix.add(unit_vectors(4))


def test_save_load_roundtrip(tmp_path, unit_vectors):
    x = unit_vectors(500)
    ix = IVFIndex(dtype="i8", n_centroids=8, nprobe=4, list_capacity=128)
    ix.train(x, iters=3)
    ix.add(x)
    p = str(tmp_path / "ivf.npz")
    ix.save(p)
    ld = IVFIndex.load(p)
    assert len(ld) == 500 and ld.dtype == "i8" and ld.trained
    q = x[:8]
    np.testing.assert_array_equal(ix.search(q, 5)[1], ld.search(q, 5)[1])
    # post-load adds keep working and assign fresh ids
    new = ld.add(unit_vectors(4))
    assert new.min() == 500


def test_train_centroids_normalized(unit_vectors):
    c = train_centroids(unit_vectors(512), 16, iters=4)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-4)


def test_multi_assign_improves_recall(rng):
    # The reference's 3-nearest-bucket insert (search_bucket.rs:16-17):
    # replicated copies make a vector findable from more probed lists.
    x = clustered(rng, n_clusters=64, per_cluster=64, spread=0.2)
    q = x[rng.choice(len(x), 128, replace=False)]

    def recall(ix):
        ix.train(x, iters=5, seed=1)
        ix.add(x)
        _, i = ix.search(q, k=10)
        _, ei = exact_topk(q, x, 10)
        return np.mean([len(set(i[b]) & set(ei[b])) / 10
                        for b in range(len(q))])

    r1 = recall(IVFIndex(dtype="f32", n_centroids=64, nprobe=2,
                         list_capacity=256))
    r3 = recall(IVFIndex(dtype="f32", n_centroids=64, nprobe=2,
                         list_capacity=256, multi_assign=3))
    assert r3 > r1 + 0.05, (r1, r3)
    assert r3 > 0.3  # nprobe 2/64 probes 3% of lists; m=3 lifts ~0.24->0.38


def test_multi_assign_no_duplicate_results(unit_vectors):
    x = unit_vectors(500)
    ix = IVFIndex(dtype="f32", n_centroids=8, nprobe=8, list_capacity=512,
                  multi_assign=3)
    ix.train(x, iters=5)
    ids = ix.add(x)
    assert len(ix) == 500  # logical rows count copies once
    d, i = ix.search(x[:32], k=10)
    for b in range(32):
        valid = i[b][i[b] >= 0]
        assert len(set(valid.tolist())) == len(valid), i[b]
        assert i[b, 0] == ids[b]  # self-hit survives dedup, nearest-first
        assert np.all(np.diff(d[b][np.isfinite(d[b])]) >= -1e-6)


def test_multi_assign_full_probe_exact(unit_vectors):
    # Even with duplicate copies, probing everything + dedup == brute force.
    x = unit_vectors(800)
    q = unit_vectors(8)
    ix = IVFIndex(dtype="f32", n_centroids=8, nprobe=8, list_capacity=1024,
                  multi_assign=2)
    ix.train(x, iters=5)
    ix.add(x)
    d, i = ix.search(q, k=10)
    ed, ei = exact_topk(q, x, 10)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(d, ed, atol=1e-5)


def test_multi_assign_save_load(tmp_path, unit_vectors):
    x = unit_vectors(300)
    ix = IVFIndex(dtype="i8", n_centroids=8, nprobe=8, list_capacity=128,
                  multi_assign=2)
    ix.train(x, iters=3)
    ix.add(x)
    p = str(tmp_path / "ivf.npz")
    ix.save(p)
    ix2 = IVFIndex.load(p)
    assert ix2.multi_assign == 2 and len(ix2) == 300
    d1, i1 = ix.search(x[:8], k=5)
    d2, i2 = ix2.search(x[:8], k=5)
    np.testing.assert_array_equal(i1, i2)


def test_int32_id_guard(unit_vectors):
    ix = IVFIndex(dtype="f32", n_centroids=4, nprobe=4, list_capacity=64)
    ix.train(unit_vectors(16), iters=2)
    with pytest.raises(ValueError, match="int32"):
        ix.add(unit_vectors(1), ids=np.asarray([2**31], np.int64))


def test_vectorized_assign_matches_loop_semantics(unit_vectors):
    # Slot allocation must respect capacity + nearest-first spill: fill a
    # tiny index to the brim and confirm counts never exceed capacity.
    x = unit_vectors(1000)
    ix = IVFIndex(dtype="f32", n_centroids=4, nprobe=4, list_capacity=64)
    ix.train(x[:100], iters=3)
    ix.add(x)
    assert int(ix._counts.sum()) == 1000
    assert ix._counts.max() <= ix.list_capacity
    # every row findable (full probe = exact)
    _, i = ix.search(x[:16], k=1)
    assert (i[:, 0] == np.arange(16)).all()
