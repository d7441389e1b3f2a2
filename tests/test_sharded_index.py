"""ShardedFlatIndex on an 8-device mesh: exactness, balance, growth, i8.

The TPU-native analog of the reference's peer fan-out + merge
(udp_service.rs:297-330, best_results.rs): shard_map local top-k,
all_gather, lax.top_k merge. Runs on 8 virtual CPU devices.
"""

import jax
import numpy as np
import pytest

from dawnsearch_tpu.parallel.mesh import make_mesh
from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # all 8 devices on "shard"


def brute_force(q, x, k):
    d = 1.0 - q @ x.T
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_mesh_has_8_shards(mesh):
    assert mesh.shape["shard"] == 8


def test_exact_recall_f32(mesh, unit_vectors):
    x = unit_vectors(1000)
    q = unit_vectors(5)
    idx = ShardedFlatIndex(mesh=mesh, dtype="f32",
                           capacity_per_shard=256, segment=256)
    ids = idx.add(x)
    np.testing.assert_array_equal(ids, np.arange(1000))
    d, u = idx.search(q, 10)
    bd, bu = brute_force(q, x, 10)
    recall = np.mean([len(set(u[b]) & set(bu[b])) / 10 for b in range(5)])
    assert recall == 1.0
    np.testing.assert_allclose(np.sort(d, axis=1), d, atol=0)  # ascending


def test_self_match(mesh, unit_vectors):
    x = unit_vectors(64)
    idx = ShardedFlatIndex(mesh=mesh, dtype="f32",
                           capacity_per_shard=64, segment=64)
    idx.add(x)
    d, u = idx.search(x, 1)
    np.testing.assert_array_equal(u[:, 0], np.arange(64))
    assert np.all(d[:, 0] < 1e-3)


def test_balanced_striping(mesh, unit_vectors):
    idx = ShardedFlatIndex(mesh=mesh, dtype="f32",
                           capacity_per_shard=64, segment=64)
    idx.add(unit_vectors(100))
    assert idx._counts.max() - idx._counts.min() <= 1


def test_growth_preserves_results(mesh, unit_vectors):
    idx = ShardedFlatIndex(mesh=mesh, dtype="f32",
                           capacity_per_shard=64, segment=64)
    x1 = unit_vectors(300)
    idx.add(x1)
    cap_before = idx.cap_per_shard
    idx.add(unit_vectors(2000))
    assert idx.cap_per_shard > cap_before
    d, u = idx.search(x1[42], 1)
    assert u[0] == 42 and d[0] < 1e-3


def test_i8_sharded_recall(mesh, unit_vectors):
    x = unit_vectors(2000)
    q = unit_vectors(6)
    idx = ShardedFlatIndex(mesh=mesh, dtype="i8",
                           capacity_per_shard=256, segment=256)
    idx.add(x)
    _, u = idx.search(q, 10)
    _, bu = brute_force(q, x, 10)
    recall = np.mean([len(set(u[b]) & set(bu[b])) / 10 for b in range(6)])
    assert recall >= 0.9, recall


def test_partial_fill_masks_invalid(mesh, unit_vectors):
    idx = ShardedFlatIndex(mesh=mesh, dtype="f32",
                           capacity_per_shard=64, segment=64)
    idx.add(unit_vectors(3))  # fewer rows than shards
    d, u = idx.search(unit_vectors(1), 10)
    assert (u >= 0).sum() == 3
    assert np.all(np.isinf(d[0, 3:]))


def test_user_ids_survive(mesh, unit_vectors):
    idx = ShardedFlatIndex(mesh=mesh, dtype="f32",
                           capacity_per_shard=64, segment=64)
    x = unit_vectors(10)
    ids = np.arange(100, 110)
    idx.add(x, ids=ids)
    _, u = idx.search(x[4], 1)
    assert u[0] == 104


def test_single_device_mesh_works(unit_vectors):
    mesh1 = make_mesh(devices=jax.devices()[:1])
    idx = ShardedFlatIndex(mesh=mesh1, dtype="f32",
                           capacity_per_shard=64, segment=64)
    x = unit_vectors(50)
    idx.add(x)
    _, u = idx.search(x[7], 3)
    assert u[0] == 7


def test_matches_unsharded(mesh, unit_vectors):
    from dawnsearch_tpu.index.flat import FlatIndex
    x = unit_vectors(512)
    q = unit_vectors(4)
    sh = ShardedFlatIndex(mesh=mesh, dtype="f32",
                          capacity_per_shard=64, segment=64)
    fl = FlatIndex(dtype="f32", capacity=512, segment=512)
    sh.add(x)
    fl.add(x)
    ds, us = sh.search(q, 10)
    df, uf = fl.search(q, 10)
    np.testing.assert_allclose(ds, df, atol=1e-5)
    for b in range(4):
        assert set(us[b]) == set(uf[b])


def test_save_load_same_mesh(tmp_path, unit_vectors):
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
    import numpy as np
    x = unit_vectors(100)
    ix = ShardedFlatIndex(dtype="i8", capacity_per_shard=64, segment=64)
    ix.add(x)
    p = str(tmp_path / "sh.npz")
    ix.save(p)
    from dawnsearch_tpu.index import load_index
    ld = load_index(p)
    assert isinstance(ld, ShardedFlatIndex)
    assert len(ld) == 100 and ld.capacity == ix.capacity
    d0, i0 = ix.search(x[:8], 5)
    d1, i1 = ld.search(x[:8], 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, atol=1e-6)
    # post-load adds continue the id sequence
    new = ld.add(unit_vectors(3))
    assert new.min() == 100


def test_save_load_restripe(tmp_path, unit_vectors):
    """Reload onto a mesh with a different shard count."""
    import numpy as np
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
    import jax
    x = unit_vectors(64)
    ix = ShardedFlatIndex(dtype="f32", capacity_per_shard=32, segment=32)
    ix.add(x)
    p = str(tmp_path / "sh8.npz")
    ix.save(p)
    mesh2 = make_mesh({"shard": 2}, devices=jax.devices()[:2])
    ld = ShardedFlatIndex.load(p, mesh=mesh2)
    assert ld.n_shards == 2 and len(ld) == 64
    d, i = ld.search(x[:8], 1)
    np.testing.assert_array_equal(i[:, 0], np.arange(8))
    assert np.all(d[:, 0] < 1e-5)


def test_dp_sharded_queries(unit_vectors):
    """2D mesh: rows shard over "shard", query batch shards over "dp"."""
    import jax
    import numpy as np
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    mesh = make_mesh({"dp": 2, "shard": 4})
    ix = ShardedFlatIndex(mesh=mesh, dtype="f32", capacity_per_shard=64,
                          segment=64, dp_axis="dp")
    x = unit_vectors(100)
    ids = ix.add(x)
    # batch not divisible by dp degree exercises the padding path
    d, u = ix.search(x[:7], k=3)
    assert d.shape == (7, 3)
    np.testing.assert_array_equal(u[:, 0], ids[:7])
    assert np.all(d[:, 0] < 1e-5)
    # replicated-query mode still works on the same 2D mesh
    ix2 = ShardedFlatIndex(mesh=mesh, dtype="i8", capacity_per_shard=64,
                           segment=64)
    ix2.add(x)
    d2, u2 = ix2.search(x[:5], k=1)
    np.testing.assert_array_equal(u2[:, 0], np.arange(5))


def test_sharded_device_rerank_exact_order(mesh, unit_vectors):
    """Per-shard f16 re-rank before the ICI merge: global top-k comes
    back exact-ordered at i8 memory + 2 bytes/dim."""
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(2000)
    q = unit_vectors(8)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i8", exact="f16",
                          capacity_per_shard=512, segment=256, chunk=256)
    assert ix.device_rerank
    ix.add(x)
    d, u = ix.search(q, 10)
    ref = 1.0 - q @ x.T
    bi = np.argsort(ref, axis=1, kind="stable")[:, :10]
    hits = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                    for a, b in zip(u, bi)])
    assert hits >= 0.99
    bd = np.take_along_axis(ref, bi, axis=1)
    np.testing.assert_allclose(d, bd, atol=2e-3)
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_sharded_device_rerank_save_load(mesh, tmp_path, unit_vectors):
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(300)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i8", exact="f16",
                          capacity_per_shard=128, segment=64, chunk=64)
    ix.add(x)
    p = str(tmp_path / "sharded.npz")
    ix.save(p)
    ix2 = ShardedFlatIndex.load(p, mesh=mesh)
    assert ix2.device_rerank and len(ix2) == 300
    d1, u1 = ix.search(x[:4], 5)
    d2, u2 = ix2.search(x[:4], 5)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_sharded_fused_selector(mesh, unit_vectors):
    """Per-shard Pallas score+select under shard_map (gate lowered for
    the CPU test; 1M-scale behavior measured on chip)."""
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(4096)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i8", exact="f16",
                          capacity_per_shard=16384, segment=16384)
    ix.fused_min_rows = 0
    ix.add(x)
    d, u = ix.search(x[:8], 5)
    assert (u[:, 0] == np.arange(8)).all()
    assert np.all(d[:, 0] < 1e-2)
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_add_at_max_capacity_uses_free_shards(mesh, unit_vectors):
    """Round-2 advisor (medium): near an aligned max_capacity, rows that
    fit on the least-full shards must land there — the old blocked write
    needed counts.max()+block <= cap and refused rows that fit."""
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(64)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i8", capacity_per_shard=8,
                          segment=8, max_capacity=64)
    ix.add(x[:63])  # counts [8]*7 + [7]
    assert int(ix._counts.max()) == 8 and int(ix._counts.min()) == 7
    ids = ix.add(x[63])  # one free slot on the min shard
    assert len(ix) == 64 and ids[0] == 63
    d, u = ix.search(x[63], 1)
    assert u[0] == 63 and d[0] < 1e-2
    with pytest.raises(RuntimeError, match="full"):
        ix.add(x[:1])


def test_add_at_max_capacity_partial_room(mesh, unit_vectors):
    """A batch larger than any single shard's room still fits when the
    total free slots cover it (capped re-plan spreads it)."""
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(64)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i8", capacity_per_shard=8,
                          segment=8, max_capacity=64)
    ix.add(x[:58])  # counts sum 58, 6 free total
    ix.add(x[58:64])  # 6 rows; max per-shard room is < 6? spread works
    assert len(ix) == 64
    d, u = ix.search(x[60], 1)
    assert u[0] == 60 and d[0] < 1e-2
    # verify every row is findable (no clobbered rows from blend writes)
    d, u = ix.search(x, 1)
    assert (u[:, 0] == np.arange(64)).all()


def test_sharded_load_backfills_exact(mesh, unit_vectors, tmp_path):
    """Requesting exact="f16" on a snapshot without the shadow buffer
    backfills it from dequantized codes (round-2 advisor: an all-zero
    shadow made every re-ranked distance 1.0)."""
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(200)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i8", capacity_per_shard=64,
                          segment=64)
    ix.add(x)
    p = str(tmp_path / "noexact.npz")
    ix.save(p)
    ix2 = ShardedFlatIndex.load(p, mesh=mesh, exact="f16")
    assert ix2.device_rerank
    d, u = ix2.search(x[:8], 5)
    assert (u[:, 0] == np.arange(8)).all()
    assert np.all(d[:, 0] < 1e-2)  # NOT the all-zero shadow's 1.0


def test_sharded_legacy_i4_snapshot_migrates(mesh, unit_vectors, tmp_path):
    """Pre-round-4 sharded snapshots stored per-row dim-plane nibbles
    ((S, cap, D/2), no i4_block key); load migrates every shard into
    the row-block layout (the inline twin of FlatIndex's
    migrate_i4_dimplane_np path) and searches still self-hit."""
    import os

    from dawnsearch_tpu.ops.quant import quantize_i4_vals_np
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    S, cap, n_per = 8, 64, 32
    x = unit_vectors(S * n_per)
    vals, scales = quantize_i4_vals_np(x)
    codes = np.zeros((S, cap, 192), np.uint8)
    sc = np.ones((S, cap), np.float32)
    ids = np.full((S, cap), -1, np.int64)
    for s in range(S):
        v = vals[s * n_per:(s + 1) * n_per]
        # old layout: byte j = dims j | D/2+j << 4, one packed row/row
        codes[s, :n_per] = v[:, :192] | (v[:, 192:] << 4)
        sc[s, :n_per] = scales[s * n_per:(s + 1) * n_per]
        ids[s, :n_per] = np.arange(s * n_per, (s + 1) * n_per)
    p = os.path.join(str(tmp_path), "legacy_sharded.npz")
    np.savez(p, kind="sharded", codes=codes, scales=sc,
             exact=np.empty(0), ids=ids,
             counts=np.full(S, n_per, np.int64), next_id=S * n_per,
             dtype="i4", dim=384)

    idx = ShardedFlatIndex.load(p, mesh=mesh)
    assert idx.dtype == "i4" and len(idx) == S * n_per
    assert idx._codes.shape == (S, idx.cap_per_shard // 2, 384)
    d, u = idx.search(x[:16], 5)
    assert (u[:, 0] == np.arange(16)).all()
    # re-saving writes the new layout; reload reproduces the search
    p2 = os.path.join(str(tmp_path), "new_sharded.npz")
    idx.save(p2)
    with np.load(p2) as z:
        assert int(z["i4_block"]) == idx._i4_block
    idx2 = ShardedFlatIndex.load(p2, mesh=mesh)
    d2, u2 = idx2.search(x[:16], 5)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))


def test_sharded_i4_snapshot_block_repack(mesh, unit_vectors, tmp_path):
    """A snapshot written with one i4 packing block reloads under a
    DIFFERENT segment (hence block) via the repack branch, with
    identical search results."""
    import os

    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(256)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i4", capacity_per_shard=64,
                          segment=64)
    ix.add(x)
    d1, u1 = ix.search(x[:8], 5)
    p = os.path.join(str(tmp_path), "b64.npz")
    ix.save(p)
    ix2 = ShardedFlatIndex.load(p, mesh=mesh, segment=32)
    assert ix2._i4_block == 32 and ix._i4_block == 64
    d2, u2 = ix2.search(x[:8], 5)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
