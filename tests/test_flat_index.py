"""FlatIndex: exactness vs numpy brute force, growth, chunked scan, i8 recall."""

import numpy as np
import pytest

from dawnsearch_tpu.index.flat import FlatIndex


def brute_force(q, x, k):
    d = 1.0 - q @ x.T
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_exact_f32(unit_vectors):
    x = unit_vectors(500)
    q = unit_vectors(4)
    idx = FlatIndex(dtype="f32", capacity=512)
    idx.add(x)
    d, i = idx.search(q, 10)
    bd, bi = brute_force(q, x, 10)
    np.testing.assert_allclose(d, bd, atol=1e-3)
    # indices can permute on near-ties; compare sets with distance check
    for b in range(4):
        assert set(i[b]) == set(bi[b]) or np.allclose(d[b], bd[b], atol=1e-3)


def test_masking_before_full(unit_vectors):
    x = unit_vectors(10)
    idx = FlatIndex(dtype="f32", capacity=1024)
    idx.add(x)
    d, i = idx.search(x[:1], 20)
    valid = i >= 0
    assert valid.sum() == 10  # only 10 real rows
    assert np.all(np.isinf(d[~valid]))
    assert i[0, 0] == 0 and d[0, 0] < 1e-4  # self-match first


def test_empty_index(unit_vectors):
    idx = FlatIndex(dtype="f32")
    d, i = idx.search(unit_vectors(1), 5)
    assert np.all(i == -1) and np.all(np.isinf(d))


def test_growth_preserves_rows(unit_vectors):
    idx = FlatIndex(dtype="f32", capacity=64, segment=64)
    all_rows = []
    for _ in range(5):
        batch = unit_vectors(50)
        all_rows.append(batch)
        idx.add(batch)
    x = np.concatenate(all_rows)
    assert len(idx) == 250 and idx.capacity >= 250
    q = x[123:124]
    d, i = idx.search(q, 1)
    assert i[0, 0] == 123 and d[0, 0] < 1e-4


def test_max_capacity_enforced(unit_vectors):
    idx = FlatIndex(dtype="f32", capacity=64, segment=64, max_capacity=64)
    idx.add(unit_vectors(64))
    with pytest.raises(RuntimeError, match="full"):
        idx.add(unit_vectors(1))


def test_chunked_scan_matches_single_shot(unit_vectors):
    # chunk smaller than capacity forces the lax.scan path
    x = unit_vectors(1000)
    q = unit_vectors(3)
    small = FlatIndex(dtype="f32", capacity=1024, segment=256, chunk=256)
    big = FlatIndex(dtype="f32", capacity=1024, segment=1024, chunk=65536)
    small.add(x)
    big.add(x)
    d1, i1 = small.search(q, 10)
    d2, i2 = big.search(q, 10)
    np.testing.assert_allclose(d1, d2, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)


def test_i8_recall_at_10(unit_vectors):
    x = unit_vectors(5000)
    q = unit_vectors(8)
    idx = FlatIndex(dtype="i8", capacity=8192)
    idx.add(x)
    d, i = idx.search(q, 10)
    _, bi = brute_force(q, x, 10)
    recall = np.mean([len(set(i[b]) & set(bi[b])) / 10 for b in range(8)])
    assert recall >= 0.9, recall


def test_bf16_recall_at_10(unit_vectors):
    x = unit_vectors(3000)
    q = unit_vectors(4)
    idx = FlatIndex(dtype="bf16", capacity=4096)
    idx.add(x)
    _, i = idx.search(q, 10)
    _, bi = brute_force(q, x, 10)
    recall = np.mean([len(set(i[b]) & set(bi[b])) / 10 for b in range(4)])
    assert recall >= 0.9, recall


def test_k_larger_than_capacity(unit_vectors):
    idx = FlatIndex(dtype="f32", capacity=64, segment=64)
    idx.add(unit_vectors(5))
    d, i = idx.search(unit_vectors(1), 100)
    assert d.shape == (1, 100)
    assert (i >= 0).sum() == 5


def test_save_load_roundtrip(tmp_path, unit_vectors):
    x = unit_vectors(100)
    idx = FlatIndex(dtype="i8", capacity=128, segment=128)
    idx.add(x)
    p = str(tmp_path / "index.dawn.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    assert len(idx2) == 100 and idx2.dtype == "i8"
    q = unit_vectors(2)
    d1, i1 = idx.search(q, 5)
    d2, i2 = idx2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_reconstruct(unit_vectors):
    x = unit_vectors(10)
    idx = FlatIndex(dtype="i8", capacity=64, segment=64)
    idx.add(x)
    r = idx.reconstruct(3)
    cos = float(r @ x[3] / np.linalg.norm(r))
    assert cos > 0.999


# -- device-side f16 re-rank (exact="f16") ------------------------------


def test_device_rerank_exact_order(unit_vectors):
    """i8 scan + on-device f16 re-rank must return the exact-f32 order
    (f16 error ~2^-12 is far below neighbor margins on random data)."""
    x = unit_vectors(3000)
    q = unit_vectors(16)
    idx = FlatIndex(dtype="i8", capacity=4096, exact="f16")
    assert idx.device_rerank
    idx.add(x)
    d, i = idx.search(q, 10)
    bd, bi = brute_force(q, x, 10)
    hits = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, bi)])
    assert hits >= 0.99
    np.testing.assert_allclose(d, bd, atol=2e-3)
    # candidate ORDER is exact: distances ascend
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_device_rerank_beats_raw_i8(unit_vectors):
    """Re-rank must not be worse than the raw i8 scan on the same data."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4000, 384)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:8] + 0.02 * rng.standard_normal((8, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    _, bi = brute_force(q, x, 10)

    def recall(index):
        _, i = index.search(q, 10)
        return np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, bi)])

    raw = FlatIndex(dtype="i8", capacity=4096)
    raw.add(x)
    rr = FlatIndex(dtype="i8", capacity=4096, exact="f16")
    rr.add(x)
    assert recall(rr) >= recall(raw)


def test_device_rerank_growth_and_masking(unit_vectors):
    idx = FlatIndex(dtype="i8", capacity=64, segment=64, exact="f16")
    x = unit_vectors(200)
    idx.add(x[:50])
    idx.add(x[50:])  # forces growth; exact buffer must grow too
    assert idx._exact.shape[0] == idx.capacity
    d, i = idx.search(x[7:8], 300)
    valid = i[0] >= 0
    assert valid.sum() == min(200, idx.capacity - idx.rerank_extra) \
        or valid.sum() == 200
    assert i[0, 0] == 7 and d[0, 0] < 1e-3


def test_device_rerank_save_load(tmp_path, unit_vectors):
    x = unit_vectors(100)
    idx = FlatIndex(dtype="i8", capacity=128, exact="f16")
    idx.add(x)
    p = str(tmp_path / "ix.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    assert idx2.device_rerank and len(idx2) == 100
    d1, i1 = idx.search(x[:4], 5)
    d2, i2 = idx2.search(x[:4], 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_device_rerank_rejects_f32():
    with pytest.raises(ValueError):
        FlatIndex(dtype="f32", exact="f16")


def test_old_snapshot_still_loads(tmp_path, unit_vectors):
    """Round-1 snapshots have no `exact` key."""
    x = unit_vectors(50)
    idx = FlatIndex(dtype="i8", capacity=64)
    idx.add(x)
    p = str(tmp_path / "old.npz")
    idx.save(p)
    # strip the exact key to simulate a round-1 file
    with np.load(p) as z:
        arrs = {n: z[n] for n in z.files if n != "exact"}
    np.savez(p + ".tmp.npz", **arrs)
    import os
    os.replace(p + ".tmp.npz", p)
    idx2 = FlatIndex.load(p)
    assert not idx2.device_rerank and len(idx2) == 50


# -- fused score+select kernel (selector="fused") -----------------------


def test_fused_selector_matches_brute_force(unit_vectors):
    """Windowed-candidate recall at small N is bounded by window
    collisions (~k^2*64/N) — assert the small-N bound here; 1M-row
    recall is measured on the real chip (doc/performance.md)."""
    x = unit_vectors(16384)
    q = unit_vectors(16)
    idx = FlatIndex(dtype="i8", capacity=16384, segment=16384,
                    selector="fused")
    idx.fused_min_rows = 0
    idx.add(x)
    d, i = idx.search(q, 10)
    bd, bi = brute_force(q, x, 10)
    hits = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, bi)])
    assert hits >= 0.85
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    # top-1 is never shadowed-and-lost at these odds
    assert (i[:, 0] == bi[:, 0]).mean() >= 0.9


def test_search_select_rejects_unpadded_capacity(unit_vectors):
    """A capacity that isn't a TN multiple must raise, not silently
    floor-truncate the grid and emit garbage candidate columns (the
    failure mode observed as recall 0.77 on a 1e6-capacity buffer)."""
    from dawnsearch_tpu.ops.scan_select import search_select
    import jax.numpy as jnp

    q = jnp.asarray(unit_vectors(8))
    bad = jnp.zeros((100_000, 384), jnp.int8)
    with pytest.raises(ValueError, match="capacity"):
        search_select(bad, jnp.ones((100_000,), jnp.float32), q,
                      jnp.int32(100_000), 10)
    # tn below W*128 would emit <128-lane output blocks (Mosaic rejects)
    ok = jnp.zeros((32768, 384), jnp.int8)
    with pytest.raises(ValueError, match="capacity"):
        search_select(ok, jnp.ones((32768,), jnp.float32), q,
                      jnp.int32(32768), 10, tn=8192)


def test_fused_selector_qi8_scoring(unit_vectors):
    """s8xs8 MXU scoring (search_select(qi8=True)): distances track the
    bf16 path within query-quantization error and recall holds."""
    from dawnsearch_tpu.ops.scan_select import search_select
    import jax.numpy as jnp

    x = unit_vectors(16384)
    q = unit_vectors(16)
    idx = FlatIndex(dtype="i8", capacity=16384, segment=16384)
    idx.add(x)
    args = (idx._codes, idx._scales, jnp.asarray(q), jnp.int32(idx.count))
    d0, i0 = search_select(*args, 10, qi8=False)
    d1, i1 = search_select(*args, 10, qi8=True)
    d0, i0, d1, i1 = map(np.asarray, (d0, i0, d1, i1))
    # same candidates up to near-tie permutations within quant noise
    overlap = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i0, i1)])
    assert overlap >= 0.8
    np.testing.assert_allclose(d0[:, 0], d1[:, 0], atol=5e-3)
    bd, bi = brute_force(q, x, 10)
    hits = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i1, bi)])
    assert hits >= 0.85
    # batch-padding rows (zero queries) stay harmless
    d2, i2 = search_select(idx._codes, idx._scales,
                           jnp.asarray(q[:3]), jnp.int32(idx.count),
                           5, qi8=True)
    assert np.asarray(i2).shape == (3, 5) and (np.asarray(i2) >= 0).all()


def test_fused_selector_bf16_codes(unit_vectors):
    """The scale-less bf16 storage path through the fused kernel (its
    dummy-scale BlockSpec and bf16 scoring branch): recall parity with
    i8 and correct gating."""
    from dawnsearch_tpu.ops.scan_select import eligible

    x = unit_vectors(16384)
    q = unit_vectors(16)
    idx = FlatIndex(dtype="bf16", capacity=16384, segment=16384,
                    selector="fused")
    idx.fused_min_rows = 0
    idx.add(x)
    assert eligible(idx.count, idx.capacity, idx.dim, idx.dtype,
                    idx.selector, 0)
    d, i = idx.search(q, 10)
    bd, bi = brute_force(q, x, 10)
    hits = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, bi)])
    assert hits >= 0.9  # bf16 rounding only — tighter than i8
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    np.testing.assert_allclose(d[:, 0], bd[:, 0], atol=1e-2)


def test_fused_selector_with_device_rerank(unit_vectors):
    x = unit_vectors(16384)
    q = unit_vectors(8)
    idx = FlatIndex(dtype="i8", capacity=16384, segment=16384,
                    selector="fused", exact="f16")
    idx.fused_min_rows = 0
    idx.add(x)
    d, i = idx.search(q, 10)
    # re-ranked distances are exact (f16) for found candidates
    for b in range(8):
        for dd, ii in zip(d[b], i[b]):
            if ii >= 0:
                assert abs(dd - (1.0 - q[b] @ x[ii])) < 2e-3


def test_fused_selector_gates_and_falls_back(unit_vectors):
    x = unit_vectors(100)
    # below fused_min_rows: the XLA path serves small counts exactly
    idx = FlatIndex(dtype="i8", capacity=16384, segment=16384,
                    selector="fused")
    idx.add(x)
    d, i = idx.search(x[:2], 20)
    assert (i >= 0).sum() == 40 and i[0, 0] == 0 and d[0, 0] < 1e-2
    # unsupported capacity (not a TN multiple) falls back too
    idx2 = FlatIndex(dtype="i8", capacity=4096, segment=4096,
                     selector="fused")
    idx2.fused_min_rows = 0
    idx2.add(x)
    d2, i2 = idx2.search(x[:1], 5)
    assert i2[0, 0] == 0


def test_fused_selector_partial_fill_masks_tail(unit_vectors):
    """count < capacity: window candidates past count come back inf/-1."""
    x = unit_vectors(300)
    idx = FlatIndex(dtype="i8", capacity=16384, segment=16384,
                    selector="fused")
    idx.fused_min_rows = 0
    idx.add(x)
    d, i = idx.search(x[:2], 10)
    valid = i >= 0
    assert np.all(i[valid] < 300)
    assert np.all(np.isinf(d[~valid]))
    assert i[0, 0] == 0 and d[0, 0] < 1e-2


def test_load_backfills_exact_shadow(unit_vectors, tmp_path):
    """Round-2 advisor (low): load(exact="f16") on a snapshot saved
    without the shadow must backfill it from dequantized codes, not
    serve an all-zero buffer that scores everything at distance 1.0."""
    x = unit_vectors(300)
    idx = FlatIndex(dtype="i8", capacity=512, segment=256)
    idx.add(x)
    p = str(tmp_path / "noexact.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p, exact="f16")
    assert idx2.device_rerank
    shadow = np.asarray(idx2._exact[:300], np.float32)
    np.testing.assert_allclose(shadow, x, atol=2e-2)
    d, i = idx2.search(x[:4], 5)
    assert (i[:, 0] == np.arange(4)).all()
    assert np.all(d[:, 0] < 1e-2)


def test_fused_path_rejects_nonunit_host_queries(unit_vectors):
    """Round-2 advisor (low): FlatIndex.search silently flips to the
    fused selector at scale; non-unit numpy queries must raise there
    (the packed-key compare needs |dot| < 2) instead of returning
    confidently wrong ids."""
    x = unit_vectors(16384)
    idx = FlatIndex(dtype="i8", capacity=16384, segment=16384,
                    selector="fused")
    idx.fused_min_rows = 0
    idx.add(x)
    with pytest.raises(ValueError, match="not normalized"):
        idx.search(2.0 * x[:4], 5)
    d, i = idx.search(x[:4], 5)  # unit queries fine
    assert (i[:, 0] == np.arange(4)).all()
    # below the fused gate the XLA path handles any norm exactly
    idx2 = FlatIndex(dtype="i8", capacity=16384, segment=16384)
    idx2.add(x[:100])
    d2, i2 = idx2.search(2.0 * x[:4], 5)
    assert (i2[:, 0] == np.arange(4)).all()


def test_load_explicit_exact_none_drops_shadow(unit_vectors, tmp_path):
    """Config is policy: an operator flipping index_rerank device->host
    passes exact=None on reload, and the snapshot's f16 shadow must be
    DROPPED (round-3 review: it silently held +2 B/dim of HBM and
    diverged from ShardedFlatIndex.load)."""
    x = unit_vectors(100)
    idx = FlatIndex(dtype="i8", capacity=256, segment=256, exact="f16")
    idx.add(x)
    p = str(tmp_path / "shadow.npz")
    idx.save(p)
    # absent kwarg: snapshot wins (back-compat)
    idx2 = FlatIndex.load(p)
    assert idx2.device_rerank
    # explicit None: config wins
    idx3 = FlatIndex.load(p, exact=None)
    assert not idx3.device_rerank and idx3._exact is None
    d, i = idx3.search(x[:4], 5)
    assert (i[:, 0] == np.arange(4)).all()


@pytest.mark.parametrize("dtype,exact", [("i8", None), ("i8", "f16"),
                                         ("i4", None), ("f32", None)])
def test_add_stream_matches_sequential_add(unit_vectors, dtype, exact):
    """add_stream (pipelined bulk path) must be bit-identical to a loop
    of add() calls: same ids, same buffers, same search results —
    including across a capacity growth boundary."""
    if dtype == "f32" and exact:
        pytest.skip("redundant combo")
    x = unit_vectors(700)
    blocks = [x[0:200], x[200:200], x[200:450], x[450:700]]  # incl. empty
    a = FlatIndex(dtype=dtype, capacity=256, exact=exact)
    b = FlatIndex(dtype=dtype, capacity=256, exact=exact)
    ids_a = [a.add(blk) for blk in blocks]
    ids_b = b.add_stream(iter(blocks))
    np.testing.assert_array_equal(np.concatenate(ids_a), ids_b)
    assert a.count == b.count == 700
    np.testing.assert_array_equal(np.asarray(a._codes), np.asarray(b._codes))
    if a._scales is not None:
        np.testing.assert_array_equal(np.asarray(a._scales),
                                      np.asarray(b._scales))
    if a._exact is not None:
        np.testing.assert_array_equal(np.asarray(a._exact),
                                      np.asarray(b._exact))
    q = unit_vectors(3)
    da, ia = a.search(q, 5)
    db, ib = b.search(q, 5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db)


def test_add_stream_propagates_generator_error(unit_vectors):
    idx = FlatIndex(dtype="i8", capacity=256)

    def gen():
        yield unit_vectors(10)
        raise RuntimeError("corpus source died")

    with pytest.raises(RuntimeError, match="corpus source died"):
        idx.add_stream(gen())
    assert idx.count == 10  # the committed prefix is kept


def test_add_stream_consumer_error_unblocks_producer(unit_vectors):
    """A _commit failure mid-stream (IndexFull at max_capacity) must
    surface promptly AND release the prefetch thread: before the
    stop-event fix the producer sat blocked on a full queue and the
    error path hung 60 s in t.join before leaking the thread."""
    import time

    from dawnsearch_tpu.index.flat import IndexFull

    idx = FlatIndex(dtype="i8", capacity=64, segment=64, max_capacity=64)

    def gen():  # far more blocks than capacity: queue stays full
        for _ in range(50):
            yield unit_vectors(64)

    t0 = time.monotonic()
    with pytest.raises(IndexFull):
        idx.add_stream(gen())
    assert time.monotonic() - t0 < 10  # no 60 s join hang
    assert idx.count == 64  # the committed prefix is kept
    import threading
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and any(
            th.name == "flatindex-add-prefetch" and th.is_alive()
            for th in threading.enumerate()):
        time.sleep(0.05)
    assert not any(th.name == "flatindex-add-prefetch" and th.is_alive()
                   for th in threading.enumerate())


def test_add_stream_empty_iterable():
    idx = FlatIndex(dtype="i8", capacity=256)
    ids = idx.add_stream(iter([]))
    assert ids.shape == (0,)
    assert idx.count == 0


def test_fused_hbm_guard_chunks_oversize_batches(unit_vectors):
    """The fused path's candidate temps scale with B x capacity; a
    batch past _max_fused_batch() must dispatch in chunks and return
    results identical to the single-program path (round-4: the 64M i4
    acceptance run OOM'd at compile time at batch 512 — the guard
    turns that into sequential chunks instead of an XLA error)."""
    x = unit_vectors(16384)
    q = unit_vectors(16)
    idx = FlatIndex(dtype="i8", capacity=16384, segment=16384,
                    selector="fused")
    idx.fused_min_rows = 0
    idx.add(x)
    d_full, i_full = idx.search(q, 10)
    idx._max_fused_batch = lambda: 8  # force 2 chunks
    d_chunk, i_chunk = idx.search(q, 10)
    np.testing.assert_array_equal(i_full, i_chunk)
    np.testing.assert_allclose(d_full, d_chunk)
    # on non-TPU backends the real guard is inert (no fixed HBM)
    del idx._max_fused_batch
    assert idx._max_fused_batch() >= q.shape[0]


def test_hbm_budget_drives_max_fused_batch(monkeypatch):
    """_max_fused_batch derives from the runtime-reported HBM budget
    (round-4 VERDICT item 7: the 15 GiB constant was reverse-engineered
    from one v5e OOM dump; other chip generations must come through
    memory_stats). Boundary: the power-of-two floor of
    (budget - nbytes) / (13 * capacity / 128)."""
    from dawnsearch_tpu.index import flat

    idx = FlatIndex(dtype="i8", capacity=131072, segment=16384)
    per_row = 13 * (idx.capacity // 128)
    monkeypatch.setattr(flat.jax, "default_backend", lambda: "tpu")
    # budget chosen so free/per_row = 100 -> power-of-two floor 64
    monkeypatch.setattr(flat, "_HBM_BUDGET", idx.nbytes + 100 * per_row)
    assert idx._max_fused_batch() == 64
    # one row of budget less than 8 batch rows still floors at 8
    monkeypatch.setattr(flat, "_HBM_BUDGET", idx.nbytes + 3 * per_row)
    assert idx._max_fused_batch() == 8


def test_hbm_budget_prefers_runtime_memory_stats(monkeypatch):
    """Where the backend exposes memory_stats()['bytes_limit'], the
    budget is that limit minus the 0.75 GiB working margin — not the
    v5e constant."""
    from dawnsearch_tpu.index import flat

    class _Dev:
        @staticmethod
        def memory_stats():
            return {"bytes_limit": 32 * 2**30}

    monkeypatch.setattr(flat, "_HBM_BUDGET", None)
    monkeypatch.setattr(flat.jax, "local_devices", lambda: [_Dev()])
    assert flat._hbm_budget() == 32 * 2**30 - (3 * 2**30) // 4

    class _NoStats:
        @staticmethod
        def memory_stats():
            raise NotImplementedError

    monkeypatch.setattr(flat, "_HBM_BUDGET", None)
    monkeypatch.setattr(flat.jax, "local_devices", lambda: [_NoStats()])
    assert flat._hbm_budget() == 15 * 2**30  # the named v5e fallback
