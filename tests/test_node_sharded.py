"""DawnNode e2e on index_kind="sharded": the flagship multi-chip design
driven through the product surface (VERDICT r1 gap #4).

Boot on the 8-device mesh -> /api/insert -> /?q= -> snapshot ->
reload -> same answers; plus mapping correctness when reloading onto a
different shard count, and a bulk-add throughput guard on the
vectorized striping (VERDICT r1 weak #4).
"""

import time

import numpy as np

from dawnsearch_tpu.config import Config
from dawnsearch_tpu.node import DawnNode
from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
from tests.test_node import HashEncoder, get_json, make_cfg, post_json


def _sharded_cfg(tmp_path, **kw):
    kw.setdefault("mesh_shards", 0)
    return make_cfg(tmp_path, index_kind="sharded", **kw)


def test_sharded_node_end_to_end_and_persistence(tmp_path):
    cfg = _sharded_cfg(tmp_path)
    with DawnNode(cfg, encoder=HashEncoder()) as node:
        assert type(node.provider.index) is ShardedFlatIndex
        assert node.provider.index.n_shards == 8
        base = f"http://127.0.0.1:{node.http_port}"
        post_json(base + "/api/insert", {"pages": [
            {"url": f"https://e.com/{i}", "title": f"T{i}", "text": f"body {i}"}
            for i in range(20)]})
        data = get_json(base + "/api/search?q=T7%0Abody+7")
        assert data["results"][0]["url"] == "https://e.com/7"
        # HTML surface too (the reference's /?q= route)
        import urllib.request
        with urllib.request.urlopen(base + "/?q=T7%0Abody+7", timeout=30) as r:
            assert b"https://e.com/7" in r.read()
        assert get_json(base + "/api/stats")["pages_indexed"] == 20

    # restart on the same data dir: the sharded snapshot reloads
    with DawnNode(cfg, encoder=HashEncoder()) as node2:
        assert type(node2.provider.index) is ShardedFlatIndex
        base = f"http://127.0.0.1:{node2.http_port}"
        assert get_json(base + "/api/stats")["pages_indexed"] == 20
        data = get_json(base + "/api/search?q=T7%0Abody+7")
        assert data["results"][0]["url"] == "https://e.com/7"


def test_sharded_node_reshard_on_reload(tmp_path):
    # Save with 4 shards, reload with all 8: rows re-stripe, the
    # row_id -> store_id mapping must survive.
    cfg = _sharded_cfg(tmp_path, mesh_shards=4)
    with DawnNode(cfg, encoder=HashEncoder()) as node:
        assert node.provider.index.n_shards == 4
        base = f"http://127.0.0.1:{node.http_port}"
        post_json(base + "/api/insert", {"pages": [
            {"url": f"https://e.com/{i}", "title": f"T{i}", "text": f"body {i}"}
            for i in range(10)]})
    cfg.mesh_shards = 0
    with DawnNode(cfg, encoder=HashEncoder()) as node2:
        base = f"http://127.0.0.1:{node2.http_port}"
        for i in (0, 4, 9):
            data = get_json(base + f"/api/search?q=T{i}%0Abody+{i}")
            assert data["results"][0]["url"] == f"https://e.com/{i}"


def test_sharded_bulk_add_is_vectorized(unit_vectors):
    # 100k rows through the striping path must take seconds, not the
    # minutes a per-row Python argmin loop took (VERDICT r1 weak #4).
    idx = ShardedFlatIndex(dtype="i8", capacity_per_shard=16384,
                           segment=16384)
    rows = unit_vectors(100_000)
    t0 = time.perf_counter()
    ids = idx.add(rows)
    dt = time.perf_counter() - t0
    assert len(ids) == 100_000 and len(idx) == 100_000
    assert dt < 30.0, f"bulk add took {dt:.1f}s — striping regressed?"
    # striping stayed balanced
    assert idx._counts.max() - idx._counts.min() <= 1
    # and the index still answers exactly
    d, u = idx.search(rows[:8], k=1)
    assert (u[:, 0] == ids[:8]).all()


def test_striping_matches_argmin_semantics(unit_vectors):
    # Water-filling must reproduce the balance of the old per-row argmin
    # loop from any skewed starting point.
    idx = ShardedFlatIndex(dtype="f32", capacity_per_shard=64, segment=64)
    idx._counts[:] = [13, 2, 7, 2, 0, 5, 1, 9]
    before = idx._counts.copy()
    n = 17
    idx.add(unit_vectors(n), ids=np.arange(n))
    ref = before.copy()
    for _ in range(n):
        ref[int(np.argmin(ref))] += 1
    assert (np.sort(idx._counts) == np.sort(ref)).all()
    assert int(idx._counts.sum()) == int(before.sum()) + n
