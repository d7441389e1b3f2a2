"""SearchProvider: insert/search/save/rebuild/verify (vs search_provider.rs)."""

import numpy as np
import pytest

from dawnsearch_tpu.index.provider import SearchProvider


def make_pages(unit_vectors, n, prefix="p"):
    embs = unit_vectors(n)
    urls = [f"http://{prefix}{i}" for i in range(n)]
    titles = [f"Title {prefix}{i}" for i in range(n)]
    texts = [f"text body {prefix}{i}" for i in range(n)]
    return urls, titles, texts, embs


def test_insert_and_search(unit_vectors):
    sp = SearchProvider(data_dir=None, index_dtype="f32")
    urls, titles, texts, embs = make_pages(unit_vectors, 50)
    ids = sp.insert_pages(urls, titles, texts, embs)
    assert all(i is not None for i in ids)
    res = sp.search_embeddings(embs[7], k=5)[0]
    assert res.pages_searched == 50
    assert res.pages[0].url == "http://p7"
    assert res.pages[0].distance < 1e-4
    assert res.pages[0].title == "Title p7"


def test_batched_search(unit_vectors):
    sp = SearchProvider(data_dir=None, index_dtype="f32")
    urls, titles, texts, embs = make_pages(unit_vectors, 30)
    sp.insert_pages(urls, titles, texts, embs)
    results = sp.search_embeddings(embs[:4], k=3)
    assert len(results) == 4
    for b, res in enumerate(results):
        assert res.pages[0].url == f"http://p{b}"


def test_duplicate_urls_not_indexed(unit_vectors):
    sp = SearchProvider(data_dir=None, index_dtype="f32")
    urls, titles, texts, embs = make_pages(unit_vectors, 5)
    sp.insert_pages(urls, titles, texts, embs)
    ids = sp.insert_pages(urls[:2], titles[:2], texts[:2], embs[:2])
    assert ids == [None, None]
    assert len(sp.index) == 5 and len(sp.store) == 5


def test_page_cap(unit_vectors):
    sp = SearchProvider(data_dir=None, index_dtype="f32", max_pages=3)
    urls, titles, texts, embs = make_pages(unit_vectors, 5)
    ids = sp.insert_pages(urls, titles, texts, embs)
    assert sum(i is not None for i in ids) == 3
    assert sp.stats()["pages_indexed"] == 3


def test_save_load_snapshot(tmp_path, unit_vectors):
    d = str(tmp_path)
    sp = SearchProvider(data_dir=d, index_dtype="f32")
    urls, titles, texts, embs = make_pages(unit_vectors, 20)
    sp.insert_pages(urls, titles, texts, embs)
    sp.shutdown()

    sp2 = SearchProvider(data_dir=d, index_dtype="f32")
    assert len(sp2.index) == 20
    res = sp2.search_embeddings(embs[3], k=1)[0]
    assert res.pages[0].url == "http://p3"
    sp2.shutdown()


def test_rebuild_from_db_when_snapshot_missing(tmp_path, unit_vectors):
    import os
    d = str(tmp_path)
    sp = SearchProvider(data_dir=d, index_dtype="f32")
    urls, titles, texts, embs = make_pages(unit_vectors, 12)
    sp.insert_pages(urls, titles, texts, embs)
    sp.store.conn.commit()
    # simulate crash before save: delete snapshot if any, keep sqlite
    sp.store.close()
    idx_path = sp.index_path
    if os.path.exists(idx_path):
        os.remove(idx_path)

    sp2 = SearchProvider(data_dir=d, index_dtype="f32")
    assert len(sp2.index) == 12  # rebuilt from DB (search_provider.rs:127-153)
    res = sp2.search_embeddings(embs[5], k=1)[0]
    assert res.pages[0].url == "http://p5"
    sp2.shutdown()


def test_stale_snapshot_triggers_rebuild(tmp_path, unit_vectors):
    d = str(tmp_path)
    sp = SearchProvider(data_dir=d, index_dtype="f32")
    urls, titles, texts, embs = make_pages(unit_vectors, 8)
    sp.insert_pages(urls[:4], titles[:4], texts[:4], embs[:4])
    sp.save()
    # more inserts after the snapshot -> snapshot stale
    sp.insert_pages(urls[4:], titles[4:], texts[4:], embs[4:])
    sp.store.close()

    sp2 = SearchProvider(data_dir=d, index_dtype="f32")
    assert len(sp2.index) == 8
    sp2.shutdown()


def test_embedding_for_page_roundtrip(unit_vectors):
    sp = SearchProvider(data_dir=None, index_dtype="f32")
    urls, titles, texts, embs = make_pages(unit_vectors, 3)
    sp.insert_pages(urls, titles, texts, embs)
    emb = sp.embedding_for_page(2)
    np.testing.assert_allclose(emb, embs[1], atol=1e-7)


def test_f32_rerank_restores_exact_order(unit_vectors):
    """i8 candidates get exact f32 ordering from the store (SURVEY §7
    'hard parts': re-ranking top candidates at f32)."""
    import numpy as np
    from dawnsearch_tpu.index.provider import SearchProvider

    x = unit_vectors(3000)
    urls = [f"https://r/{i}" for i in range(len(x))]
    prov = SearchProvider(data_dir=None, verify_on_load=False, rerank=30)
    for s in range(0, len(x), 500):
        prov.insert_pages(urls[s:s+500], ["t"] * 500, ["x"] * 500, x[s:s+500])
    q = x[:24]
    exact = np.argsort(1.0 - q @ x.T, axis=1)[:, :10]
    got = prov.search_embeddings(q, k=10)
    reranked = np.array([[p.page_id - 1 for p in r.pages] for r in got])
    rr = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(reranked, exact)])

    prov2 = SearchProvider(data_dir=None, verify_on_load=False, rerank=0)
    for s in range(0, len(x), 500):
        prov2.insert_pages(urls[s:s+500], ["t"] * 500, ["x"] * 500, x[s:s+500])
    raw = prov2.search_embeddings(q, k=10)
    rawids = np.array([[p.page_id - 1 for p in r.pages] for r in raw])
    nr = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(rawids, exact)])

    assert rr >= nr  # re-rank never hurts
    assert rr >= 0.99, (rr, nr)  # and is near-exact at this scale
    # distances come back exact f32 (self-query distance ~ 0)
    assert got[0].pages[0].page_id == 1 and got[0].pages[0].distance < 1e-6


def test_store_pages_rollback_on_rejected_row(unit_vectors):
    # Fused-ingest order: index rows are written BEFORE the store. If the
    # store rejects one mid-batch (e.g. a URL raced in), the index must
    # roll back to the stored prefix so the row_id->store_id(+1) mapping
    # never shifts (ADVICE r1 medium #1).
    sp = SearchProvider(data_dir=None, index_dtype="i8")
    urls, titles, texts, embs = make_pages(unit_vectors, 3, prefix="a")
    sp.insert_pages(urls, titles, texts, embs)

    new = unit_vectors(3)
    # simulate the fused program: device index already holds the rows
    sp.index.add(new)
    # middle row collides with an existing URL -> store rejects it
    ids = sp.store_pages(
        ["http://b0", "http://a1", "http://b2"],
        ["B0", "dup", "B2"], ["b0", "dup", "b2"], new)
    assert ids[0] == 4 and ids[1] is None and ids[2] == 5
    assert len(sp.index) == len(sp.store) == 5
    # mapping is intact: searching each stored vector finds its own url
    res = sp.search_embeddings(new[0], k=1)[0]
    assert res.pages[0].url == "http://b0"
    res = sp.search_embeddings(new[2], k=1)[0]
    assert res.pages[0].url == "http://b2"
    # and the original pages still resolve
    res = sp.search_embeddings(embs[1], k=1)[0]
    assert res.pages[0].url == "http://a1"


def test_search_rejects_non_unit_queries(unit_vectors):
    """Reference parity (search_provider.rs:206-208) AND a fused-kernel
    precondition (packed-key compare needs dot < 2): non-normalized
    query embeddings raise instead of returning silently wrong ids."""
    sp = SearchProvider(data_dir=None, index_dtype="i8")
    urls, titles, texts, embs = make_pages(unit_vectors, 4)
    sp.insert_pages(urls, titles, texts, embs)
    with pytest.raises(ValueError, match="not normalized"):
        sp.search_embeddings(embs[0] * 3.0, k=2)
    with pytest.raises(ValueError, match="not normalized"):
        sp.search_embeddings(np.zeros(384, np.float32), k=2)
    # within the reference's 0.01 tolerance passes
    res = sp.search_embeddings(embs[0] * 1.009, k=1)[0]
    assert res.pages[0].url == urls[0]


def test_store_pages_sharded_rebuild_on_rejected_row(unit_vectors):
    """Same mid-batch store rejection on a SHARDED index: it has no
    linear `count` to roll back, so the provider must rebuild the
    device index from the store and keep the uid<->store-id mapping."""
    import jax

    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    sp = SearchProvider(
        data_dir=None, index_dtype="i8",
        index_factory=lambda: ShardedFlatIndex(
            mesh=make_mesh({"shard": 4}, devices=jax.devices()[:4]),
            dtype="i8", capacity_per_shard=64, segment=64))
    urls, titles, texts, embs = make_pages(unit_vectors, 3, prefix="a")
    sp.insert_pages(urls, titles, texts, embs)

    new = unit_vectors(3)
    sp.index.add(new)  # simulate the fused program's device-first write
    ids = sp.store_pages(
        ["http://b0", "http://a1", "http://b2"],
        ["B0", "dup", "B2"], ["b0", "dup", "b2"], new)
    assert ids[0] == 4 and ids[1] is None and ids[2] == 5
    assert len(sp.index) == len(sp.store) == 5
    for emb, url in ((new[0], "http://b0"), (new[2], "http://b2"),
                     (embs[1], "http://a1")):
        res = sp.search_embeddings(emb, k=1)[0]
        assert res.pages[0].url == url


def test_device_rerank_index_skips_host_rerank(unit_vectors, monkeypatch):
    """A FlatIndex with the f16 device re-rank comes back pre-ranked:
    the provider must not redo the host f32 pass, and results stay
    exact-ordered."""
    from dawnsearch_tpu.index.flat import FlatIndex

    sp = SearchProvider(
        data_dir=None,
        index_factory=lambda: FlatIndex(dtype="i8", exact="f16",
                                        max_capacity=1_000_000))
    urls, titles, texts, embs = make_pages(unit_vectors, 300)
    sp.insert_pages(urls, titles, texts, embs)

    called = []
    monkeypatch.setattr(
        sp, "_rerank_f32",
        lambda *a, **kw: called.append(1) or (_ for _ in ()).throw(
            AssertionError("host rerank must be skipped")))
    res = sp.search_embeddings(embs[42], k=5)[0]
    assert not called
    assert res.pages[0].url == "http://p42"
    assert res.pages[0].distance < 1e-3
    ds = [p.distance for p in res.pages]
    assert ds == sorted(ds)


def test_node_config_selects_device_rerank(unit_vectors):
    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.node import make_index_factory

    ix = make_index_factory(Config(index_rerank="device"))()
    assert ix.device_rerank
    ix_host = make_index_factory(Config())()
    assert not getattr(ix_host, "device_rerank", False)


def test_reload_preserves_index_config(tmp_path, unit_vectors):
    """Snapshots store data, not policy: a reloaded provider re-applies
    the factory's max_capacity/exact so cap semantics survive restart
    (round-2 VERDICT weak #4)."""
    from dawnsearch_tpu.index.flat import FlatIndex

    d = str(tmp_path)

    def factory():
        return FlatIndex(dim=384, dtype="i8", max_capacity=100)
    factory.load_kwargs = {"max_capacity": 100}

    sp = SearchProvider(data_dir=d, max_pages=100, index_factory=factory)
    urls, titles, texts, embs = make_pages(unit_vectors, 20)
    sp.insert_pages(urls, titles, texts, embs)
    sp.shutdown()

    sp2 = SearchProvider(data_dir=d, max_pages=100, index_factory=factory)
    assert len(sp2.index) == 20
    assert sp2.index.max_capacity == 100  # was None before the fix
    sp2.shutdown()


def test_default_provider_reload_keeps_cap(tmp_path, unit_vectors):
    """Even without a custom factory, the default provider's max_pages
    cap reaches the reloaded index."""
    d = str(tmp_path)
    sp = SearchProvider(data_dir=d, max_pages=50)
    urls, titles, texts, embs = make_pages(unit_vectors, 10)
    sp.insert_pages(urls, titles, texts, embs)
    sp.shutdown()
    sp2 = SearchProvider(data_dir=d, max_pages=50)
    assert sp2.index.max_capacity == 50
    sp2.shutdown()


def test_load_index_filters_mismatched_kwargs(tmp_path, unit_vectors):
    """index_kind changed between runs: the old snapshot still loads —
    stray config kwargs (e.g. a mesh for a flat snapshot) are filtered,
    not fatal."""
    from dawnsearch_tpu.index import load_index
    from dawnsearch_tpu.index.flat import FlatIndex

    x = unit_vectors(30)
    ix = FlatIndex(dtype="i8", capacity=64, segment=64)
    ix.add(x)
    p = str(tmp_path / "flat.npz")
    ix.save(p)
    ix2 = load_index(p, max_capacity=64, mesh=object(), dp_axis="dp")
    assert isinstance(ix2, FlatIndex)
    assert ix2.max_capacity == 64 and len(ix2) == 30
