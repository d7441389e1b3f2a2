"""Fused text->embed->search path vs the split pipeline (CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dawnsearch_tpu.index.provider import SearchProvider
from dawnsearch_tpu.models.bert import BertConfig
from dawnsearch_tpu.models.encoder import SentenceEncoder
from dawnsearch_tpu.models.tokenizer import (
    WordPieceTokenizer, build_vocab_from_corpus)
from dawnsearch_tpu.models.weights import init_params
from dawnsearch_tpu.serving.batcher import EmbeddingBatcher
from dawnsearch_tpu.serving.search_service import SearchService

CORPUS = [
    "the lighthouse keeper watched the storm",
    "quantum matrix operations on tensor processors",
    "a recipe for sourdough bread and butter",
    "railway schedules across the mountain pass",
    "deep sea creatures of the midnight zone",
]

CFG = BertConfig(vocab_size=2048, hidden_size=64, num_layers=2, num_heads=4,
                 intermediate_size=128, max_position_embeddings=64)


@pytest.fixture(scope="module")
def encoder():
    vocab = build_vocab_from_corpus(CORPUS, size=2048)
    params = init_params(jax.random.key(0), CFG)
    return SentenceEncoder(params, WordPieceTokenizer(vocab), cfg=CFG,
                           seq_buckets=(16, 32), batch_buckets=(1, 8, 32))


@pytest.fixture
def service(encoder):
    provider = SearchProvider(data_dir=None, dim=64, verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8, max_wait_ms=20.0)
    svc = SearchService(provider, batcher, instance_id="fused-node")
    yield svc
    batcher.stop()
    svc.shutdown()


def test_fused_path_active(service):
    assert service._fused is not None and service._text_batcher is not None


def test_fused_matches_split_pipeline(service):
    service.insert_pages([(f"https://f/{i}", f"T{i}", t)
                          for i, t in enumerate(CORPUS)])
    for q in CORPUS:
        fused = service.text_search(q)  # fused path
        emb = service.batcher.embed(q)
        split = service.embedding_search(emb)  # split path
        assert [p.page_id for p in fused.pages] == \
            [p.page_id for p in split.pages]
        np.testing.assert_allclose(
            [p.distance for p in fused.pages],
            [p.distance for p in split.pages], atol=1e-5)
    # self-query ranks itself first
    res = service.text_search(CORPUS[2])
    assert res.pages[0].url == "https://f/2"


def test_fused_remote_merge(service):
    from dawnsearch_tpu.index.provider import FoundPage

    class FakeRemote:
        def search(self, embedding, distance_limit, k):
            assert embedding.shape == (64,) or embedding.ndim == 1
            return [FoundPage(page_id=9, distance=0.0, url="https://peer/9",
                              title="Remote", text="", instance_id="peer")], 7, 1

        def replicate(self, *a):
            pass

        def fetch_embedding(self, *a):
            return None

    service.remote = FakeRemote()
    service.insert_pages([("https://f/a", "Alpha", CORPUS[0])],
                         from_network=True)
    res = service.text_search(CORPUS[0])
    assert res.pages[0].instance_id == "peer"  # distance 0 wins
    assert res.instances_contacted == 2
    assert any(p.instance_id == "fused-node" for p in res.pages)


def test_fused_disabled_for_fake_encoders():
    provider = SearchProvider(data_dir=None, verify_on_load=False)

    class Fake:
        def __call__(self, texts):
            return np.zeros((len(texts), 384), np.float32)

    batcher = EmbeddingBatcher(Fake(), max_batch=4)
    svc = SearchService(provider, batcher)
    assert svc._fused is None  # falls back to the split pipeline
    batcher.stop()


def test_fused_ingest_active_and_dedup(service):
    assert service._fused_ingest is not None
    # in-batch duplicate URL + cross-batch duplicate both skip cleanly
    ids = service.insert_pages([
        ("https://d/1", "One", CORPUS[0]),
        ("https://d/1", "Dup", CORPUS[1]),
        ("https://d/2", "Two", CORPUS[2]),
    ])
    assert ids[0] is not None and ids[1] is None and ids[2] is not None
    again = service.insert_pages([("https://d/2", "Again", CORPUS[3])])
    assert again == [None]
    # store and index agree; the pages are retrievable
    assert len(service.provider.store) == len(service.provider.index) == 2
    res = service.text_search(CORPUS[2], search_remote=False)
    assert res.pages[0].url == "https://d/2"


def test_pretokenized_insert_matches(service):
    """insert_pages(token_ids=...) — the ingest pipeline's tokenize
    stage — stores bit-identical embeddings to in-lock tokenization."""
    pages_a = [(f"https://tk/a{i}", f"T{i}", t) for i, t in enumerate(CORPUS)]
    pages_b = [(f"https://tk/b{i}", f"T{i}", t) for i, t in enumerate(CORPUS)]
    token_ids = service.tokenize_pages(pages_a)
    assert token_ids is not None and len(token_ids) == len(pages_a)
    ids_a = service.insert_pages(pages_a, token_ids=token_ids)
    ids_b = service.insert_pages(pages_b)  # same texts, in-lock tokenize
    assert all(i is not None for i in ids_a + ids_b)
    store = service.provider.store
    for ia, ib in zip(ids_a, ids_b):
        ea = store.embeddings_for([ia])[ia]
        eb = store.embeddings_for([ib])[ib]
        np.testing.assert_array_equal(ea, eb)
    # dedup still applies to pre-tokenized inserts (kept-subset slicing)
    dup = [pages_a[0], (f"https://tk/new", "N", CORPUS[1])]
    ids = service.insert_pages(dup, token_ids=service.tokenize_pages(dup))
    assert ids[0] is None and ids[1] is not None


def test_fused_ingest_chunks_past_max_bucket(encoder):
    """Batches larger than the encoder's biggest batch bucket chunk
    down inside FusedIngestPath — any ingest_batch_size is safe."""
    provider = SearchProvider(data_dir=None, dim=64, verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8)
    svc = SearchService(provider, batcher)
    try:
        assert svc._fused_ingest is not None
        assert encoder.batch_buckets[-1] == 32
        pages = [(f"https://big/{i}", "t", CORPUS[i % 5] + f" {i}")
                 for i in range(80)]  # 2.5x the max bucket
        ids = svc.insert_pages(pages, token_ids=svc.tokenize_pages(pages))
        assert all(i is not None for i in ids)
        assert len(provider.store) == len(provider.index) == 80
        # chunk-boundary rows (0 | 31/32 | 79) hold exactly the
        # embeddings a direct encode produces — no row got shifted or
        # dropped across the internal 32-page chunks
        probe = (0, 31, 32, 79)
        stored = provider.store.embeddings_for([ids[i] for i in probe])
        direct = encoder.encode([f"t\n{pages[i][2]}" for i in probe])
        got = np.stack([stored[ids[i]] for i in probe])
        np.testing.assert_allclose(got, direct, atol=1e-4)
    finally:
        batcher.stop()
        svc.shutdown()


def test_fused_ingest_dispatch_failure_stores_inflight(encoder):
    """A dispatch failure mid-pipeline must not strand the already
    dispatched sub-batches: their device rows HAVE landed, so the
    unwind stores them (store == index afterwards) instead of leaving
    a divergence the next insert pays a rebuild-from-store for."""
    provider = SearchProvider(data_dir=None, dim=64, verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8)
    svc = SearchService(provider, batcher)
    try:
        fi = svc._fused_ingest
        assert fi is not None
        real = fi.dispatch
        calls = {"n": 0}

        def flaky(pages, token_ids=None):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("device fell over")
            return real(pages, token_ids=token_ids)

        fi.dispatch = flaky
        pages = [(f"https://flaky/{i}", "t", CORPUS[i % 5] + f" {i}")
                 for i in range(80)]  # 3 sub-batches of the 32 bucket
        with pytest.raises(RuntimeError, match="device fell over"):
            svc.insert_pages(pages, token_ids=svc.tokenize_pages(pages))
        # the two dispatched sub-batches (32 + 32) were stored on the
        # unwind; store and index agree, and normal service resumes
        assert len(provider.store) == len(provider.index) == 64
        fi.dispatch = real
        ids = svc.insert_pages([("https://after/0", "t", CORPUS[0])])
        assert ids[0] is not None
        assert len(provider.store) == len(provider.index) == 65
    finally:
        batcher.stop()
        svc.shutdown()


def test_fused_ingest_capacity_cap(encoder):
    provider = SearchProvider(data_dir=None, dim=64, max_pages=2,
                              verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8)
    svc = SearchService(provider, batcher)
    try:
        ids = svc.insert_pages([(f"https://cap/{i}", "t", CORPUS[i % 5])
                                for i in range(4)])
        assert sum(1 for i in ids if i is not None) == 2  # cap enforced
        assert len(provider.store) == 2
    finally:
        batcher.stop()
        svc.shutdown()


def test_fused_ingest_persistence(encoder, tmp_path):
    """Pages ingested through the fused program survive a restart (both
    snapshot reload and rebuild-from-store keep row<->id alignment)."""
    import os
    from dawnsearch_tpu.index.provider import INDEX_FILE

    def make(data_dir):
        provider = SearchProvider(data_dir=data_dir, dim=64,
                                  verify_on_load=True)
        batcher = EmbeddingBatcher(encoder.encode, max_batch=8)
        return SearchService(provider, batcher, instance_id="p"), batcher

    d = str(tmp_path / "data")
    svc, b = make(d)
    svc.insert_pages([(f"https://p/{i}", f"T{i}", CORPUS[i]) for i in range(4)])
    assert svc._fused_ingest is not None
    want = [p.page_id for p in
            svc.text_search(CORPUS[1], search_remote=False).pages[:3]]
    b.stop()
    svc.shutdown()  # saves snapshot

    svc2, b2 = make(d)  # snapshot path
    got = [p.page_id for p in
           svc2.text_search(CORPUS[1], search_remote=False).pages[:3]]
    assert got == want
    b2.stop()
    svc2.shutdown()

    os.remove(os.path.join(d, INDEX_FILE))  # rebuild-from-store path
    svc3, b3 = make(d)
    got = [p.page_id for p in
           svc3.text_search(CORPUS[1], search_remote=False).pages[:3]]
    assert got == want
    b3.stop()
    svc3.shutdown()


def test_sharded_fused_ingest(encoder):
    """ShardedFusedIngestPath: encode -> quantize -> every shard writes
    its slice, ONE program over the 8-device mesh, driven through
    SearchService with pre-tokenized ids (the full ingest-pipeline
    shape on the multi-chip engine)."""
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
    from dawnsearch_tpu.serving.fused import ShardedFusedIngestPath

    provider = SearchProvider(
        data_dir=None, dim=64, verify_on_load=False,
        index_factory=lambda: ShardedFlatIndex(
            mesh=make_mesh({"shard": 8}), dim=64, dtype="i8",
            capacity_per_shard=64, segment=64, exact="f16"))
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8)
    svc = SearchService(provider, batcher, instance_id="sh-node")
    try:
        assert isinstance(svc._fused_ingest, ShardedFusedIngestPath)
        pages = [(f"https://sh/{i}", f"T{i}", CORPUS[i % 5] + f" v{i}")
                 for i in range(40)]
        ids = svc.insert_pages(pages, token_ids=svc.tokenize_pages(pages))
        assert ids == list(range(1, 41))  # store-id contract intact
        ix = provider.index
        assert len(ix) == 40
        counts = ix._counts
        assert int(counts.max()) - int(counts.min()) <= 1  # balanced
        # every uid 0..39 present exactly once on-device
        uids = np.asarray(ix._ids)
        assert sorted(uids[uids >= 0].tolist()) == list(range(40))
        # f16 shadow rows hold the embeddings the store persisted
        stored = provider.store.embeddings_for(ids)
        shadow = np.asarray(ix._exact, np.float32)
        for s in range(ix.n_shards):
            for r in range(int(counts[s])):
                uid = int(uids[s, r])
                np.testing.assert_allclose(
                    shadow[s, r], stored[uid + 1], atol=2e-3)
        # searching a stored embedding finds its own page
        res = svc.embedding_search(stored[8], k=5)
        assert any(p.page_id == 8 for p in res.pages)
        assert res.pages[0].distance < 0.05
        # a second batch appends at the new offsets (incremental path)
        more = [(f"https://sh/m{i}", "M", CORPUS[(i + 2) % 5] + f" m{i}")
                for i in range(7)]
        ids2 = svc.insert_pages(more)
        assert ids2 == list(range(41, 48)) and len(ix) == 47
    finally:
        batcher.stop()
        svc.shutdown()


def test_sharded_fused_ingest_grows_and_caps(encoder):
    """Mid-ingest per-shard growth under the fused program, and the
    split-path fallback when max_capacity can't fit block + scratch."""
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
    from dawnsearch_tpu.serving.fused import ShardedFusedIngestPath

    ix = ShardedFlatIndex(mesh=make_mesh({"shard": 8}), dim=64, dtype="i8",
                          capacity_per_shard=8, segment=8,
                          max_capacity=256)
    fp = ShardedFusedIngestPath(encoder, ix)
    texts = [CORPUS[i % 5] + f" g{i}" for i in range(120)]
    emb = fp.ingest(texts)  # 15 rows/shard — forces 8 -> 16 growth
    assert emb.shape == (120, 64) and len(ix) == 120
    assert ix.cap_per_shard == 16
    uids = np.asarray(ix._ids)
    assert sorted(uids[uids >= 0].tolist()) == list(range(120))
    # texts are near-duplicates, so i8 quant noise may swap same-topic
    # rows; assert the match is essentially exact rather than the id
    d, u = ix.search(emb[:3], k=1)
    assert np.all(d[:, 0] < 0.05) and np.all(u[:, 0] >= 0)

    # near max_capacity: fused block + scratch won't fit -> split path
    ix2 = ShardedFlatIndex(mesh=make_mesh({"shard": 8}), dim=64,
                           dtype="i8", capacity_per_shard=8, segment=8,
                           max_capacity=80)
    fp2 = ShardedFusedIngestPath(encoder, ix2)
    fp2.ingest([CORPUS[i % 5] + f" c{i}" for i in range(76)])
    assert len(ix2) == 76  # 9.5 rows/shard avg, cap 10/shard
    e3 = fp2.ingest([CORPUS[0] + " last", CORPUS[1] + " final"])
    assert e3.shape == (2, 64) and len(ix2) == 78
    d, u = ix2.search(e3, k=1)
    assert np.all(d[:, 0] < 0.05) and np.all(u[:, 0] >= 0)


def test_fused_with_device_rerank(encoder):
    """Fused query + ingest against a device-rerank (exact="f16") index:
    ingest writes the shadow buffer in-program, query re-ranks
    in-program, and the split pipeline agrees."""
    from dawnsearch_tpu.index.flat import FlatIndex

    provider = SearchProvider(
        data_dir=None, dim=64, verify_on_load=False,
        index_factory=lambda: FlatIndex(
            dim=64, dtype="i8", exact="f16", max_capacity=1_000_000))
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8, max_wait_ms=20.0)
    svc = SearchService(provider, batcher, instance_id="rr-node")
    try:
        assert svc._fused is not None and svc._fused_ingest is not None
        svc.insert_pages([(f"https://rr/{i}", f"T{i}", t)
                          for i, t in enumerate(CORPUS)])
        ix = provider.index
        assert ix.device_rerank and len(ix) == len(CORPUS)
        # shadow buffer holds the same embeddings the store persisted
        # (the service embeds the combined title+text)
        stored = provider.store.embeddings_for(
            list(range(1, len(CORPUS) + 1)))
        emb = np.stack([stored[i + 1] for i in range(len(CORPUS))])
        shadow = np.asarray(ix._exact[: len(CORPUS)], np.float32)
        np.testing.assert_allclose(shadow, emb, atol=2e-3)
        for q in CORPUS:
            fused = svc.text_search(q, search_remote=False)
            split = svc.embedding_search(batcher.embed(q))
            assert [p.page_id for p in fused.pages] == \
                [p.page_id for p in split.pages]
            ds = [p.distance for p in fused.pages]
            assert ds == sorted(ds)
        res = svc.text_search(CORPUS[1], search_remote=False)
        assert res.pages[0].url == "https://rr/1"
    finally:
        batcher.stop()
        svc.shutdown()


def test_sharded_fused_ingest_fills_to_exact_capacity(encoder):
    """Round-2 advisor (medium): at an aligned max_capacity the fused
    ingest must land rows on shards with room (blend writes; the old
    fallback re-raised the same capacity error and dropped the batch)."""
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
    from dawnsearch_tpu.serving.fused import ShardedFusedIngestPath

    ix = ShardedFlatIndex(mesh=make_mesh({"shard": 8}), dim=64,
                          dtype="i8", capacity_per_shard=8, segment=8,
                          max_capacity=64)
    fp = ShardedFusedIngestPath(encoder, ix)
    fp.ingest([CORPUS[i % 5] + f" f{i}" for i in range(63)])
    assert len(ix) == 63 and int(ix._counts.max()) == 8
    e = fp.ingest([CORPUS[2] + " very last row"])  # fits on the min shard
    assert len(ix) == 64
    d, u = ix.search(e, k=1)
    assert d[0, 0] < 0.05 and u[0, 0] == 63
    uids = np.asarray(ix._ids)
    assert sorted(uids[uids >= 0].tolist()) == list(range(64))
    with pytest.raises(RuntimeError, match="full"):
        fp.ingest([CORPUS[3] + " does not fit"])
