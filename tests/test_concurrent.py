"""Concurrent ingest + query through SearchService.

Round-3 structural fix for the round-2 soak's p99 3.5 s tail: the
device-state lock is held only while programs are ENQUEUED (dispatch),
so queries interleave with an in-flight ingest batch instead of
stacking behind its execution + readback + store write. These tests
assert the concurrency contract (no errors, no lost rows, consistent
results) on the CPU backend; the latency numbers come from the on-chip
soak (examples/soak_concurrent.py, doc/performance.md).

Reference: the actor split in /root/reference/src/bin/dawnsearch.rs:64-78
(search never blocks behind an insert for the insert's full duration).
"""

import threading

import jax
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


def _run_concurrent(service, provider, n_batches=8, batch=48, n_query=3):
    errors: list[Exception] = []
    results: list[int] = []
    stop = threading.Event()

    def query_loop():
        while not stop.is_set():
            try:
                res = service.text_search(CORPUS[0], k=5,
                                          search_remote=False)
                results.append(len(res.pages))
            except Exception as e:  # pragma: no cover - the assertion
                errors.append(e)
                return

    threads = [threading.Thread(target=query_loop) for _ in range(n_query)]
    for t in threads:
        t.start()
    try:
        for b in range(n_batches):
            pages = [(f"https://x/{b}/{i}", f"t{b}-{i}",
                      CORPUS[(b + i) % 5] + f" filler {b} {i}")
                     for i in range(batch)]
            service.insert_pages(pages)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    assert len(provider.store) == n_batches * batch
    assert len(provider.index) == n_batches * batch
    return results


def test_concurrent_ingest_and_search_flat(encoder):
    provider = SearchProvider(data_dir=None, dim=64, verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8, max_wait_ms=5.0)
    service = SearchService(provider, batcher)
    assert service._fused_ingest is not None  # the path under test
    try:
        results = _run_concurrent(service, provider)
        assert len(results) >= 3  # queries actually ran during ingest
        # post-soak: a fresh query sees every committed page
        res = service.text_search(CORPUS[1], k=5, search_remote=False)
        assert res.pages and res.pages_searched == len(provider.index)
    finally:
        batcher.stop()
        service.shutdown()


def test_concurrent_ingest_and_search_sharded(encoder):
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    mesh = make_mesh({"shard": 8})
    provider = SearchProvider(
        data_dir=None, dim=64, verify_on_load=False,
        index_factory=lambda: ShardedFlatIndex(
            mesh=mesh, dim=64, dtype="i8", capacity_per_shard=64,
            segment=64))
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8, max_wait_ms=5.0)
    service = SearchService(provider, batcher)
    assert service._fused_ingest is not None
    try:
        _run_concurrent(service, provider, n_batches=6, batch=32)
    finally:
        batcher.stop()
        service.shutdown()


def test_ingest_sub_batches_release_lock(encoder):
    """A batch larger than the encoder's top bucket dispatches in
    sub-batches, releasing the device lock between them — a competing
    thread acquires it mid-ingest."""
    provider = SearchProvider(data_dir=None, dim=64, verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8, max_wait_ms=5.0)
    service = SearchService(provider, batcher)
    acquired = []
    stop = threading.Event()

    def prober():
        while not stop.is_set():
            with service._lock:
                acquired.append(len(provider.index))

    t = threading.Thread(target=prober)
    t.start()
    try:
        pages = [(f"https://big/{i}", "t", CORPUS[i % 5] + f" row {i}")
                 for i in range(160)]  # 5x the 32-batch bucket
        service.insert_pages(pages)
    finally:
        stop.set()
        t.join(timeout=10)
        batcher.stop()
        service.shutdown()
    # the prober saw intermediate counts, not just 0 and 160
    mids = {a for a in acquired if 0 < a < 160}
    assert mids, f"lock never released mid-ingest (saw {set(acquired)})"


def test_save_during_concurrent_ingest(encoder, tmp_path):
    """Autosave while donating ingest batches land: the provider's
    ingest_gate mutually excludes the snapshot's reference capture +
    readback from the donating writes that would invalidate the
    captured buffers; queries never wait on the readback (round-3
    review: save stalled every dispatch; the fix must not trade that
    for a use-after-donation crash)."""
    provider = SearchProvider(data_dir=str(tmp_path), dim=64,
                              verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8, max_wait_ms=5.0)
    service = SearchService(provider, batcher)
    errors: list[Exception] = []
    stop = threading.Event()

    def save_loop():
        while not stop.is_set():
            try:
                service.save()
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    t = threading.Thread(target=save_loop)
    t.start()
    try:
        for b in range(6):
            pages = [(f"https://s/{b}/{i}", f"t{b}-{i}",
                      CORPUS[(b + i) % 5] + f" filler {b} {i}")
                     for i in range(48)]
            service.insert_pages(pages)
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, errors
    service.save()
    # the final snapshot reloads to the full committed state
    p2 = SearchProvider(data_dir=str(tmp_path), dim=64,
                        verify_on_load=True)
    assert len(p2.index) == 6 * 48
    batcher.stop()
    service.shutdown()
    p2.shutdown()


def test_save_during_nonfused_ingest_no_deadlock(encoder, tmp_path):
    """Lock order is gate -> device EVERYWHERE: the non-fused insert
    path (f32 index, no fused ingest) once took the device lock first
    and deadlocked against a concurrent autosave holding the gate
    (round-3 review)."""
    provider = SearchProvider(data_dir=str(tmp_path), dim=64,
                              index_dtype="f32", verify_on_load=False)
    batcher = EmbeddingBatcher(encoder.encode, max_batch=8, max_wait_ms=5.0)
    service = SearchService(provider, batcher)
    assert service._fused_ingest is None  # the path under test
    errors: list[Exception] = []
    stop = threading.Event()

    def save_loop():
        while not stop.is_set():
            try:
                service.save()
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    t = threading.Thread(target=save_loop, daemon=True)
    t.start()
    done = threading.Event()

    def ingest():
        try:
            for b in range(4):
                service.insert_pages(
                    [(f"https://nf/{b}/{i}", f"t{b}-{i}",
                      CORPUS[(b + i) % 5] + f" filler {b} {i}")
                     for i in range(32)])
            done.set()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    it = threading.Thread(target=ingest, daemon=True)
    it.start()
    assert done.wait(timeout=120), "ingest deadlocked against autosave"
    stop.set()
    t.join(timeout=30)
    it.join(timeout=30)
    assert not errors, errors
    assert len(provider.index) == 4 * 32
    batcher.stop()
    service.shutdown()
