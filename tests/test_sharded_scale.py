"""Sharded-tier scale soak (round-2 VERDICT item 4): an 8-shard
DawnNode ingests 100k+ rows through the SHARDED FUSED ingest program
while queries run concurrently, then snapshots, reloads (same and
different shard counts), and must keep counts, ids, and recall.

This is the configuration the multi-chip scale story rests on — the
round-2 sharded tests topped out at toy sizes (weak #7). Runs on the
8-device virtual CPU mesh with a small real SentenceEncoder (the
HashEncoder shortcut would bypass the fused ingest path entirely).
"""

import threading

import jax
import numpy as np
import pytest

from dawnsearch_tpu.config import Config
from dawnsearch_tpu.models.bert import BertConfig
from dawnsearch_tpu.models.encoder import SentenceEncoder
from dawnsearch_tpu.models.tokenizer import (
    WordPieceTokenizer, build_vocab_from_corpus)
from dawnsearch_tpu.models.weights import init_params
from dawnsearch_tpu.node import DawnNode
from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
from dawnsearch_tpu.serving.fused import ShardedFusedIngestPath
from tests.test_node import make_cfg

N_ROWS = 100_000
TOPICS = ["lighthouse storm coast", "quantum tensor hardware",
          "sourdough bread kitchen", "railway mountain schedule",
          "deep sea creature dive", "desert cactus bloom",
          "violin concert hall", "glacier ice melt"]
DIGITS = "zero one two three four five six seven eight nine".split()


def spell(i: int) -> str:
    """Row number as digit words — raw digits aren't in the test vocab
    and would all tokenize to [UNK], making same-topic rows
    indistinguishable."""
    return " ".join(DIGITS[int(c)] for c in str(i))


@pytest.fixture(scope="module")
def encoder():
    corpus = TOPICS + ["page body text row index shard",
                       " ".join(DIGITS)]
    vocab = build_vocab_from_corpus(corpus, size=2048)
    # XLA impls: the Pallas kernels run in interpret mode on CPU and
    # would make the 100k encode the test's bottleneck; the subject
    # here is the sharded fused-ingest/search structure, not the
    # kernels (covered by test_pallas_kernels at small sizes)
    cfg = BertConfig(vocab_size=2048, hidden_size=64, num_layers=2,
                     num_heads=4, intermediate_size=128,
                     max_position_embeddings=32, layer_impl="ops",
                     attn_impl="xla", ffn_impl="xla")
    params = init_params(jax.random.key(0), cfg)
    # one big batch bucket: bulk-ingest shape, minimal dispatch count
    return SentenceEncoder(params, WordPieceTokenizer(vocab), cfg=cfg,
                           seq_buckets=(16,), batch_buckets=(2048,))


def page(i: int) -> dict:
    t = TOPICS[i % len(TOPICS)]
    return {"url": f"https://scale.example/{i}",
            "title": f"{t} {spell(i)}", "text": f"row {spell(i)} about {t}"}


def query_text(i: int) -> str:
    p = page(i)
    return f"{p['title']}\n{p['text']}"


def test_sharded_scale_soak_and_reload(tmp_path, encoder):
    cfg = make_cfg(tmp_path, index_kind="sharded", mesh_shards=0,
                   index_capacity=2 * N_ROWS)
    errors: list[Exception] = []
    stop = threading.Event()

    with DawnNode(cfg, encoder=encoder) as node:
        ix = node.provider.index
        assert type(ix) is ShardedFlatIndex and ix.n_shards == 8
        assert isinstance(node.service._fused_ingest,
                          ShardedFusedIngestPath)

        def query_loop():
            i = 0
            while not stop.is_set():
                try:
                    res = node.service.text_search(
                        query_text(i % 1000), k=3, search_remote=False)
                    assert res is not None
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                    return
                i += 37
        qt = threading.Thread(target=query_loop)
        qt.start()
        try:
            B = 2048
            for s in range(0, N_ROWS, B):
                pages = [(p["url"], p["title"], p["text"])
                         for p in map(page, range(s, min(s + B, N_ROWS)))]
                node.service.insert_pages(pages)
        finally:
            stop.set()
            qt.join(timeout=60)
        assert not errors, errors
        assert len(node.provider.store) == N_ROWS
        assert len(ix) == N_ROWS
        # shards stay balanced under striped fused ingest
        counts = ix._counts
        assert counts.max() - counts.min() <= 1, counts
        # every row's uid landed exactly once
        uids = np.asarray(ix._ids)
        valid = uids[uids >= 0]
        assert valid.size == N_ROWS
        assert np.unique(valid).size == N_ROWS
        # recall through the product surface at full scale
        probes = list(range(0, N_ROWS, N_ROWS // 50))
        hits = 0
        for i in probes:
            res = node.service.text_search(query_text(i), k=3,
                                           search_remote=False)
            hits += any(p.url == page(i)["url"] for p in res.pages)
        assert hits / len(probes) >= 0.9, hits

    # reload, same shard count: snapshot path, counts + recall intact
    with DawnNode(cfg, encoder=encoder) as node2:
        ix2 = node2.provider.index
        assert type(ix2) is ShardedFlatIndex and ix2.n_shards == 8
        assert len(ix2) == N_ROWS
        assert ix2.max_capacity == 2 * N_ROWS  # config survives reload
        res = node2.service.text_search(query_text(123), k=3,
                                        search_remote=False)
        assert any(p.url == page(123)["url"] for p in res.pages)
        # near-cap semantics still work post-reload: inserts keep flowing
        node2.service.insert_pages(
            [(f"https://post.example/{i}", "post title", f"post row {i}")
             for i in range(100)])
        assert len(node2.provider.store) == N_ROWS + 100

    # reload on a DIFFERENT shard count (4): rows re-stripe, mapping holds
    cfg4 = make_cfg(tmp_path, index_kind="sharded", mesh_shards=4,
                    index_capacity=2 * N_ROWS)
    with DawnNode(cfg4, encoder=encoder) as node3:
        ix3 = node3.provider.index
        assert ix3.n_shards == 4
        assert len(ix3) == N_ROWS + 100
        res = node3.service.text_search(query_text(4567), k=3,
                                        search_remote=False)
        assert any(p.url == page(4567)["url"] for p in res.pages)
