"""SentenceEncoder facade: bucketing, ordering, determinism."""

import jax
import numpy as np
import pytest

from dawnsearch_tpu.models import weights as W
from dawnsearch_tpu.models.bert import BertConfig
from dawnsearch_tpu.models.encoder import SentenceEncoder
from dawnsearch_tpu.models.tokenizer import WordPieceTokenizer, build_vocab_from_corpus

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "semantic search engine for the distributed web",
    "common crawl pages are indexed with vector embeddings",
    "hello world this is a test sentence",
]


@pytest.fixture(scope="module")
def encoder():
    vocab = build_vocab_from_corpus(CORPUS, size=500)
    tok = WordPieceTokenizer(vocab)
    cfg = BertConfig(vocab_size=len(vocab), num_layers=2,
                     max_position_embeddings=64)
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    return SentenceEncoder(params, tok, cfg, seq_buckets=(8, 16, 32),
                           batch_buckets=(1, 2, 4, 8))


def test_encode_shapes_and_norm(encoder):
    vecs = encoder.encode(CORPUS)
    assert vecs.shape == (4, 384)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-5)


def test_order_preserved_across_length_sort(encoder):
    texts = ["a", "the quick brown fox jumps over the lazy dog " * 3, "hello world"]
    batch = encoder.encode(texts)
    singles = np.stack([encoder.encode([t])[0] for t in texts])
    # Bucketing may alter seq padding; same bucket => identical results.
    cos = (batch * singles).sum(-1)
    assert np.all(cos > 0.99), cos


def test_deterministic(encoder):
    a = encoder.encode(CORPUS[:2])
    b = encoder.encode(CORPUS[:2])
    np.testing.assert_array_equal(a, b)


def test_empty(encoder):
    assert encoder.encode([]).shape == (0, 384)


def test_oversized_batch_chunks(encoder):
    texts = CORPUS * 5  # 20 texts > max batch bucket 8
    vecs = encoder.encode(texts)
    assert vecs.shape == (20, 384)
    np.testing.assert_allclose(vecs[:4], vecs[4:8], atol=1e-6)
