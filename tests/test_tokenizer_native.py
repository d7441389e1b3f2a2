"""Native tokenizer: exact output parity with the Python WordPiece."""

import random

import pytest

from dawnsearch_tpu.models.tokenizer import (
    WordPieceTokenizer, build_vocab_from_corpus)
from dawnsearch_tpu.models import tokenizer_native as tn

pytestmark = pytest.mark.skipif(not tn.native_available(),
                                reason="libdawn_native.so not built")

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "running runner runs unbelievable transformations",
    "lighthouse keeper storms seaside DawnSearch quantization",
    "hello world! it's a test... with punctuation, right?",
    "numbers 123 456.78 and emails like a@b.com",
]

TRICKY = [
    "",
    "   ",
    "Hello, World!",
    "it's-a-test_case (with) [brackets] {and} <tags>",
    "CAFÉ naïve résumé Zürich façade",            # accents -> stripped
    "ÀÁÂÃÄÅ àáâãäå ÈÉÊË",                          # Latin-1 case+accents
    "ΣΙΓΜΑ σίγμα ΠΡΟΣ",                            # Greek case fold
    "МОСКВА москва Привет",                        # Cyrillic
    "日本語のテキスト and english mixed 中文",      # CJK isolation
    "tabs\tand\nnewlines\r\neverywhere",
    "zero​width‍joiners",                # Cf controls stripped
    "em—dash – and … ellipsis “smart quotes”",     # GP punctuation block
    "emoji 🚀 stays 🎉 put",
    "a" * 150,                                     # > MAX_WORD_CHARS -> UNK
    "�replacement\x00null",
    "mixed123alpha456num",
]


@pytest.fixture(scope="module")
def pair():
    vocab = build_vocab_from_corpus(CORPUS + TRICKY, size=8000)
    return WordPieceTokenizer(vocab), tn.NativeWordPieceTokenizer(vocab)


@pytest.mark.parametrize("text", CORPUS + TRICKY)
def test_encode_parity(pair, text):
    py, nat = pair
    assert nat.encode(text) == py.encode(text), text


@pytest.mark.parametrize("max_len", [4, 8, 16, 64])
def test_truncation_parity(pair, max_len):
    py, nat = pair
    text = " ".join(CORPUS) * 3
    assert nat.encode(text, max_len=max_len) == py.encode(text, max_len=max_len)


def test_fuzz_parity(pair):
    py, nat = pair
    rng = random.Random(0)
    alphabet = ("abcdefghij .,!?-'\"0123456789"
                "éüñ中日¡«—​\tZQ")
    for _ in range(200):
        n = rng.randrange(0, 80)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert nat.encode(text, max_len=32) == py.encode(text, max_len=32), \
            repr(text)


def test_encode_batch_parity(pair):
    py, nat = pair
    ids_p, mask_p = py.encode_batch(CORPUS, seq_len=24)
    ids_n, mask_n = nat.encode_batch(CORPUS, seq_len=24)
    assert ids_p == ids_n and mask_p == mask_n


def test_best_tokenizer_prefers_native():
    vocab = build_vocab_from_corpus(CORPUS, size=4000)
    tok = tn.best_tokenizer(vocab)
    assert isinstance(tok, tn.NativeWordPieceTokenizer)
