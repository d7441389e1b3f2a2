"""WordPiece tokenizer parity vs HF BertTokenizerFast on the same vocab."""

import numpy as np
import pytest

from dawnsearch_tpu.models import tokenizer as T

VOCAB_WORDS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "un", "##aff", "##able", "runn", "##er",
    "hello", "world", "search", "eng", "##ine", ",", ".", "!", "?", "'",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "##a", "##b", "##c", "##d", "##e", "##f", "##g", "##h", "##i",
    "##j", "##k", "##l", "##m", "##n", "##o", "##p", "##q", "##r",
    "##s2", "##t", "##u", "##v", "##w", "##x", "##y", "##z", "2023",
]

SAMPLES = [
    "The quick brown fox jumps over the lazy dog!",
    "Hello, World. unaffable runner",
    "search engine searching 2023",
    "Ünïcödé ACCENTS and   spaces\t\n",
    "CJK: 你好 world",
    "",
    "x" * 150,  # longer than max word chars -> [UNK]
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB_WORDS) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return T.WordPieceTokenizer.from_vocab_file(vocab_file)


@pytest.fixture(scope="module")
def hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    return transformers.BertTokenizerFast(
        vocab_file=vocab_file, do_lower_case=True)


@pytest.mark.parametrize("text", SAMPLES)
def test_tokens_match_hf(ours, hf, text):
    assert ours.tokenize(text) == hf.tokenize(text)


@pytest.mark.parametrize("text", SAMPLES)
def test_ids_match_hf(ours, hf, text):
    assert ours.encode(text) == hf(text)["input_ids"]


def test_truncation(ours):
    ids = ours.encode("the quick brown fox " * 50, max_len=16)
    assert len(ids) == 16
    assert ids[0] == ours.cls_id and ids[-1] == ours.sep_id


def test_encode_batch_shapes(ours):
    ids, mask = ours.encode_batch(["the fox", "hello world the dog runs"], 12)
    a = np.array(ids)
    m = np.array(mask)
    assert a.shape == (2, 12) and m.shape == (2, 12)
    assert (a[m == 0] == ours.pad_id).all()
    assert (np.diff(m, axis=1) <= 0).all()  # mask is a prefix


def test_build_vocab_roundtrip(tmp_path):
    corpus = ["the quick brown fox", "hello world hello search"]
    vocab = T.build_vocab_from_corpus(corpus, size=200)
    tok = T.WordPieceTokenizer(vocab)
    toks = tok.tokenize("hello fox searching")
    assert "hello" in toks and "fox" in toks
    # char fallback: "searches" isn't a corpus word but its chars all are
    assert tok.unk_id not in tok.encode("hello fox searches")
    path = tmp_path / "v.txt"
    tok.save_vocab(str(path))
    tok2 = T.WordPieceTokenizer.from_vocab_file(str(path))
    assert tok2.vocab == tok.vocab
