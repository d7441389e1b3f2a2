"""C++ byte-level BPE (native/bpe.cpp) parity vs the pure-Python twin.

The Python ByteLevelBPETokenizer is itself verified against HF
RobertaTokenizer (test_bpe_tokenizer.py), so exact agreement with it —
across pre-tokenizer alternation paths, regex-module class edges,
merge order, truncation, and the batch interface — transitively pins
the native path to the HF oracle. Includes a deterministic fuzz sweep
over mixed-script random strings: the pre-tokenizer's \\p{L}/\\p{N}/\\s
tables were generated from the `regex` module (which differs from
unicodedata on 9,568 codepoints), and the fuzz is what would catch a
stale or mis-generated table.
"""

import random

import pytest

from dawnsearch_tpu.models import tokenizer_bpe_native as nat
from dawnsearch_tpu.models.tokenizer_bpe import (ByteLevelBPETokenizer,
                                                 train_bpe)

if not nat.native_available():
    pytest.skip("libdawn_native.so unavailable", allow_module_level=True)

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "don't can't won't it's we've they'll I'm you'd",
    "numbers 123 4567 89 and punctuation!? (brackets) [more] {still}",
    "accented café naïve résumé über señor garçon",
    "unicode snowman ☃ and emoji 🚀 survive byte-mapping",
    "the the the of of and and to in is was for on are as with his",
]

# every pre-tokenizer alternation path + class-table edges
TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "don't stop me NOW! it's we're you've I'll he'd 'sand",
    "'s 't 're 've 'm 'll 'd",          # bare contraction suffixes
    "'S 'T 'RE",                         # case-sensitive: must NOT match
    "  leading", "trailing  ", "   ", " ", "", "\n", "\t\t",
    "a  b   c    d",                     # \s+(?!\S) backoff shapes
    "\n\nword", "tabs\tand\nnewlines\r\nmixed",
    "a b  wide 　ideographic",  # non-ASCII \s
    "café ☃ 🚀 naïve 東京 مرحبا мир हिन्दी",
    "½⅓ superscript² circled①",          # \p{N} beyond ASCII digits
    "ʰᵃ ᵇᶜ modifier letters",            # \p{L} beyond alphabetics
    "1234 56.78 9,000 1'2'3",
    "price $5.99! …ellipsis… \"quote\"",
    "x" * 500,                           # long single pre-token
    ("word " * 300).strip(),             # early-stop path
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tok = train_bpe(CORPUS, size=600)
    d = tmp_path_factory.mktemp("bpe_native")
    vocab_path, merges_path = tok.save(str(d))
    native = nat.NativeByteLevelBPETokenizer.from_files(
        vocab_path, merges_path)
    return tok, native


@pytest.mark.parametrize("i", range(len(TEXTS)))
def test_encode_matches_python(pair, i):
    py, cc = pair
    text = TEXTS[i]
    assert cc.encode(text, max_len=512) == py.encode(text, max_len=512)


def test_specials_match(pair):
    py, cc = pair
    assert (cc.pad_id, cc.unk_id, cc.cls_id, cc.sep_id) == \
        (py.pad_id, py.unk_id, py.cls_id, py.sep_id)


@pytest.mark.parametrize("max_len", [0, 1, 2, 3, 8, 16, 128])
def test_truncation_matches_python(pair, max_len):
    py, cc = pair
    text = "the quick brown fox jumps over the lazy dog " * 10
    assert cc.encode(text, max_len=max_len) == py.encode(text, max_len=max_len)


def test_encode_batch_matches_python(pair):
    py, cc = pair
    a_ids, a_mask = py.encode_batch(TEXTS, 64)
    b_ids, b_mask = cc.encode_batch(TEXTS, 64)
    assert a_ids == b_ids and a_mask == b_mask


def test_fuzz_mixed_scripts(pair):
    py, cc = pair
    rng = random.Random(0)
    pools = [
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "0123456789½²①",
        " \t\n\r  　",
        "!?.,;:'\"-_()[]{}$%&…",
        "éüñßçàø東京中文камніهل🚀☃",
    ]
    for _ in range(200):
        n = rng.randrange(0, 40)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        assert cc.encode(s, max_len=128) == py.encode(s, max_len=128), repr(s)


def test_fuzz_random_codepoints(pair):
    """Arbitrary (valid, non-surrogate) codepoints — exercises the full
    RLE class table, not just the curated pools."""
    py, cc = pair
    rng = random.Random(1)
    for _ in range(200):
        n = rng.randrange(0, 24)
        chars = []
        while len(chars) < n:
            cp = rng.randrange(1, 0x110000)
            if 0xD800 <= cp <= 0xDFFF:
                continue
            chars.append(chr(cp))
        s = "".join(chars)
        assert cc.encode(s, max_len=128) == py.encode(s, max_len=128), repr(s)


def test_best_bpe_tokenizer_prefers_native(pair, tmp_path):
    py, _ = pair
    vocab_path, merges_path = py.save(str(tmp_path))
    tok = nat.best_bpe_tokenizer(vocab_path, merges_path)
    assert isinstance(tok, nat.NativeByteLevelBPETokenizer)
    assert tok.encode("a quick test", max_len=32) == \
        py.encode("a quick test", max_len=32)


def test_surrogate_input_is_ignored_not_fatal(pair):
    """CPython str can hold unpaired surrogates; the Python twin's
    str.encode would raise, the native wrapper drops them (documented
    deliberate robustness departure)."""
    _, cc = pair
    with_sur = "abc" + "\ud800" + "def"
    assert cc.encode(with_sur, max_len=32) == cc.encode("abcdef", max_len=32)
