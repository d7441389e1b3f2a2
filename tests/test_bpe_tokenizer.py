"""Byte-level BPE tokenizer parity vs HF RobertaTokenizer (the oracle).

The RoBERTa sentence-encoder family ships vocab.json + merges.txt, not
WordPiece's vocab.txt (models/tokenizer_bpe.py). Zero egress means no
real vocab files — so the module's own trainer builds one from a
corpus, saves it in the HF file layout, and BOTH implementations load
the same files: any divergence (pre-tokenization, byte mapping, merge
order, specials, truncation) shows up as a token-id mismatch.
"""

import pytest

transformers = pytest.importorskip("transformers")

from dawnsearch_tpu.models.tokenizer_bpe import (  # noqa: E402
    ByteLevelBPETokenizer, byte_to_unicode, train_bpe, unicode_to_byte)

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "A distributed semantic web search engine, built TPU-first.",
    "Common Crawl WARC files stream pages; filters keep English text.",
    "the the the of of and and to in is was for on are as with his",
    "lighthouse keeper storms the winding stairs every morning",
    "don't can't won't it's we've they'll I'm you'd",
    "numbers 123 4567 89 and punctuation!? (brackets) [more] {still}",
    "mixed CaseWords and UPPERCASE and lowercase tokens appear here",
    "accented café naïve résumé über señor garçon",
    "unicode snowman ☃ and emoji 🚀 survive byte-mapping",
]

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "a lighthouse keeper storms the stairs",
    "don't stop me now!",
    "  leading and trailing spaces  ",
    "tabs\tand\nnewlines\r\nmixed",
    "café ☃ 🚀 naïve",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "1234 56.78 9,000",
    "",
    "x",
    "словарь 中文 परीक्षण",  # out-of-corpus scripts ride the byte alphabet
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tok = train_bpe(CORPUS, size=600)
    d = tmp_path_factory.mktemp("bpe")
    vocab_path, merges_path = tok.save(str(d))
    return tok, vocab_path, merges_path


@pytest.fixture(scope="module")
def hf_tok(trained):
    _, vocab_path, merges_path = trained
    return transformers.RobertaTokenizer(vocab_file=vocab_path,
                                         merges_file=merges_path)


def test_byte_table_is_a_bijection():
    b2u = byte_to_unicode()
    assert sorted(b2u) == list(range(256))
    assert len(set(b2u.values())) == 256
    u2b = unicode_to_byte()
    assert all(u2b[c] == b for b, c in b2u.items())
    # printable latin-1 maps to itself; controls land above U+00FF
    assert b2u[ord("a")] == "a" and ord(b2u[0]) >= 256 and ord(b2u[32]) >= 256


def test_specials_resolve(trained):
    tok, _, _ = trained
    assert (tok.cls_id, tok.pad_id, tok.sep_id, tok.unk_id) == (0, 1, 2, 3)


@pytest.mark.parametrize("i", range(len(TEXTS)))
def test_encode_matches_hf(trained, hf_tok, i):
    tok, _, _ = trained
    text = TEXTS[i]
    assert tok.encode(text) == hf_tok(text)["input_ids"]


def test_corpus_lines_match_hf(trained, hf_tok):
    tok, _, _ = trained
    for text in CORPUS:
        assert tok.encode(text) == hf_tok(text)["input_ids"]


def test_truncation_matches_hf(trained, hf_tok):
    tok, _, _ = trained
    text = TEXTS[0] + " " + TEXTS[6]
    for max_len in (4, 8, 16):
        ours = tok.encode(text, max_len=max_len)
        theirs = hf_tok(text, truncation=True,
                        max_length=max_len)["input_ids"]
        assert ours == theirs and len(ours) <= max_len


def test_decode_round_trip(trained):
    tok, _, _ = trained
    for text in TEXTS:
        assert tok.decode(tok.encode(text)) == text


def test_encode_batch_shapes(trained):
    tok, _, _ = trained
    ids, mask = tok.encode_batch(["hello world", "a"], seq_len=16)
    assert all(len(r) == 16 for r in ids + mask)
    assert ids[0][0] == tok.cls_id and tok.sep_id in ids[0]
    n = sum(mask[1])
    assert ids[1][n - 1] == tok.sep_id
    assert all(t == tok.pad_id for t in ids[1][n:])


def test_file_round_trip(trained):
    tok, vocab_path, merges_path = trained
    tok2 = ByteLevelBPETokenizer.from_files(vocab_path, merges_path)
    for text in TEXTS:
        assert tok2.encode(text) == tok.encode(text)


def test_hash_merges_survive_file_round_trip(tmp_path):
    """Real GPT-2/RoBERTa merges.txt contains merges whose tokens start
    with '#' ("# #", "## ##"); only the FIRST "#version" header line is
    a comment. A blanket '#' skip in from_files silently drops those
    merges and tokenization diverges from the checkpoint (regression:
    round-3 review finding)."""
    corpus = CORPUS + ["#### heading ## subheading #### more ## hashes",
                       "#### #### ## ## # # ###"] * 3
    tok = train_bpe(corpus, size=600)
    assert any(a.lstrip("Ġ").startswith("#") for a, _ in tok.ranks), \
        "corpus failed to induce a '#' merge — test needs a denser corpus"
    vp, mp = tok.save(str(tmp_path))
    loaded = ByteLevelBPETokenizer.from_files(vp, mp)
    assert loaded.ranks == tok.ranks  # NO merges dropped on reload
    hf = transformers.RobertaTokenizer(vocab_file=vp, merges_file=mp)
    for text in ["#### header", "## x ## y ####", "# lone hash", "a#b"]:
        assert loaded.encode(text) == hf.encode(text), text


def test_merges_file_tolerance(trained, tmp_path):
    """from_files matches the FAST tokenizer's parsing (the reference's
    `tokenizers` crate): "#version" headers are skipped wherever they
    appear, stray/duplicate whitespace is tolerated (byte-level tokens
    never contain a literal space), and a malformed line raises with
    its line number rather than a bare unpack error (round-3 advisor
    finding)."""
    tok, vocab_path, merges_path = trained
    lines = open(merges_path, encoding="utf-8").read().splitlines()
    assert lines[0].startswith("#version")

    # trailing + duplicated spaces, blank lines, a stray mid-file header
    messy = tmp_path / "messy_merges.txt"
    body = [lines[1] + " ", "", *lines[2:5], "#version: 0.2",
            *("  ".join(ln.split()) for ln in lines[5:])]
    messy.write_text("\n".join([lines[0], *body]) + "\n", encoding="utf-8")
    loaded = ByteLevelBPETokenizer.from_files(vocab_path, str(messy))
    assert loaded.ranks == tok.ranks
    for text in TEXTS:
        assert loaded.encode(text) == tok.encode(text)

    bad = tmp_path / "bad_merges.txt"
    bad.write_text("#version: 0.2\na b c\n", encoding="utf-8")
    with pytest.raises(ValueError, match="bad_merges.txt:2"):
        ByteLevelBPETokenizer.from_files(vocab_path, str(bad))


def test_merges_actually_merge(trained):
    """The trainer must learn multi-char tokens for corpus-frequent
    words (otherwise the 'trained' vocab is just the byte alphabet)."""
    tok, _, _ = trained
    assert len(tok.ranks) > 50
    pieces = tok.tokenize("the quick brown fox")
    assert len(pieces) < len("the quick brown fox")  # fewer than chars
