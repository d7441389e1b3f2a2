"""Native WordPiece tokenizer: C++ hot loop with Python-identical output.

Wraps dawnsearch_tpu/native/tokenizer.cpp (see that file and
gen_unicode_tables.py — the Unicode behavior is generated from Python's
unicodedata, so outputs match the pure-Python WordPieceTokenizer
exactly; tested across scripts/punctuation/accents). Tokenization is
the host-side ingest bottleneck: ~300 texts/s in Python vs ~15k+/s here.
"""

from __future__ import annotations

import ctypes

import numpy as np

from dawnsearch_tpu.models.tokenizer import (PAD, UNK, CLS, SEP,
                                             WordPieceTokenizer, special_id)
from dawnsearch_tpu.utils import nativelib


def native_available() -> bool:
    return nativelib.get() is not None


class NativeWordPieceTokenizer:
    """Drop-in for WordPieceTokenizer (same encode() contract)."""

    MAX_IDS = 8192  # scratch bound; callers always pass max_len anyway

    def __init__(self, vocab: dict[str, int], lowercase: bool = True):
        if not lowercase:
            raise ValueError("native tokenizer is lowercase-only (BERT "
                             "uncased family); use WordPieceTokenizer")
        lib = nativelib.get()
        if lib is None:
            raise RuntimeError("libdawn_native.so unavailable")
        self._lib = lib
        self.vocab = vocab
        inv = {i: t for t, i in vocab.items()}
        blob = "\n".join(inv.get(i, f"[unused{i}]")
                         for i in range(max(vocab.values()) + 1))
        data = blob.encode("utf-8")
        self._handle = lib.dawn_tok_new(data, len(data))
        # alias-aware (MPNet vocabs name these <pad>/<unk>/<s>/</s>;
        # the C++ side resolves the same aliases, tokenizer.cpp)
        self.pad_id = special_id(vocab, PAD)
        self.unk_id = special_id(vocab, UNK)
        self.cls_id = special_id(vocab, CLS)
        self.sep_id = special_id(vocab, SEP)

    @classmethod
    def from_vocab_file(cls, path: str, lowercase: bool = True
                        ) -> "NativeWordPieceTokenizer":
        vocab: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\r\n")] = i
        return cls(vocab, lowercase=lowercase)

    def encode(self, text: str, max_len: int | None = None) -> list[int]:
        cap = min(max_len or self.MAX_IDS, self.MAX_IDS)
        out = (ctypes.c_int32 * cap)()
        raw = text.encode("utf-8", errors="ignore")
        n = self._lib.dawn_tok_encode(self._handle, raw, len(raw), cap, out)
        return list(out[:n])

    def encode_batch(self, texts: list[str], seq_len: int
                     ) -> tuple[list[list[int]], list[list[int]]]:
        ids_batch, mask_batch = [], []
        for t in texts:
            ids = self.encode(t, max_len=seq_len)
            mask = [1] * len(ids) + [0] * (seq_len - len(ids))
            ids_batch.append(ids + [self.pad_id] * (seq_len - len(ids)))
            mask_batch.append(mask)
        return ids_batch, mask_batch

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.dawn_tok_free(handle)


def best_tokenizer(vocab: dict[str, int], lowercase: bool = True):
    """Native when the library is loadable, Python otherwise."""
    if lowercase and native_available():
        return NativeWordPieceTokenizer(vocab, lowercase=lowercase)
    return WordPieceTokenizer(vocab, lowercase=lowercase)
