"""ctypes bridge to the C++ extraction + language-filter fast paths.

See dawnsearch_tpu/native/{extract,lang}.cpp and utils/nativelib.py
(shared loader + auto-build). Falls back to the pure-Python
implementations in dawnsearch_tpu.ingest.{extract,lang}, which have
identical semantics (tested).
"""

from __future__ import annotations

import ctypes

from dawnsearch_tpu.ingest.extract import ExtractedDoc
from dawnsearch_tpu.ingest.extract import extract as _py_extract
from dawnsearch_tpu.ingest.lang import is_english as _py_is_english
from dawnsearch_tpu.utils import nativelib

# kept for the Makefile docstring contract / older callers
build = nativelib.build


def available() -> bool:
    return nativelib.get() is not None


def extract(html: str) -> ExtractedDoc:
    """HTML -> ExtractedDoc via C++ when available, Python otherwise."""
    lib = nativelib.get()
    if lib is None:
        return _py_extract(html)
    raw = html.encode("utf-8", errors="ignore")
    # length comes back explicitly: string_at(ptr) would stop at the
    # first NUL byte copied through from the input HTML
    out_len = ctypes.c_long(0)
    ptr = lib.dawn_extract(raw, len(raw), ctypes.byref(out_len))
    try:
        payload = ctypes.string_at(ptr, out_len.value).decode(
            "utf-8", errors="ignore")
    finally:
        lib.dawn_free(ptr)
    title, _, rest = payload.partition("\x1e")
    text, _, links = rest.partition("\x1e")
    return ExtractedDoc(title=title, text=text,
                        links=[l for l in links.split("\n") if l])


def is_english(text: str, min_stopword_ratio: float = 0.12,
               min_latin: float = 0.85) -> bool:
    """English-prose gate via C++ when available, Python otherwise.

    The C++ twin (native/lang.cpp) returns exactly the Python answers
    (tests/test_lang_native.py); it exists because the filter was the
    extraction stage's largest remaining GIL share (~half its Python
    time), and ctypes releases the GIL for the call's duration so the
    pipeline's other stages keep running."""
    lib = nativelib.get()
    if lib is None:
        return _py_is_english(text, min_stopword_ratio, min_latin)
    raw = text.encode("utf-8", errors="ignore")
    return bool(lib.dawn_is_english(raw, len(raw),
                                    min_stopword_ratio, min_latin))
