"""ctypes bridge to the C++ extraction fast path.

See dawnsearch_tpu/native/extract.cpp and utils/nativelib.py (shared
loader + auto-build). Falls back to the pure-Python implementation in
dawnsearch_tpu.ingest.extract, which has identical semantics (tested).
"""

from __future__ import annotations

import ctypes

from dawnsearch_tpu.ingest.extract import ExtractedDoc
from dawnsearch_tpu.ingest.extract import extract as _py_extract
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
