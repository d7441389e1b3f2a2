"""ctypes bridge to the C++ extraction fast path, with auto-build.

The reference links native code for its hot paths (USearch C++ via FFI,
SQLite; SURVEY.md §2.2); our ingestion hot loop gets the same
treatment: `native/extract.cpp` compiled to libdawn_native.so. Loading
order: existing .so -> build via make (toolchain present) -> pure-Python
fallback (dawnsearch_tpu.ingest.extract) with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

from dawnsearch_tpu.ingest.extract import ExtractedDoc
from dawnsearch_tpu.ingest.extract import extract as _py_extract
from dawnsearch_tpu.utils.logging import service_logger

log = service_logger("Native")

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libdawn_native.so")

_lib = None
_tried = False
_lock = threading.Lock()


def build() -> bool:
    """Compile the native library in-tree. Returns success."""
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.warning("native build failed (%s); using Python extraction", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            if not build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.dawn_extract.restype = ctypes.c_void_p
            lib.dawn_extract.argtypes = [ctypes.c_char_p, ctypes.c_long]
            lib.dawn_free.argtypes = [ctypes.c_void_p]
            _lib = lib
            log.info("native extraction loaded (%s)", _SO)
        except OSError as e:
            log.warning("failed to load %s: %s", _SO, e)
        return _lib


def available() -> bool:
    return _load() is not None


def extract(html: str) -> ExtractedDoc:
    """HTML -> ExtractedDoc via C++ when available, Python otherwise."""
    lib = _load()
    if lib is None:
        return _py_extract(html)
    raw = html.encode("utf-8", errors="ignore")
    ptr = lib.dawn_extract(raw, len(raw))
    try:
        payload = ctypes.string_at(ptr).decode("utf-8", errors="ignore")
    finally:
        lib.dawn_free(ptr)
    title, _, rest = payload.partition("\x1e")
    text, _, links = rest.partition("\x1e")
    return ExtractedDoc(title=title, text=text,
                        links=[l for l in links.split("\n") if l])
