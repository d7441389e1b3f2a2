"""Single loader for libdawn_native.so (C++ runtime tier).

One shared object holds every native piece (HTML extraction, WordPiece
tokenization); this module owns the build-on-demand + load-once logic
so callers just ask for the handle and fall back to Python when absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

from dawnsearch_tpu.utils.logging import service_logger

log = service_logger("Native")

DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "native")
SO = os.path.join(DIR, "libdawn_native.so")

_lib: ctypes.CDLL | None = None
_tried = False
_lock = threading.Lock()


def build() -> bool:
    """Compile in-tree via the Makefile. Returns success."""
    try:
        subprocess.run(["make", "-C", DIR], check=True,
                       capture_output=True, timeout=180)
        return True
    except Exception as e:
        log.warning("native build failed (%s); Python fallbacks in use", e)
        return False


def _stale() -> bool:
    """True when any C++ source/header/Makefile is newer than the .so —
    a stale prebuilt library can carry an OLD ABI (e.g. the 2-arg
    dawn_extract) and silently misbehave through ctypes rather than
    fail to load."""
    try:
        so_mtime = os.path.getmtime(SO)
    except OSError:
        return True
    for f in os.listdir(DIR):
        if f.endswith((".cpp", ".h", ".py")) or f == "Makefile":
            if os.path.getmtime(os.path.join(DIR, f)) > so_mtime:
                return True
    return False


def get() -> ctypes.CDLL | None:
    """-> loaded library with typed symbols, or None."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if (not os.path.exists(SO) or _stale()) and not build():
            return None
        try:
            lib = ctypes.CDLL(SO)
            # extraction (extract.cpp)
            lib.dawn_extract.restype = ctypes.c_void_p
            lib.dawn_extract.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long)]
            lib.dawn_free.argtypes = [ctypes.c_void_p]
            # tokenizer (tokenizer.cpp)
            lib.dawn_tok_new.restype = ctypes.c_void_p
            lib.dawn_tok_new.argtypes = [ctypes.c_char_p, ctypes.c_long]
            lib.dawn_tok_encode.restype = ctypes.c_long
            lib.dawn_tok_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
                ctypes.c_long, ctypes.POINTER(ctypes.c_int32)]
            lib.dawn_tok_free.argtypes = [ctypes.c_void_p]
            # byte-level BPE tokenizer (bpe.cpp)
            lib.dawn_bpe_new.restype = ctypes.c_void_p
            lib.dawn_bpe_new.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.c_char_p, ctypes.c_long,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
            lib.dawn_bpe_encode.restype = ctypes.c_long
            lib.dawn_bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
                ctypes.c_long, ctypes.POINTER(ctypes.c_int32)]
            lib.dawn_bpe_free.argtypes = [ctypes.c_void_p]
            # language filter (lang.cpp)
            lib.dawn_is_english.restype = ctypes.c_int
            lib.dawn_is_english.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.c_double, ctypes.c_double]
            lib.dawn_english_score.restype = ctypes.c_double
            lib.dawn_english_score.argtypes = [
                ctypes.c_char_p, ctypes.c_long]
            lib.dawn_latin_ratio.restype = ctypes.c_double
            lib.dawn_latin_ratio.argtypes = [
                ctypes.c_char_p, ctypes.c_long]
            # WARC record parser (warc.cpp)
            lib.dawn_warc_new.restype = ctypes.c_void_p
            lib.dawn_warc_new.argtypes = []
            lib.dawn_warc_feed.restype = ctypes.c_long
            lib.dawn_warc_feed.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
            lib.dawn_warc_eof.argtypes = [ctypes.c_void_p]
            lib.dawn_warc_take.restype = ctypes.c_long
            lib.dawn_warc_take.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.c_long]
            lib.dawn_warc_free.argtypes = [ctypes.c_void_p]
            _lib = lib
            log.info("native library loaded (%s)", SO)
        except OSError as e:
            log.warning("failed to load %s: %s", SO, e)
        return _lib
