"""Quantization: i8 storage (device), i24/i8 wire codecs, i16 (host).

Rebuild of the reference's scalar quantizers (/root/reference/src/search/vector.rs):
- i24 wire format (vector.rs:48-87): 3 bytes/dim little-endian, value
  mapped [-1,1] -> [0, 0x7FFFFF]; 1152 B for a 384-d embedding. Kept
  *wire-compatible* so a rebuilt node could interoperate with reference
  peers. (The reference's sign-extension branch at vector.rs:64-66 is
  dead code: encoded values are always non-negative.)
- i16 (vector.rs:30-46): round(x * 32767).
- i8 is the *storage* quantizer for the TPU index (the memory-parity
  story vs USearch's quantized modes, per BASELINE.json): symmetric
  per-vector scale, int8 codes on device, f32 scale per row. Scoring
  happens as int8 matmul with f32 accumulation + scale correction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dawnsearch_tpu.ops.vector import EM_LEN, MAX_VECTOR_DELTA

I24_MAX = 0x7FFFFF


# ---------------------------------------------------------------------------
# i8 wire codec (dawn wire format option): 1 byte/dim + f32 scale.
# The reference's i24 wire spends 3 B/dim on precision a 384-d cosine
# ranking cannot use (i8 query perturbation is ~4e-5 in cosine, two
# orders below the fused selector's own re-rank floor) — i8 cuts a
# Search packet from ~1180 B to ~420 B, tripling fan-out per byte.
# Symmetric per-vector scale, same layout as the i8 STORAGE quantizer
# below, serialized little-endian.
# ---------------------------------------------------------------------------

I8_WIRE_BYTES = EM_LEN + 4  # D codes + f32 scale


def to_i8_wire_bytes(v: np.ndarray) -> bytes:
    """f32[D] unit vector -> D little-endian int8 codes + f32 scale."""
    import struct

    v = np.asarray(v, dtype=np.float32)
    scale = float(np.max(np.abs(v)))
    if scale == 0.0:
        scale = 1.0
    q = np.clip(np.rint(v / scale * 127.0), -127, 127).astype(np.int8)
    return q.tobytes() + struct.pack("<f", scale)


def from_i8_wire_bytes(data: bytes, dim: int = EM_LEN,
                       check: bool = True) -> np.ndarray:
    """D+4 bytes -> f32[D]. Validates the scale and (like the i24
    decoder, vector.rs:70) the decoded norm, so a hostile frame cannot
    smuggle an unnormalized query past the distance math."""
    import struct

    if len(data) != dim + 4:
        raise ValueError(f"expected {dim + 4} bytes, got {len(data)}")
    (scale,) = struct.unpack("<f", data[dim:])
    # unit vectors have max|v| <= 1; tolerate the same slack as the
    # norm check (a legit encoder never exceeds 1.0)
    if not np.isfinite(scale) or not 0.0 < scale <= 1.0 + MAX_VECTOR_DELTA:
        raise ValueError("i8 wire scale out of range")
    q = np.frombuffer(data[:dim], dtype=np.int8).astype(np.float32)
    v = q * np.float32(scale / 127.0)
    if check:
        l = float(np.linalg.norm(v.astype(np.float64)))
        if not (1.0 - MAX_VECTOR_DELTA < l < 1.0 + MAX_VECTOR_DELTA):
            raise ValueError("Embedding is not normalized")
    return v


# ---------------------------------------------------------------------------
# i24 wire codec (host-side, numpy — this is a network serialization format)
# ---------------------------------------------------------------------------


def to_i24_bytes(v: np.ndarray) -> bytes:
    """f32[D] in [-1,1] -> 3*D little-endian bytes (vector.rs:74-86)."""
    v = np.asarray(v, dtype=np.float64)
    q = (((v + 1.0) / 2.0) * I24_MAX).astype(np.int64)
    q = np.clip(q, 0, I24_MAX).astype(np.uint32)
    out = np.empty((v.shape[-1], 3), dtype=np.uint8)
    out[:, 0] = q & 0xFF
    out[:, 1] = (q >> 8) & 0xFF
    out[:, 2] = (q >> 16) & 0xFF
    return out.tobytes()


def from_i24_bytes(data: bytes, dim: int = EM_LEN, check: bool = True) -> np.ndarray:
    """3*D bytes -> f32[D] (vector.rs:57-72). Validates normalization
    like the reference's decode (vector.rs:70) unless check=False."""
    if len(data) != dim * 3:
        raise ValueError(f"expected {dim * 3} bytes, got {len(data)}")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(dim, 3).astype(np.uint32)
    q = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
    v = (q.astype(np.float64) / I24_MAX * 2.0 - 1.0).astype(np.float32)
    if check:
        l = float(np.linalg.norm(v.astype(np.float64)))
        if not (1.0 - MAX_VECTOR_DELTA < l < 1.0 + MAX_VECTOR_DELTA):
            raise ValueError("Embedding is not normalized")
    return v


# ---------------------------------------------------------------------------
# i16 (reference vector.rs:30-46)
# ---------------------------------------------------------------------------


def to_i16(v: jax.Array) -> jax.Array:
    """round(x * 32767) -> int16, batched."""
    return jnp.round(v.astype(jnp.float32) * 32767.0).astype(jnp.int16)


def from_i16(q: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) / 32767.0


# ---------------------------------------------------------------------------
# i8 storage quantization (device-side, the index's memory-parity format)
# ---------------------------------------------------------------------------


class QuantizedRows(NamedTuple):
    """Per-row symmetric int8 quantization: x ~= codes * scales[:, None]."""

    codes: jax.Array  # (N, D) int8
    scales: jax.Array  # (N,) float32


@jax.jit
def quantize_i8(x: jax.Array) -> QuantizedRows:
    """Per-row symmetric i8: scale = max|x| / 127 (row-wise), codes = round(x/scale)."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scales = jnp.maximum(absmax, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(x / scales[..., None]), -127, 127).astype(jnp.int8)
    return QuantizedRows(codes, scales)


@jax.jit
def dequantize_i8(q: QuantizedRows) -> jax.Array:
    return q.codes.astype(jnp.float32) * q.scales[..., None]


# ---------------------------------------------------------------------------
# i4 storage quantization (the CAPACITY tier: 0.5 byte/dim, ~2x the rows
# of i8 on the same HBM; doc/performance.md "the i4 capacity tier")
# ---------------------------------------------------------------------------
#
# Dim-PLANE nibble packing: packed byte j of a row holds dim j in the
# low nibble and dim D/2+j in the high nibble. Unpacking therefore
# yields two contiguous dim planes ([0, D/2) and [D/2, D)) and a dot
# product splits into two matmuls over the query's matching halves —
# NO row permutation, so the fused selector's window ids, per-row
# scales, and count masking are untouched (ops/scan_select.py). Codes
# are symmetric [-7, 7] with per-row scale absmax/7, stored biased +8
# in [1, 15].


def quantize_i4_np(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, D) f32 -> ((N, D/2) uint8 plane-packed nibbles, (N,) f32 scales)."""
    rows = np.atleast_2d(np.asarray(rows, np.float32))
    d = rows.shape[1]
    if d % 2:
        raise ValueError(f"i4 packing needs an even dim, got {d}")
    absmax = np.abs(rows).max(axis=1)
    scales = (np.maximum(absmax, 1e-12) / 7.0).astype(np.float32)
    c = np.clip(np.rint(rows / scales[:, None]), -7, 7).astype(np.int32) + 8
    packed = (c[:, : d // 2] | (c[:, d // 2:] << 4)).astype(np.uint8)
    return packed, scales


def unpack_i4_np(packed: np.ndarray) -> np.ndarray:
    """(N, D/2) uint8 -> (N, D) int8 codes in [-7, 7] (biased decode)."""
    p = np.asarray(packed, np.uint8)
    lo = (p & 0xF).astype(np.int8) - 8
    hi = (p >> 4).astype(np.int8) - 8
    return np.concatenate([lo, hi], axis=-1)


@jax.jit
def quantize_i4(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device twin of quantize_i4_np (same layout, bit-identical for
    inputs where round() agrees; covered by tests/test_i4.py)."""
    rows = jnp.atleast_2d(rows.astype(jnp.float32))
    d = rows.shape[1]
    absmax = jnp.max(jnp.abs(rows), axis=1)
    scales = jnp.maximum(absmax, 1e-12) / 7.0
    c = (jnp.clip(jnp.round(rows / scales[:, None]), -7, 7)
         .astype(jnp.int32) + 8)
    packed = (c[:, : d // 2] | (c[:, d // 2:] << 4)).astype(jnp.uint8)
    return packed, scales


def unpack_i4(packed: jax.Array) -> jax.Array:
    """jnp twin of unpack_i4_np; traced inside index/flat.py's XLA scan."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-1)


def i4_fetch_width(count: int, k: int) -> int:
    """Candidate fetch width for an exact re-rank over i4 storage.

    i4 scoring noise is ~16x i8's (3-bit vs 7-bit mantissa), so the
    i8 default of k+30 candidates is NOT enough for re-ranked recall
    1.0. Measured fetch-width ladder on 384-d random unit vectors
    (examples/study_i4_fetch_width.py; doc/performance.md "i4
    capacity tier"): full-sort recall@10 after f32 re-rank hits 1.0
    at kf=64 for 400k rows and kf=128 for both 2M and 8M (0.9945 /
    0.9906 / 0.9883 at the i8-default kf=40). The >=2M rungs sit one
    doubling above that floor because the fused selector's window
    fold adds a shadowing loss the full-sort study cannot see
    (measured 0.47% at 262k on the kernel path)."""
    if count <= 500_000:
        kf = 64
    elif count <= 2_000_000:
        kf = 128
    elif count <= 8_000_000:
        kf = 256
    else:
        kf = 512
    return max(kf, k)


@jax.jit
def scores_i8(queries: jax.Array, db: QuantizedRows) -> jax.Array:
    """(B, D) f32 queries x (N, D) i8 database -> (B, N) IP *distance* (1 - dot).

    The query stays f32 (asymmetric quantization: only the stored side is
    compressed), accumulation in f32 on the MXU; per-row scale applied after.
    """
    q = queries.astype(jnp.float32)
    codes = db.codes
    dots = jax.lax.dot_general(
        q, codes.astype(jnp.bfloat16).astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return 1.0 - dots * db.scales[None, :]
