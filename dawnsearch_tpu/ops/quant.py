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
# ROW-BLOCK nibble packing, TILE-ALIGNED. Codes live as uint8
# [cap/2, D]: within each block of `block` logical rows, packed row p
# holds dim j of logical row p in the LOW nibble and of logical row
# p + block/2 in the HIGH nibble. Unpacking a whole block therefore
# yields the block's rows in NATURAL ORDER ([lo rows | hi rows]), so
# the fused selector's window ids, per-row scales, and count masking
# are untouched (ops/scan_select.py treats one grid tile as one block).
#
# Why not the obvious per-row dim-plane packing ((N, D/2), byte j =
# dims j | D/2+j << 4)? D/2 = 192 is not a multiple of the TPU's
# 128-lane tile, so every XLA/Mosaic materialization of the codes pads
# 192 -> 256 lanes: measured at 32M rows, the compiled search program
# carried an 8.00 GB padded copy of the 6.00 GB codes (1.33x) and the
# 64M tier could not exist at all (16 GB padded > 15.75 GB HBM). With
# the lane dim at D = 384 the layout is tile-native: the same program
# compiles with temp 2.0 GB and no copy (compile-only A/B, round 4).
# Codes are symmetric [-7, 7] with per-row scale absmax/7, stored
# biased +8 in [1, 15]; scale/exact/ids arrays stay per-LOGICAL-row.

# One packing block = one fused-selector grid tile (scan_select
# DEFAULT_TN). Indexes whose segment is not a multiple of this use
# block = segment and serve from the XLA chunked path only.
I4_BLOCK = 16384


def quantize_i4_vals_np(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, D) f32 -> ((N, D) uint8 biased nibble VALUES in [1, 15],
    (N,) f32 scales). Packing is position-dependent (row-block layout)
    and happens at write time: pack_i4_np / write_rows_i4."""
    rows = np.atleast_2d(np.asarray(rows, np.float32))
    d = rows.shape[1]
    if d % 2:
        raise ValueError(f"i4 packing needs an even dim, got {d}")
    absmax = np.abs(rows).max(axis=1)
    scales = (np.maximum(absmax, 1e-12) / 7.0).astype(np.float32)
    vals = (np.clip(np.rint(rows / scales[:, None]), -7, 7)
            .astype(np.int16) + 8).astype(np.uint8)
    return vals, scales


@jax.jit
def quantize_i4_vals(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device twin of quantize_i4_vals_np (bit-identical for inputs
    where round() agrees; covered by tests/test_i4.py)."""
    rows = jnp.atleast_2d(rows.astype(jnp.float32))
    absmax = jnp.max(jnp.abs(rows), axis=1)
    scales = jnp.maximum(absmax, 1e-12) / 7.0
    vals = (jnp.clip(jnp.round(rows / scales[:, None]), -7, 7)
            .astype(jnp.int32) + 8).astype(jnp.uint8)
    return vals, scales


def pack_i4_np(vals: np.ndarray, block: int = I4_BLOCK) -> np.ndarray:
    """(N, D) biased nibble values -> (N/2, D) row-block packed uint8.
    N must be a multiple of `block` (buffer capacities are)."""
    n, d = vals.shape
    if block % 2 or n % block:
        raise ValueError(f"pack_i4 needs n % block == 0 and even block, "
                         f"got n={n} block={block}")
    g = vals.reshape(n // block, block, d)
    return (g[:, : block // 2] | (g[:, block // 2:] << 4)).reshape(
        n // 2, d).astype(np.uint8)


def unpack_i4_np(packed: np.ndarray, block: int = I4_BLOCK) -> np.ndarray:
    """(P, D) row-block packed uint8 -> (2P, D) int8 codes in [-7, 7],
    natural row order. 2P must be a multiple of `block`."""
    p = np.asarray(packed, np.uint8)
    np_, d = p.shape
    n = 2 * np_
    if n % block:
        raise ValueError(f"unpack_i4 needs rows % block == 0, "
                         f"got {n} rows, block={block}")
    g = p.reshape(n // block, block // 2, d)
    lo = (g & 0xF).astype(np.int8) - 8
    hi = (g >> 4).astype(np.int8) - 8
    return np.concatenate([lo, hi], axis=1).reshape(n, d)


def unpack_i4(packed: jax.Array, block: int = I4_BLOCK) -> jax.Array:
    """jnp twin of unpack_i4_np; traced inside index/flat.py's XLA scan."""
    np_, d = packed.shape
    n = 2 * np_
    g = packed.reshape(n // block, block // 2, d)
    lo = (g & 0xF).astype(jnp.int8) - 8
    hi = (g >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=1).reshape(n, d)


def write_rows_i4(buf: jax.Array, vals: jax.Array, start,
                  block: int = I4_BLOCK) -> jax.Array:
    """Write `vals` ((n, D) biased nibble values) at LOGICAL row `start`
    into a row-block packed buffer ((capP, D) uint8, capL = 2*capP a
    multiple of `block`). `start` may be a host int or traced i32;
    `n` must be static and <= capL. Traced-safe: reads the block-aligned
    region covering the write, unpacks to natural order, updates,
    repacks, writes back — the only read-modify-write in the index
    family (nibble writes share bytes with rows that already landed)."""
    capP, d = buf.shape
    capL = 2 * capP
    n = vals.shape[0]
    nb = min(n // block + 2, capL // block)
    RL = nb * block
    start = jnp.asarray(start, jnp.int32)
    r0 = jnp.clip((start // block) * block, 0, capL - RL)
    region = jax.lax.dynamic_slice(buf, (r0 // 2, 0), (RL // 2, d))
    g = region.reshape(nb, block // 2, d)
    logical = jnp.concatenate([g & 0xF, g >> 4], axis=1).reshape(RL, d)
    logical = jax.lax.dynamic_update_slice(
        logical, vals.astype(jnp.uint8), (start - r0, 0))
    g2 = logical.reshape(nb, block, d)
    packed = (g2[:, : block // 2] | (g2[:, block // 2:] << 4)).reshape(
        RL // 2, d).astype(jnp.uint8)
    return jax.lax.dynamic_update_slice(buf, packed, (r0 // 2, 0))


def blend_rows_i4(buf: jax.Array, new_vals: jax.Array, shift, s, mask,
                  block: int = I4_BLOCK) -> jax.Array:
    """write_rows_i4's blend twin for the sharded paths
    (parallel/sharded_index._blend_write contract): roll `new_vals`
    ((mr, D) biased nibble values) down by `shift`, write at logical
    offset `s`, keep old rows where `mask` is False."""
    capP, d = buf.shape
    capL = 2 * capP
    mr = new_vals.shape[0]
    nb = min(mr // block + 2, capL // block)
    RL = nb * block
    s = jnp.asarray(s, jnp.int32)
    r0 = jnp.clip((s // block) * block, 0, capL - RL)
    region = jax.lax.dynamic_slice(buf, (r0 // 2, 0), (RL // 2, d))
    g = region.reshape(nb, block // 2, d)
    logical = jnp.concatenate([g & 0xF, g >> 4], axis=1).reshape(RL, d)
    rolled = jnp.roll(new_vals.astype(jnp.uint8), shift, axis=0)
    off = s - r0
    old = jax.lax.dynamic_slice(logical, (off, 0), (mr, d))
    merged = jnp.where(mask[:, None], rolled, old)
    logical = jax.lax.dynamic_update_slice(logical, merged, (off, 0))
    g2 = logical.reshape(nb, block, d)
    packed = (g2[:, : block // 2] | (g2[:, block // 2:] << 4)).reshape(
        RL // 2, d).astype(jnp.uint8)
    return jax.lax.dynamic_update_slice(buf, packed, (r0 // 2, 0))


def i4_block_for(segment: int) -> int:
    """The packing block an index with this segment size uses: the
    fused-selector tile when the segment aligns to it (every grown
    capacity then stays block-aligned), else the segment itself
    (small/test indexes — XLA chunked path only)."""
    if segment % I4_BLOCK == 0:
        return I4_BLOCK
    if segment % 2:
        raise ValueError(f"i4 needs an even segment, got {segment}")
    return segment


def migrate_i4_dimplane_np(old_packed: np.ndarray,
                           block: int = I4_BLOCK) -> np.ndarray:
    """Load-time migration for pre-round-4 snapshots: (N, D/2) per-row
    dim-plane packing (byte j = dims j | D/2+j << 4) -> the row-block
    layout above."""
    p = np.asarray(old_packed, np.uint8)
    lo = (p & 0xF).astype(np.uint8)
    hi = (p >> 4).astype(np.uint8)
    vals = np.concatenate([lo, hi], axis=-1)  # biased values, natural
    return pack_i4_np(vals, block)


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
