"""FlatIndex: TPU-resident brute-force exact top-k over a device buffer.

The exactness oracle of the index family (SURVEY.md §7 step 3) and the
replacement for USearch at small/medium shard sizes
(/root/reference/src/search/search_provider.rs:35-42,214). Design:

- Preallocated device buffer grown in segments — the XLA-static-shape
  version of the reference's `index.reserve(size + 1024)`
  (search_provider.rs:280-283). Growth doubles capacity, so at most
  O(log N) distinct compiled shapes over an index's lifetime.
- Rows beyond `count` are masked to +inf distance before `lax.top_k`.
- Storage dtypes: f32 / bf16 / i8 (per-row symmetric scale, f32
  accumulation on the MXU — the USearch-memory-parity mode) / i4
  (nibble-packed, 0.5 byte/dim — the CAPACITY tier: ~2x the rows of i8
  on the same HBM; dim-plane packing per ops/quant.py so the fused
  selector's row semantics are unchanged).
- Large capacities are scored in row-chunks with a running top-k merge
  (lax.scan), bounding the (B, N) score matrix to (B, chunk): HBM-safe
  at 1M+ rows and large query batches.
- Distance convention: "ip" = 1 - <q, x>, ascending-better, identical
  ordering to USearch MetricKind::IP on normalized vectors.
- Optional DEVICE-SIDE exact re-rank (`exact="f16"`): a parallel f16
  shadow buffer; search fetches k+rerank_extra candidates with the fast
  quantized scan, gathers their f16 rows and re-scores them at f32
  accumulation INSIDE the same device program, so the serving path gets
  re-ranked recall without the host round-trip (SQLite fetch + numpy
  einsum) that dominates batched serving cost (doc/performance.md
  "re-rank cost"). f16 keeps 11 mantissa bits (~2^-12 relative error,
  well under the i8 storage error the re-rank corrects); memory cost is
  2 bytes/dim on top of the 1 byte/dim codes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from dawnsearch_tpu.ops.vector import EM_LEN

# Segment granularity = the fused score+select kernel's row-tile
# (ops/scan_select.py DEFAULT_TN), so every grown capacity qualifies
# for the fused path.
DEFAULT_SEGMENT = 16384
DEFAULT_CHUNK = 65536


class IndexFull(RuntimeError):
    """Deterministic capacity refusal (the reference's 1M-page cap,
    search_provider.rs:164-166). A distinct class so the multihost
    follower loop can tell a host-side refusal that raised IDENTICALLY
    on the leader (co-skip, stay in lockstep) from a follower-local
    device failure (fail-stop — parallel/multihost.py)."""


def _atomic_savez(path: str, **arrays) -> None:
    """np.savez + atomic rename (shared by FlatIndex and
    ShardedFlatIndex snapshot writers — one copy of the crash-safety
    dance). numpy appends .npz to the tmp name."""
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz", path)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf: jax.Array, rows: jax.Array, start: jax.Array) -> jax.Array:
    """Write `rows` at row offset `start` (buffer donated: in-place on TPU)."""
    return jax.lax.dynamic_update_slice(buf, rows, (start,) + (0,) * (buf.ndim - 1))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_scales(buf: jax.Array, scales: jax.Array, start: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, scales, (start,))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("block",))
def _write_rows_i4(buf: jax.Array, vals: jax.Array, start: jax.Array, *,
                   block: int) -> jax.Array:
    """i4 twin of _write_rows: `vals` are (n, D) biased nibble values;
    the row-block repack rides in the same donated program
    (ops/quant.write_rows_i4)."""
    from dawnsearch_tpu.ops.quant import write_rows_i4
    return write_rows_i4(buf, vals, start, block)


class _PackedI4(tuple):
    """Marker for host-PRE-PACKED i4 codes in a prepared add: (P, D)
    uint8 covering whole packing blocks. Host packing halves the
    host->device transfer (0.5 vs 1 byte/dim — the i4 bulk build is
    transfer-bound through the tunnel: 88 s of sys-time in a 96 s
    2M build) and, when the commit lands block-aligned (every bulk
    append does: segments and stream blocks are block multiples), the
    device write is a plain dynamic_update_slice instead of the
    unpack/update/repack read-modify-write."""

    __slots__ = ()


@jax.jit
def _quantize_rows_i8(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    rows = rows.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(rows), axis=-1)
    scales = jnp.maximum(absmax, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(rows / scales[:, None]), -127, 127).astype(jnp.int8)
    return codes, scales


def _is_i4(codes: jax.Array) -> bool:
    """Packed-i4 buffers are the only uint8 codes in the index family."""
    return codes.dtype == jnp.uint8


def _chunk_scores(q: jax.Array, chunk_codes: jax.Array,
                  chunk_scales: jax.Array | None,
                  i4_block: int | None = None) -> jax.Array:
    """(B, D) x (C, D) -> (B, C) ip-distance (1 - dot), f32 accumulation.

    f32 storage scores in f32 (the exactness oracle); bf16/i8 storage
    runs bf16 operands so the MXU runs at bf16 rate (int8 codes are
    exact in bf16; the query's bf16 rounding is ~the same magnitude as
    the i8 storage error and measured recall-neutral). i4 chunks arrive
    row-block PACKED ((C/2, D) uint8 covering whole blocks) and unpack
    to 2x the rows in natural order (ops/quant.py)."""
    if chunk_scales is None:
        qq = q.astype(chunk_codes.dtype) if chunk_codes.dtype == jnp.bfloat16 else q
        dots = jax.lax.dot_general(qq, chunk_codes, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return 1.0 - dots
    if _is_i4(chunk_codes):
        from dawnsearch_tpu.ops.quant import unpack_i4
        chunk_codes = unpack_i4(chunk_codes, i4_block)
    x = chunk_codes.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(q.astype(jnp.bfloat16), x,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return 1.0 - dots * chunk_scales[None, :]


def _select_smallest(scores: jax.Array, k: int, approx: bool
                     ) -> tuple[jax.Array, jax.Array]:
    """Smallest-k selector. `approx` uses the TPU's approx_min_k
    (recall_target 0.99, measured ~2x faster than exact top_k at
    1M rows and recall-neutral next to i8 storage error)."""
    if approx:
        return jax.lax.approx_min_k(scores, k, recall_target=0.99)
    neg, idx = jax.lax.top_k(-scores, k)
    return -neg, idx


def _block_topk(q: jax.Array, block_codes: jax.Array,
                block_scales: jax.Array | None, offset, count: jax.Array,
                k: int, approx: bool,
                i4_block: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Top-k over one contiguous row block at global row `offset`.
    Rows with global id >= count score +inf. `offset` and `count` are
    LOGICAL rows (i4 block_codes carry 2 rows per packed row)."""
    scores = _chunk_scores(q, block_codes, block_scales, i4_block)
    n = scores.shape[1]
    global_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) + offset
    scores = jnp.where(global_ids < count, scores, jnp.inf)
    vals, idx = _select_smallest(scores, min(k, n), approx)
    ids = jnp.take_along_axis(
        jnp.broadcast_to(global_ids, scores.shape), idx, axis=1)
    return vals, ids


def _merge_topk(best: tuple[jax.Array, jax.Array],
                cand: tuple[jax.Array, jax.Array], k: int
                ) -> tuple[jax.Array, jax.Array]:
    d = jnp.concatenate([best[0], cand[0]], axis=1)
    i = jnp.concatenate([best[1], cand[1]], axis=1)
    neg, sel = jax.lax.top_k(-d, k)
    return -neg, jnp.take_along_axis(i, sel, axis=1)


def search_kernel(codes: jax.Array, scales: jax.Array | None, queries: jax.Array,
                  count: jax.Array, k: int, chunk: int,
                  approx: bool = False,
                  i4_block: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Chunked exact search -> (distances (B,k) asc, row ids (B,k)).

    Invalid slots (>= count) come back with distance +inf and id -1.
    Capacity need not divide `chunk`: full chunks run under lax.scan
    with a running merge, the remainder block merges at the end.
    `chunk` and `count` are LOGICAL rows; i4 codes arrive row-block
    packed at 2 rows/packed row and `i4_block` must divide `chunk`
    (FlatIndex validates at construction), so every chunk holds whole
    packing blocks and unpacks in natural order.
    """
    i4 = _is_i4(codes)
    if i4 and i4_block is None:
        raise ValueError("i4 codes need an explicit i4_block "
                         "(the index's packing block)")
    cap = codes.shape[0] * 2 if i4 else codes.shape[0]  # logical rows
    pr = 2 if i4 else 1  # logical rows per stored row
    B = queries.shape[0]
    q = queries.astype(jnp.float32)
    blk = i4_block if i4 else None
    if cap <= chunk:
        dists, ids = _block_topk(q, codes, scales, 0, count, k, approx, blk)
        return dists, jnp.where(jnp.isfinite(dists), ids, -1)

    n_full = cap // chunk
    chunk_s = chunk // pr  # stored rows per chunk
    rem = cap - n_full * chunk
    codes_c = codes[: n_full * chunk_s].reshape(n_full, chunk_s,
                                                codes.shape[1])
    scales_c = (None if scales is None
                else scales[: n_full * chunk].reshape(n_full, chunk))

    init = (jnp.full((B, k), jnp.inf, jnp.float32),
            jnp.full((B, k), -1, jnp.int32))

    def body(carry, inp):
        if scales_c is None:
            c_idx, chunk_codes = inp
            chunk_scales = None
        else:
            c_idx, chunk_codes, chunk_scales = inp
        cand = _block_topk(q, chunk_codes, chunk_scales, c_idx * chunk,
                           count, k, approx, blk)
        return _merge_topk(carry, cand, k), None

    xs = (jnp.arange(n_full, dtype=jnp.int32), codes_c) if scales_c is None \
        else (jnp.arange(n_full, dtype=jnp.int32), codes_c, scales_c)
    (dists, ids), _ = jax.lax.scan(body, init, xs)
    if rem:
        tail = _block_topk(q, codes[n_full * chunk_s:],
                           None if scales is None else scales[n_full * chunk:],
                           n_full * chunk, count, k, approx, blk)
        dists, ids = _merge_topk((dists, ids), tail, k)
    ids = jnp.where(jnp.isfinite(dists), ids, -1)
    return dists, ids


_search = functools.partial(
    jax.jit, static_argnames=("k", "chunk", "approx", "i4_block"))(search_kernel)


def rerank_kernel(exact: jax.Array, q: jax.Array, dists: jax.Array,
                  ids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact re-rank of scan candidates from the f16 shadow buffer.

    Gathers the (B, kf) candidate rows, re-scores at f32 accumulation,
    and returns the top-k by exact distance. Invalid candidates
    (id -1 / +inf) stay masked. The gather is tiny next to the scan
    (B*kf rows vs N), so this rides in the same device program for
    ~free."""
    cand = exact[jnp.maximum(ids, 0)].astype(jnp.float32)  # (B, kf, D)
    exact_d = 1.0 - jnp.einsum("bd,bkd->bk", q.astype(jnp.float32), cand)
    valid = (ids >= 0) & jnp.isfinite(dists)
    d = jnp.where(valid, exact_d, jnp.inf)
    neg, sel = jax.lax.top_k(-d, min(k, d.shape[1]))
    out_d = -neg
    out_i = jnp.where(jnp.isfinite(out_d),
                      jnp.take_along_axis(ids, sel, axis=1), -1)
    return out_d, out_i


@functools.partial(jax.jit, static_argnames=("k", "kf", "chunk", "approx",
                                             "i4_block"))
def _search_rerank(codes, scales, exact, q, count, k, kf, chunk, approx,
                   i4_block=None):
    d, i = search_kernel(codes, scales, q, count, kf, chunk, approx=approx,
                         i4_block=i4_block)
    return rerank_kernel(exact, q, d, i, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _fused_select(codes, scales, q, count, k):
    from dawnsearch_tpu.ops.scan_select import search_select
    return search_select(codes, scales, q, count, k)


@functools.partial(jax.jit, static_argnames=("k", "kf"))
def _fused_select_rerank(codes, scales, exact, q, count, k, kf):
    from dawnsearch_tpu.ops.scan_select import search_select
    d, i = search_select(codes, scales, q, count, kf)
    return rerank_kernel(exact, q.astype(jnp.float32), d, i, k)


_HBM_BUDGET: int | None = None  # resolved once per process


def _hbm_budget() -> int:
    """Usable HBM bytes for the fused-path batch guard
    (FlatIndex._max_fused_batch): the runtime's reported bytes_limit
    minus a 0.75 GiB working margin (reserved segment + an encoder
    sharing the chip) where the backend exposes memory_stats; else a
    TPU v5e fallback constant (16 GB HBM chip; the 15 GiB figure was
    measured from the round-4 64M acceptance OOM dump on v5e — other
    chip generations MUST come through memory_stats or the guard is
    wrong for them, which is why the runtime path is first)."""
    global _HBM_BUDGET
    if _HBM_BUDGET is None:
        budget = 15 * 2**30  # v5e fallback
        try:
            stats = jax.local_devices()[0].memory_stats()
            limit = int((stats or {}).get("bytes_limit", 0))
            if limit > 2**30:
                budget = limit - (3 * 2**30) // 4
        except Exception:
            pass  # backends without memory_stats keep the v5e constant
        _HBM_BUDGET = budget
    return _HBM_BUDGET


def _check_unit_queries(queries, count: int, capacity: int, dim: int,
                        dtype: str, selector: str, min_rows: int) -> None:
    """Raise on non-unit host queries when the fused selector would
    serve them (its packed-key compare is only correct for |dot| < 2).
    Mirrors SearchProvider.search_embeddings' 1% tolerance."""
    if not isinstance(queries, np.ndarray):
        return  # device arrays: avoid a host readback; provider checks
    from dawnsearch_tpu.ops import scan_select
    if not scan_select.eligible(count, capacity, dim, dtype, selector,
                                min_rows):
        return
    q = np.atleast_2d(np.asarray(queries, np.float32))
    if q.shape[0] == 0:
        return
    norms = np.linalg.norm(q, axis=1)
    if not np.all(np.abs(norms - 1.0) <= 0.01):
        bad = float(norms[np.argmax(np.abs(norms - 1.0))])
        raise ValueError(
            f"query embedding not normalized (length {bad:.4f}); the "
            "fused selector requires unit queries — normalize before "
            "searching")


class FlatIndex:
    """Append-only exact index on one device (sharding lives in
    dawnsearch_tpu.parallel.sharded_index)."""

    def __init__(
        self,
        dim: int = EM_LEN,
        dtype: str = "i8",
        capacity: int = DEFAULT_SEGMENT,
        max_capacity: int | None = None,
        segment: int = DEFAULT_SEGMENT,
        chunk: int = DEFAULT_CHUNK,
        selector: str = "auto",
        exact: str | None = None,
        rerank_extra: int = 30,
        _alloc: bool = True,
    ):
        if dtype not in ("f32", "bf16", "i8", "i4"):
            raise ValueError(f"unsupported dtype {dtype}")
        if selector not in ("auto", "exact", "approx", "fused"):
            raise ValueError(f"unsupported selector {selector}")
        if exact not in (None, "f16"):
            raise ValueError(f"unsupported exact dtype {exact}")
        if exact and dtype == "f32":
            raise ValueError("exact shadow buffer is redundant for f32 storage")
        if dtype == "i4" and dim % 2:
            raise ValueError("i4 nibble packing needs an even dim")
        self.dim = dim
        self.dtype = dtype
        self.exact = exact
        self.rerank_extra = rerank_extra
        self.segment = segment
        self.chunk = chunk
        # "auto": exact top_k for f32 (the oracle), approx_min_k for
        # quantized storage — ~2x faster at 1M rows, recall-neutral
        # next to the quantization error.
        from dawnsearch_tpu.ops.scan_select import MIN_ROWS
        self.selector = selector
        self.fused_min_rows = MIN_ROWS  # see scan_select.eligible
        self.max_capacity = max_capacity
        self.count = 0
        self.capacity = _round_up(max(capacity, segment), segment)
        jdt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "i8": jnp.int8,
               "i4": jnp.uint8}[dtype]
        if dtype == "i4":
            # Row-block nibble packing, (capacity/2, dim) uint8 — the
            # lane dim stays a 128-multiple so XLA never pads/copies
            # the codes (ops/quant.py header). Block-aligned growth and
            # whole-block chunking keep the layout position-stable.
            from dawnsearch_tpu.ops.quant import i4_block_for
            self._i4_block = i4_block_for(segment)
            if chunk % self._i4_block != 0:
                raise ValueError(
                    f"i4 chunked scan needs chunk % block == 0, got "
                    f"chunk={chunk} block={self._i4_block} (pick a "
                    f"segment dividing the chunk, or align segment to "
                    f"{chunk})")
            if _alloc:
                self._codes = jnp.zeros((self.capacity // 2, dim), jdt)
        else:
            self._i4_block = None
            if _alloc:
                self._codes = jnp.zeros((self.capacity, dim), jdt)
        if not _alloc:
            # load() binds snapshot buffers right after construction;
            # allocating capacity-sized zeros here just to drop them
            # would transiently DOUBLE device memory — at the 64M i4
            # envelope that is 2 x 12.9 GB against 16 GB HBM, an OOM
            # at the first kernel execution (measured; round 5)
            self._codes = None
            self._scales = None
            self._exact = None
            return
        self._scales = (jnp.ones((self.capacity,), jnp.float32)
                        if dtype in ("i8", "i4") else None)
        self._exact = (jnp.zeros((self.capacity, dim), jnp.float16)
                       if exact else None)

    def __len__(self) -> int:
        return self.count

    @property
    def device_rerank(self) -> bool:
        """True when search() already returns exactly re-ranked results
        (callers can skip their own host-side f32 re-rank)."""
        return self._exact is not None

    def device_fetch_width(self, k: int) -> int:
        """Candidate width for the on-device f16 re-rank: k+rerank_extra,
        widened by the count-keyed ladder for i4 codes (the i8 default
        +30 measured 0.99x re-ranked recall on i4 — ops/quant.
        i4_fetch_width; the host path applies the same ladder in
        SearchProvider.fetch_width)."""
        kf = k + self.rerank_extra
        if self.dtype == "i4":
            from dawnsearch_tpu.ops.quant import i4_fetch_width
            kf = max(kf, i4_fetch_width(self.count, k))
        return min(kf, self.capacity)

    @property
    def nbytes(self) -> int:
        n = self._codes.size * self._codes.dtype.itemsize
        if self._scales is not None:
            n += self._scales.size * 4
        if self._exact is not None:
            n += self._exact.size * 2
        return n

    def _grow_to(self, needed: int) -> None:
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        if self.max_capacity is not None:
            new_cap = min(_round_up(self.max_capacity, self.segment), new_cap)
        if new_cap <= self.capacity:
            raise IndexFull(
                f"index full: capacity {self.capacity}, need {needed}")
        pad = new_cap - self.capacity
        pad_codes = pad // 2 if self.dtype == "i4" else pad
        self._codes = jnp.pad(self._codes, ((0, pad_codes), (0, 0)))
        if self._scales is not None:
            self._scales = jnp.pad(self._scales, ((0, pad),),
                                   constant_values=1.0)
        if self._exact is not None:
            self._exact = jnp.pad(self._exact, ((0, pad), (0, 0)))
        self.capacity = new_cap

    def _prepare(self, vectors: np.ndarray | jax.Array):
        """Stage 1 of add(): dtype-specific quantization. Touches NO
        index state, so numpy inputs are safe to prepare on a prefetch
        thread while the main thread commits earlier blocks
        (add_stream). numpy inputs quantize on the HOST and stay numpy —
        the host->device transfer happens implicitly at the commit
        dispatch, keeping the prefetch thread JAX-FREE: two threads
        issuing device RPCs concurrently serialize pathologically
        through the tunneled dispatch path (measured 73-91 s vs 24 s
        sequential for the 1M i8 build, round-5 root-cause of the
        BENCH_r04 regression). i8/i4 host quantization also means only
        packed codes cross the link (4x/8x less transfer). Device
        inputs quantize on device — main/owner thread only.
        Returns (n, codes, scales|None, f16|None)."""
        n = np.shape(vectors)[0] if np.ndim(vectors) > 1 else 1
        if n == 0:
            return 0, None, None, None
        if self.dtype == "i4":
            from dawnsearch_tpu.ops.quant import (pack_i4_np,
                                                  quantize_i4_vals,
                                                  quantize_i4_vals_np)
            if isinstance(vectors, np.ndarray):
                codes, scales = quantize_i4_vals_np(vectors)
                if codes.shape[0] % self._i4_block == 0:
                    # whole packing blocks: pre-pack on the host (see
                    # _PackedI4). The packed bytes are position-
                    # independent for any block-aligned destination;
                    # _commit unpacks back (host) for the rare
                    # misaligned commit.
                    codes = _PackedI4(
                        (pack_i4_np(codes, self._i4_block),))
            else:
                rows = jnp.atleast_2d(jnp.asarray(vectors, jnp.float32))
                codes, scales = quantize_i4_vals(rows)
        elif self.dtype == "i8":
            if isinstance(vectors, np.ndarray):
                rows = np.atleast_2d(np.asarray(vectors, np.float32))
                absmax = np.abs(rows).max(axis=1)
                scales = (np.maximum(absmax, 1e-12) / 127.0
                          ).astype(np.float32)
                codes = np.clip(np.rint(rows / scales[:, None]),
                                -127, 127).astype(np.int8)
            else:
                rows = jnp.atleast_2d(jnp.asarray(vectors, jnp.float32))
                codes, scales = _quantize_rows_i8(rows)
        else:
            if isinstance(vectors, np.ndarray):
                rows = np.atleast_2d(np.asarray(vectors, np.float32))
                ndt = np.float32 if self.dtype == "f32" else jnp.bfloat16
                codes, scales = rows.astype(ndt), None
            else:
                rows = jnp.atleast_2d(jnp.asarray(vectors, jnp.float32))
                jdt = jnp.float32 if self.dtype == "f32" else jnp.bfloat16
                codes, scales = rows.astype(jdt), None
        f16 = None
        if self._exact is not None:
            # host inputs convert on host (f16 halves the extra transfer
            # vs f32); device inputs cast on device.
            if isinstance(vectors, np.ndarray):
                f16 = np.atleast_2d(vectors).astype(np.float16)
            else:
                f16 = jnp.atleast_2d(
                    jnp.asarray(vectors)).astype(jnp.float16)
        return n, codes, scales, f16

    def _commit(self, prepared) -> np.ndarray:
        """Stage 2 of add(): grow + donating device writes + count
        bookkeeping. Mutates index state — main/owner thread only."""
        n, codes, scales, f16 = prepared
        if n == 0:
            return np.empty((0,), np.int64)
        if self.count + n > self.capacity:
            self._grow_to(self.count + n)
        start = jnp.int32(self.count)
        if isinstance(codes, _PackedI4):
            (packed,) = codes
            if self.count % self._i4_block == 0:
                # block-aligned append: the packed bytes drop straight
                # into the packed buffer (block b of 16384 logical rows
                # IS packed rows [b*8192, (b+1)*8192))
                self._codes = _write_rows(self._codes, packed,
                                          jnp.int32(self.count // 2))
            else:
                from dawnsearch_tpu.ops.quant import unpack_i4_np
                vals = (unpack_i4_np(packed, self._i4_block)
                        .astype(np.int16) + 8).astype(np.uint8)
                self._codes = _write_rows_i4(self._codes, vals, start,
                                             block=self._i4_block)
        elif self.dtype == "i4":
            self._codes = _write_rows_i4(self._codes, codes, start,
                                         block=self._i4_block)
        else:
            self._codes = _write_rows(self._codes, codes, start)
        if scales is not None:
            self._scales = _write_scales(self._scales, scales, start)
        if f16 is not None:
            self._exact = _write_rows(self._exact, f16, start)
        ids = np.arange(self.count, self.count + n, dtype=np.int64)
        self.count += n
        return ids

    def add(self, vectors: np.ndarray | jax.Array) -> np.ndarray:
        """Append rows; returns their assigned row ids."""
        return self._commit(self._prepare(vectors))

    def add_stream(self, blocks, prefetch: int = 2) -> np.ndarray:
        """Pipelined bulk append: quantize + host->device transfer of
        block k+1 (a prefetch thread) overlaps the donating device
        writes of block k (this thread). Bulk index build is
        transfer-bound (doc/performance.md "index build"), so hiding
        host quantization + corpus generation behind the link roughly
        halves build wall-clock — the reference's equivalent pain point
        is the startup fill progress bar (search_provider.rs:127-153).

        `blocks` is an iterable of (n, dim) arrays; consumed on the
        prefetch thread, so generator-side host work (corpus synthesis,
        ground-truth accumulation in benches) overlaps too. Returns the
        concatenated row ids, identical to sequential add() calls."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        _END = object()
        stop = threading.Event()  # consumer died: unblock the producer

        def _put(item) -> bool:
            # bounded put that yields to `stop` — a plain q.put would
            # block forever if the consumer raised (IndexFull mid
            # stream) with the queue full, leaking the thread and its
            # prepared device buffers
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce() -> None:
            try:
                for v in blocks:
                    if not _put(self._prepare(v)):
                        return
            except BaseException as e:  # surface on the consumer side
                _put(e)
                return
            _put(_END)

        t = threading.Thread(target=produce, daemon=True,
                             name="flatindex-add-prefetch")
        t.start()
        out = []
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                out.append(self._commit(item))
        finally:
            stop.set()
            t.join(timeout=60)
        return (np.concatenate(out) if out
                else np.empty((0,), np.int64))

    def search(self, queries: np.ndarray | jax.Array, k: int
               ) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k -> (distances (B, k) ascending, ids (B, k); -1 = empty).

        Queries must be unit-normalized when the fused selector serves
        (count >= fused_min_rows): its packed-key integer compare needs
        dot products in (-2, 2) (ops/scan_select.py). Host (numpy)
        inputs are checked here (round-2 advisor: the behavior would
        otherwise silently flip from correct to wrong as the index
        crosses the fused gate); device inputs are the caller's
        contract — a readback through the tunneled dispatch path would
        cost more than the search."""
        d, i, k_eff, single = self.search_dispatch(queries, k)
        return self.search_finalize(d, i, k, k_eff, single)

    def search_dispatch(self, queries: np.ndarray | jax.Array, k: int):
        """Enqueue the search program without blocking on execution;
        -> opaque state for search_finalize. A caller serializing
        against donating writers (SearchProvider.device_lock) needs to
        hold its lock only across THIS call — the execution wait lives
        in search_finalize."""
        _check_unit_queries(queries, self.count, self.capacity, self.dim,
                            self.dtype, self.selector, self.fused_min_rows)
        q = jnp.asarray(queries, jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        k_eff = min(k, self.capacity)
        approx = (self.selector == "approx"
                  or (self.selector == "auto" and self.dtype != "f32"))
        # The fused score+select kernel (87k vs 53k QPS at 1M rows,
        # doc/performance.md); the shared gate (scan_select.eligible)
        # falls through to the XLA chunked path at small counts or
        # unsupported shapes. Recall measured identical to approx_min_k
        # (0.982 raw at 1M).
        from dawnsearch_tpu.ops import scan_select
        fused = (scan_select.eligible(self.count, self.capacity, self.dim,
                                      self.dtype, self.selector,
                                      self.fused_min_rows)
                 and (self.dtype != "i4"
                      or self._i4_block == scan_select.DEFAULT_TN))
        if fused:
            # HBM guard: the fused selector's candidate temps scale as
            # ~13 B x B x capacity/128 (measured from the round-4 64M
            # acceptance OOM dump: 3.5 GiB of HLO temp at B=512 over
            # 64M rows, 3 MiB past the chip). A batch that would not
            # fit next to the codes is dispatched in chunks — slower
            # than one program, but it replaces an opaque XLA
            # compile-time OOM at exactly the capacity tiers the i4
            # format exists for.
            bm = self._max_fused_batch()
            if q.shape[0] > bm:
                parts = [self._search_fused(q[s:s + bm], k_eff)
                         for s in range(0, q.shape[0], bm)]
                d = [p[0] for p in parts]
                i = [p[1] for p in parts]
            else:
                d, i = self._search_fused(q, k_eff)
        elif self._exact is not None:
            kf = self.device_fetch_width(k_eff)
            d, i = _search_rerank(self._codes, self._scales, self._exact,
                                  q, jnp.int32(self.count), k_eff, kf,
                                  self.chunk, approx,
                                  i4_block=self._i4_block)
        else:
            d, i = _search(self._codes, self._scales, q,
                           jnp.int32(self.count), k_eff, self.chunk,
                           approx=approx, i4_block=self._i4_block)
        return d, i, k_eff, single

    def _max_fused_batch(self) -> int:
        """Largest query batch the fused selector can serve in ONE
        program without its candidate temps overflowing HBM next to
        the codes (see search_dispatch). Only the real chip has the
        fixed envelope; CPU tests/interpret mode are uncapped. The
        budget leaves ~0.75 GiB for the reserved segment + an encoder
        sharing the chip."""
        if jax.default_backend() != "tpu":
            return 1 << 30
        free = _hbm_budget() - self.nbytes
        per_row = 13 * (self.capacity // 128)
        b = min(1 << 30, max(8, free // max(per_row, 1)))
        return 1 << (int(b).bit_length() - 1)  # power-of-two floor:
        # chunk shapes then reuse the bucketed compile cache

    @staticmethod
    def search_finalize(d, i, k: int, k_eff: int, single: bool
                        ) -> tuple[np.ndarray, np.ndarray]:
        """Block on the dispatched search and shape the host results.
        d/i arrive as lists when search_dispatch chunked an over-HBM
        batch (fused path); concatenate in dispatch order."""
        if isinstance(d, list):
            d = np.concatenate([np.asarray(x) for x in d])
            i = np.concatenate([np.asarray(x) for x in i])
        d, i = np.asarray(d), np.asarray(i)
        if k_eff < k:  # pad to requested k
            d = np.pad(d, ((0, 0), (0, k - k_eff)), constant_values=np.inf)
            i = np.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
        if single:
            return d[0], i[0]
        return d, i

    def _search_fused(self, q: jax.Array, k: int
                      ) -> tuple[jax.Array, jax.Array]:
        """Fused score+select Pallas path (ops/scan_select.py): scores
        never reach HBM; composes with the f16 device re-rank. One
        jitted program -> one (tunneled) dispatch."""
        count = jnp.int32(self.count)
        if self._exact is not None:
            kf = self.device_fetch_width(k)
            return _fused_select_rerank(self._codes, self._scales,
                                        self._exact, q, count, k, kf)
        return _fused_select(self._codes, self._scales, q, count, k)

    def reconstruct(self, row_id: int) -> np.ndarray:
        """Approximate stored vector (f16 shadow if kept, else
        dequantized codes)."""
        if self._exact is not None:
            return np.asarray(self._exact[row_id], np.float32)
        if self.dtype == "i4":
            # row-block layout: logical row r lives in packed row
            # (r // T)*T/2 + r % (T/2), low nibble for the block's
            # first half, high for the second (ops/quant.py)
            t = self._i4_block
            b, off = divmod(row_id, t)
            packed = np.asarray(self._codes[b * (t // 2) + off % (t // 2)])
            nib = packed >> 4 if off >= t // 2 else packed & 0xF
            row = nib.astype(np.float32) - 8.0
        else:
            row = np.asarray(self._codes[row_id]).astype(np.float32)
        if self._scales is not None:
            row *= float(self._scales[row_id])
        return row

    # -- persistence (reference: index.usearch save/load,
    #    search_provider.rs:111-125,173-181) --

    def save(self, path: str) -> None:
        self.deferred_save()(path)

    def deferred_save(self):
        """Capture the buffer REFERENCES now and return a closure that
        does the device->host readback + npz write. Lets
        SearchProvider.save hold the device lock only for the capture
        instead of stalling every query dispatch behind a multi-GB
        readback through the tunnel (round-3 review).

        SAFETY CONTRACT: the returned closure must run while NO
        donating write (add / fused ingest) can land — donation marks
        the captured old buffers DELETED and the readback raises.
        SearchProvider.save enforces this with its ingest_gate (held by
        every donating mutator); non-donating searches keep flowing.
        Do not call the closure outside such a gate on live indexes."""
        codes, scales, exact = self._codes, self._scales, self._exact
        count, dtype, dim = self.count, self.dtype, self.dim
        i4_block = self._i4_block

        def write(path: str) -> None:
            _atomic_savez(
                path,
                codes=np.asarray(codes),
                scales=(np.asarray(scales)
                        if scales is not None else np.empty(0)),
                exact=(np.asarray(exact)
                       if exact is not None else np.empty(0)),
                count=count,
                dtype=dtype,
                dim=dim,
                # i4 codes are position-dependent (row-block packing);
                # absent key = pre-round-4 dim-plane layout, migrated
                # on load (ops/quant.migrate_i4_dimplane_np)
                i4_block=(i4_block or 0),
            )
        return write

    @classmethod
    def load(cls, path: str, **kwargs) -> "FlatIndex":
        with np.load(path, allow_pickle=False) as z:
            dtype = str(z["dtype"])
            dim = int(z["dim"])
            count = int(z["count"])
            codes = z["codes"]
            scales = z["scales"]
            # "exact" key absent in round-1 snapshots — stay loadable
            exact = z["exact"] if "exact" in z.files else np.empty(0)
            snap_block = int(z["i4_block"]) if "i4_block" in z.files else 0
        has_exact = exact.size > 0
        kwargs.setdefault("exact", "f16" if has_exact else None)
        if dtype == "i4":
            from dawnsearch_tpu.ops.quant import pack_i4_np, unpack_i4_np
            capacity = (codes.shape[0] if snap_block == 0
                        else codes.shape[0] * 2)
            idx = cls(dim=dim, dtype=dtype, capacity=capacity,
                      _alloc=False, **kwargs)
            if snap_block == 0:
                # pre-round-4 snapshot: per-row dim-plane nibbles
                # ((cap, D/2), byte j = dims j | D/2+j << 4) ->
                # biased values, natural order
                vals = np.concatenate(
                    [codes & 0xF, codes >> 4], axis=-1).astype(np.uint8)
            elif snap_block != idx._i4_block:
                # saved under a different segment policy
                vals = (unpack_i4_np(codes, snap_block)
                        .astype(np.int16) + 8).astype(np.uint8)
            else:
                vals = None
            if vals is not None:
                # repack into idx's row-block layout; idx.capacity is
                # the (segment-rounded) target, pad the tail with zeros
                # (masked by count like any unwritten slot)
                if idx.capacity > vals.shape[0]:
                    vals = np.pad(vals,
                                  ((0, idx.capacity - vals.shape[0]),
                                   (0, 0)))
                codes = pack_i4_np(vals, idx._i4_block)
            if scales.shape[0] < idx.capacity:
                scales = np.pad(scales,
                                ((0, idx.capacity - scales.shape[0]),),
                                constant_values=1.0)
        else:
            idx = cls(dim=dim, dtype=dtype, capacity=codes.shape[0],
                      _alloc=False, **kwargs)
        jdt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "i8": jnp.int8,
               "i4": jnp.uint8}[dtype]
        idx._codes = jnp.asarray(codes, jdt)
        if dtype in ("i8", "i4"):
            idx._scales = jnp.asarray(scales, jnp.float32)
        # Config is policy: an explicitly passed exact=None DROPS a
        # snapshot's shadow buffer (it would silently hold +2 bytes/dim
        # of HBM against the operator's choice — and diverge from
        # ShardedFlatIndex.load, round-3 review); absent kwarg follows
        # the snapshot via the setdefault above.
        if has_exact and idx.exact == "f16":
            idx._exact = jnp.asarray(exact, jnp.float16)
        elif idx.exact == "f16":
            # Caller requested a shadow buffer the snapshot doesn't
            # carry: backfill from the dequantized codes rather than
            # leave an all-zero buffer that would silently score every
            # candidate at distance 1.0 (round-2 advisor finding). The
            # shadow then carries the storage quantization error until
            # newly added rows refresh it.
            if dtype == "i4":
                from dawnsearch_tpu.ops.quant import unpack_i4_np
                # `codes` is in idx's row-block layout at this point
                # (migrated above if the snapshot was older)
                deq = (unpack_i4_np(codes, idx._i4_block)
                       .astype(np.float32) * scales[:, None])
            else:
                deq = codes.astype(np.float32)
                if dtype == "i8":
                    deq = deq * scales[:, None]
            idx._exact = jnp.asarray(deq.astype(np.float16))
        idx.count = count
        idx.capacity = (codes.shape[0] * 2 if dtype == "i4"
                        else codes.shape[0])
        return idx
