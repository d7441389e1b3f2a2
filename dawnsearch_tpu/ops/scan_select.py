"""Fused score+select Pallas kernel for exact/approx top-k search.

The TPU-native replacement for the reference's ANN query hot loop —
USearch's HNSW walk + BestResults accumulation
(/root/reference/src/search/search_provider.rs:214,
src/search/best_results.rs:44-79) — as one MXU scan (SURVEY §2.2 N1).

The XLA search path (index/flat.py::search_kernel) materializes the
(B, chunk) f32 score matrix in HBM for every chunk — at 1M rows and
batch 1024 that is ~4 GB of score traffic per batch, and the chunked
approx_min_k + merge scan costs more than the scoring matmul
(doc/performance.md "the selector, not the matmul, bounds exact
search"; measured 20 ms/batch -> ~51k QPS).

This kernel keeps scores IN VMEM for their whole life: per grid step it
scores a (TB, TN) tile on the MXU (s8xs8->s32 for i8 codes with
per-query i8 quantization, bf16 otherwise; scales folded back in f32)
and immediately reduces every W=128-row window to its (min, argmin)
with a packed-key integer min (window id in the low 7 mantissa bits of
the biased distance — no relayout, no second scan) — so HBM sees only
the i8 codes once (~0.4 GB) plus a (B, N/W) candidate array. Outside
the kernel, pairwise folds shrink the candidates to <=4096 columns and
an EXACT lax.top_k finishes. 141k QPS / 6.5 ms per 1024-query batch at
1M rows; the optimization trail is in doc/performance.md.

Accuracy: one candidate per W-row window is the same class of
approximation as lax.approx_min_k (which also reduces per 128-lane
block); two true top-k rows landing in one window shadow each other
with probability ~k^2·W/2N (~0.1% per query at k=10, W=128, N=1M) —
measured recall matches the approx_min_k path (tests; bench). The f32
oracle path (dtype="f32") keeps the exact XLA kernel.

Grid is fully parallel: (B tiles) x (N tiles), each step owning its
(TB, R) output block — no scratch, no sequential merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128          # rows per candidate window (the reduce granularity)
DEFAULT_TN = 16384  # index rows per grid step (TN/W = 128 lanes out)
DEFAULT_TB = 256    # queries per grid step (A/B'd vs 128: 5.9 vs 6.5 ms
#                     per 1024-query batch at 1M rows; small batches
#                     still downshift in search_select)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _select_kernel(q_ref, qscale_ref, codes_ref, scales_ref, count_ref,
                   vals_ref, ids_ref, *, has_scales: bool, qi8: bool):
    """One (TB, TN) score tile -> (TB, TN/W) window minima + argmins.

    Grid is (N tiles, B tiles) — N MAJOR — so the big codes block is
    DMA'd once and revisited by every query tile (B-major re-streamed
    the whole index per query tile: measured 3.2 GB vs 0.4 GB at 1M
    rows, batch 1024). Windows are STRIDED (window r = rows {r, R+r,
    2R+r, ...}): any partition into N/W groups is equally valid for a
    candidate-generating reduce, and this one puts the reduction on the
    sublane axis where the VPU is fast, instead of across lanes.

    qi8: queries arrive pre-quantized to i8 with a per-row scale, and
    the matmul runs s8xs8->s32 on the MXU — 2x the bf16 rate — with the
    two scales folded back in f32. The query quantization error
    (~0.4% of the row max per element) is the same order as the bf16
    query cast it replaces, and the stored-code i8 error dominates
    both; the default f32/f16 re-rank erases all three."""
    TB, D = q_ref.shape
    TN = codes_ref.shape[0]
    R = TN // W  # windows in this tile = output lanes
    ni = pl.program_id(0)
    base = ni * TN  # global row of codes_ref[0]

    if qi8:
        dots = jax.lax.dot_general(
            q_ref[...], codes_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)        # (TB, TN) s32
        scaled = dots.astype(jnp.float32) * qscale_ref[...]  # (TB, 1)
    else:
        x = codes_ref[...].astype(jnp.bfloat16)
        scaled = jax.lax.dot_general(
            q_ref[...].astype(jnp.bfloat16), x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (TB, TN)
    # d + 1 computed directly (bias folded into the subtract — one
    # fewer full-tile VPU pass); callers' d comes back from the -1.0
    # in the decode below. PRECONDITION: db > 0, i.e. dot < 2 — unit
    # queries against unit rows give |dot| <= ~1.05 with quant error.
    # Negative floats' bit patterns sort backwards under the integer
    # compare below, so non-unit queries would return confidently wrong
    # ids; the serving boundary enforces normalization
    # (SearchProvider.search_embeddings raises, matching the
    # reference's assert at search_provider.rs:206-208) — an in-kernel
    # clamp was measured at +0.9 ms/batch (14%) and rejected.
    if has_scales:
        db = 2.0 - scaled * scales_ref[...]          # scales (1, TN)
    else:
        db = 2.0 - scaled

    _mask_select_store(db, base, count_ref, vals_ref, ids_ref, TB, TN, R)


def _mask_select_store(db, base, count_ref, vals_ref, ids_ref,
                       TB: int, TN: int, R: int) -> None:
    """Shared kernel tail: count-mask + packed-key window argmin + store.

    Count masking every tile. (Tried: lax.cond-gating the mask to the
    one tile crossing `count` — it REGRESSED 6.5 -> 8.8 ms/batch;
    Mosaic's branch handling costs more than the three elementwise
    passes it saves.)

    Packed-key window argmin. The bit pattern of a POSITIVE f32 is
    order-preserving under integer compare, so bias d positive (+1;
    d >= -0.05 even with quant error), clear the low 7 mantissa bits
    (perturbs the value by < 3e-5 — far under i8 quantization error)
    and fold the window id w < W=128 into them: ONE integer min over
    static lane-block slices then yields value AND argmin together.
    This replaced a (TB, TN) -> (TB, W, R) reshape (a full cross-vreg
    relayout) + equality re-scan, which cost more than the scoring
    matmul itself (A/B in doc/performance.md).
    +inf survives: its bit pattern's low bits are already clear, and
    masked-key ints (0x7f8000xx) still compare above every real d."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, TN), 1) + base
    db = jnp.where(rows < count_ref[0], db, jnp.inf)

    keys = jax.lax.bitcast_convert_type(db, jnp.int32) & ~0x7F
    best = keys[:, :R]
    for w in range(1, W):
        best = jnp.minimum(best, keys[:, w * R:(w + 1) * R] | w)
    vals = jax.lax.bitcast_convert_type(best & ~0x7F, jnp.float32) - 1.0
    ids = base + (best & 0x7F) * R + \
        jax.lax.broadcasted_iota(jnp.int32, (TB, R), 1)
    vals_ref[...] = vals
    ids_ref[...] = jnp.where(jnp.isfinite(vals), ids, -1)


def _select_kernel_i4(q_ref, qscale_ref, codes_ref, scales_ref,
                      count_ref, vals_ref, ids_ref, lo_ref, hi_ref, *,
                      qi8: bool):
    """i4 variant: codes arrive nibble-PACKED (TN/2, D) uint8 in the
    row-block layout (ops/quant.py: one packing block == one grid tile;
    packed row p = logical rows base+p low nibble | base+TN/2+p high),
    so unpacking yields the tile's FIRST and SECOND row halves and the
    dot product is two full-dim matmuls whose outputs concatenate along
    lanes into natural row order — the window argmin / per-row scales /
    count mask are byte-identical to the i8 kernel (_mask_select_store).
    The lane dim stays D = 384 (a 128-multiple): the previous per-row
    dim-plane layout ((TN, 192)) forced a 1.33x padded relayout of the
    whole codes array in HBM — 8 GB of dead copy at 32M rows — because
    192 pads to 256 lanes (quant.py header, compile-only A/B round 4).
    The unpacked halves are CACHED in VMEM scratch: under the N-major
    grid the query-tile index is the inner loop, so the unpack (i32
    widen + shift + bias; Mosaic has no i8 vector subtract — arith.subi
    fails to legalize on the packed 8x128x4xi8 layout) runs once per
    codes block and every later query tile reuses it. The bi dimension
    is declared "arbitrary" (not "parallel") for exactly this carried
    scratch."""
    TB = q_ref.shape[0]
    TN = codes_ref.shape[0] * 2   # logical rows per tile (= one block)
    R = TN // W
    ni = pl.program_id(0)
    base = ni * TN

    @pl.when(pl.program_id(1) == 0)
    def _unpack():
        p = codes_ref[...].astype(jnp.int32)
        lo_ref[...] = ((p & 0xF) - 8).astype(jnp.int8)  # rows [0, TN/2)
        hi_ref[...] = ((p >> 4) - 8).astype(jnp.int8)   # rows [TN/2, TN)

    lo = lo_ref[...]
    hi = hi_ref[...]
    if qi8:
        q = q_ref[...]
        dots = jnp.concatenate(
            [jax.lax.dot_general(q, lo, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32),
             jax.lax.dot_general(q, hi, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)],
            axis=1)                                      # (TB, TN) natural
        scaled = dots.astype(jnp.float32) * qscale_ref[...]
    else:
        q = q_ref[...].astype(jnp.bfloat16)
        scaled = jnp.concatenate(
            [jax.lax.dot_general(q, lo.astype(jnp.bfloat16),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32),
             jax.lax.dot_general(q, hi.astype(jnp.bfloat16),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)],
            axis=1)
    db = 2.0 - scaled * scales_ref[...]
    _mask_select_store(db, base, count_ref, vals_ref, ids_ref, TB, TN, R)


@functools.partial(jax.jit, static_argnames=("tb", "tn", "qi8"))
def _candidates_i4(codes: jax.Array, scales: jax.Array, q: jax.Array,
                   count: jax.Array, tb: int, tn: int, qi8: bool = True
                   ) -> tuple[jax.Array, jax.Array]:
    """i4 twin of _candidates: codes are (N/2, D) row-block packed uint8
    with block == tn (ops/quant.py I4_BLOCK; supports() pins tn for
    i4). Same N-major grid, output blocks, and count contract as
    _candidates."""
    B, D = q.shape
    N = codes.shape[0] * 2        # logical rows
    R = tn // W
    if qi8:
        qmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                           1e-30)
        qs = qmax / 127.0                                # (B, 1) f32
        qq = jnp.round(q / qs).astype(jnp.int8)
    else:
        qs = jnp.ones((B, 1), jnp.float32)
        qq = q.astype(jnp.float32)
    vals, ids = pl.pallas_call(
        functools.partial(_select_kernel_i4, qi8=qi8),
        out_shape=(jax.ShapeDtypeStruct((B, N // W), jnp.float32),
                   jax.ShapeDtypeStruct((B, N // W), jnp.int32)),
        grid=(N // tn, B // tb),   # N MAJOR: codes DMA'd once, revisited
        in_specs=[
            pl.BlockSpec((tb, D), lambda ni, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda ni, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn // 2, D), lambda ni, bi: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, bi: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, R), lambda ni, bi: (bi, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, R), lambda ni, bi: (bi, ni),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((tn // 2, D), jnp.int8),
                        pltpu.VMEM((tn // 2, D), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            # bi must iterate in order: the unpacked-plane scratch is
            # written at bi == 0 and read by every later query tile.
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=_interpret(),
    )(qq, qs, codes, scales[None, :],
      count.reshape(1).astype(jnp.int32))
    return vals, ids


@functools.partial(jax.jit, static_argnames=("tb", "tn", "qi8"))
def _candidates(codes: jax.Array, scales: jax.Array | None, q: jax.Array,
                count: jax.Array, tb: int, tn: int, qi8: bool = False
                ) -> tuple[jax.Array, jax.Array]:
    B = q.shape[0]
    N = codes.shape[0]
    R = tn // W
    has_scales = scales is not None
    # scale-less (bf16) indexes pass a (1, tn) dummy on a constant
    # index_map — a (1, N) dummy would stream O(N) zeros per search
    sc = scales[None, :] if has_scales else jnp.zeros((1, tn), jnp.float32)
    sc_spec = (pl.BlockSpec((1, tn), lambda ni, bi: (0, ni),
                            memory_space=pltpu.VMEM) if has_scales
               else pl.BlockSpec((1, tn), lambda ni, bi: (0, 0),
                                 memory_space=pltpu.VMEM))
    if qi8:
        # per-row i8 quantization of the queries (s8xs8->s32 MXU path);
        # zero rows (batch padding) quantize to all-zero codes
        qmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                           1e-30)
        qs = qmax / 127.0                                # (B, 1) f32
        qq = jnp.round(q / qs).astype(jnp.int8)
    else:
        qs = jnp.ones((B, 1), jnp.float32)
        qq = q.astype(jnp.float32)
    vals, ids = pl.pallas_call(
        functools.partial(_select_kernel, has_scales=has_scales, qi8=qi8),
        out_shape=(jax.ShapeDtypeStruct((B, N // W), jnp.float32),
                   jax.ShapeDtypeStruct((B, N // W), jnp.int32)),
        grid=(N // tn, B // tb),   # N MAJOR: codes DMA'd once, revisited
        in_specs=[
            pl.BlockSpec((tb, q.shape[1]), lambda ni, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda ni, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, codes.shape[1]), lambda ni, bi: (ni, 0),
                         memory_space=pltpu.VMEM),
            sc_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, R), lambda ni, bi: (bi, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, R), lambda ni, bi: (bi, ni),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(qq, qs, codes, sc, count.reshape(1).astype(jnp.int32))
    return vals, ids


def supports(capacity: int, dim: int, dtype: str,
             tn: int = DEFAULT_TN) -> bool:
    """Shapes the fused kernel handles; callers fall back to the XLA
    chunked scan otherwise. f32 keeps the exact-oracle XLA path.
    tn must be a multiple of W*128: each grid step emits tn/W output
    LANES, and Mosaic requires 128-lane blocks (measured: tn=8192
    fails lowering with R=64). `dim` is the LOGICAL dim for every
    dtype. i4 codes are row-block packed ((N/2, D) uint8, ops/quant.py)
    with one packing block per grid tile, so i4 additionally pins
    tn == I4_BLOCK — callers must guarantee their codes were packed
    with that block (index constructors align segment to it or stay on
    the XLA path; i4_block_for)."""
    if dtype == "i4":
        from dawnsearch_tpu.ops.quant import I4_BLOCK
        if tn != I4_BLOCK:
            return False
    return (dtype in ("i8", "bf16", "i4") and capacity % tn == 0
            and capacity >= tn and dim % 128 == 0
            and tn % (W * 128) == 0)


# The windowed-candidate approximation needs count >> k*W (shadowing
# odds ~k^2*W/2N); below this the XLA chunked path is already fast.
MIN_ROWS = 262_144

# s8xs8 MXU scoring for i8 indexes (search_select(qi8=...) overrides):
# measured 6.5 -> 5.9 ms/batch at 1M rows with recall unchanged
# (doc/performance.md).
QI8_DEFAULT = True


def eligible(count: int, capacity: int, dim: int, dtype: str,
             selector: str = "auto", min_rows: int = MIN_ROWS) -> bool:
    """THE serving-default gate, shared by FlatIndex, ShardedFlatIndex,
    the fused query program, and the benchmarks — one predicate so the
    benches always measure exactly what serving runs."""
    return (selector in ("fused", "auto") and count >= min_rows
            and supports(capacity, dim, dtype))


def search_select(codes: jax.Array, scales: jax.Array | None,
                  queries: jax.Array, count: jax.Array, k: int,
                  tb: int = DEFAULT_TB, tn: int = DEFAULT_TN,
                  qi8: bool | None = None
                  ) -> tuple[jax.Array, jax.Array]:
    """(B, D) queries vs (N, D) codes -> (B, k) dists asc + global ids.

    Pads the batch up to a tile multiple; invalid slots come back
    (+inf, -1) like search_kernel. qi8 quantizes queries per-row to i8
    so scoring runs on the MXU's s8xs8->s32 path at 2x the bf16 rate;
    QI8_DEFAULT gates it for i8 codes (see doc/performance.md for the
    measured A/B before flipping it)."""
    B = queries.shape[0]
    i4 = codes.dtype == jnp.uint8  # row-block packed (N/2, D) storage
    N = codes.shape[0] * 2 if i4 else codes.shape[0]  # logical rows
    D = codes.shape[1]
    if N % tn != 0 or D % 128 != 0 or tn % (W * 128) != 0:
        # A non-multiple capacity would floor-truncate the grid AND
        # leave N//W - grid*R output columns uninitialized — garbage
        # that silently steals top-k slots (observed as recall 0.77 on
        # a capacity-1e6 index). FlatIndex allocates segment multiples;
        # direct callers must too (see supports()).
        raise ValueError(
            f"search_select needs capacity % {tn} == 0 and dim % 128 == 0,"
            f" got codes {codes.shape}; pad the buffer (see supports())")
    if i4:
        from dawnsearch_tpu.ops.quant import I4_BLOCK
        if tn != I4_BLOCK:
            # the kernel reads one packing block per grid tile; any
            # other tn would silently permute rows (see supports())
            raise ValueError(
                f"i4 codes are block-packed with block={I4_BLOCK}; "
                f"search_select needs tn == {I4_BLOCK}, got {tn}")
    if qi8 is None:
        qi8 = QI8_DEFAULT and (codes.dtype == jnp.int8 or i4)
    tb = min(tb, max(8, 1 << (B - 1).bit_length()))  # small batches
    padded = -(-B // tb) * tb
    q = queries.astype(jnp.float32)
    if padded != B:
        q = jnp.pad(q, ((0, padded - B), (0, 0)))
    if i4:
        vals, ids = _candidates_i4(codes, scales, q, count, tb, tn, qi8=qi8)
    else:
        vals, ids = _candidates(codes, scales, q, count, tb, tn, qi8=qi8)
    # The candidate array is N/W columns — linear in N, so the final
    # top_k would re-create the selector bottleneck (measured 0.6
    # ms/batch of the 6.5 at 1M rows). Fold pairwise (min + id select,
    # pure XLA elementwise) down to 4096 columns; each fold doubles the
    # effective window, so stop at 1024 effective rows per candidate —
    # the recall floor (shadowing odds ~k^2*W_eff/2N: 0.13%/query at
    # 1M rows / W_eff 256; 0.3% at 16M / W_eff 1024, measured recall
    # 0.981 raw). Pairs are (column j, column j+C/2) — contiguous HALF
    # slices, not a (B, C/2, 2) reshape: any partition into pairs is an
    # equally valid window merge on this windowed candidate set, and
    # the reshape's pair-minor layout made XLA materialize a full
    # relayout copy of the ids array (1 GB HLO temp per fold at 64M
    # rows, batch 512 — the allocation that pushed the 64M tier 3 MB
    # over HBM in the round-4 acceptance run).
    eff_w = W
    while vals.shape[1] > 4096 and eff_w < 1024:
        eff_w *= 2
        half = vals.shape[1] // 2
        left = vals[:, :half] <= vals[:, half:]
        vals = jnp.where(left, vals[:, :half], vals[:, half:])
        ids = jnp.where(left, ids[:, :half], ids[:, half:])
    k_eff = min(k, vals.shape[1])
    neg, sel = jax.lax.top_k(-vals, k_eff)
    d = -neg
    i = jnp.take_along_axis(ids, sel, axis=1)
    i = jnp.where(jnp.isfinite(d), i, -1)
    if k_eff < k:
        d = jnp.pad(d, ((0, 0), (0, k - k_eff)), constant_values=jnp.inf)
        i = jnp.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return d[:B], i[:B]
