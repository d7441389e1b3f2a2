"""FusedQueryPath: text -> embedding -> top-k in ONE device program.

The split pipeline pays two dispatches per query round (encoder, then
index search). Fusing them into one jitted program halves the per-round
dispatch count — the dominant cost at interactive batch sizes — and
XLA overlaps the index scan's first chunk with the encoder's tail.
This is SURVEY.md §7 step 6's "embed→search pipeline on device" in its
final form.

Only exact FlatIndex-backed providers qualify (the index buffers are
plain program arguments; identity changes after add() just re-feed the
same compiled program as long as shapes hold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dawnsearch_tpu.index.flat import FlatIndex, rerank_kernel, search_kernel
from dawnsearch_tpu.models.bert import encode_batch
from dawnsearch_tpu.utils.logging import METRICS


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mask_padding", "include_padding", "k", "chunk",
                     "approx", "kf", "fused_sel", "i4_block"))
def _fused_program(params, input_ids, mask, codes, scales, count, *,
                   cfg, mask_padding, include_padding, k, chunk, approx,
                   kf=None, exact=None, fused_sel=False,
                   i4_block: int | None = None):
    emb = encode_batch(params, input_ids, mask, cfg=cfg,
                       mask_padding=mask_padding,
                       include_padding=include_padding)
    if fused_sel:  # Pallas score+select (ops/scan_select.py)
        from dawnsearch_tpu.ops.scan_select import search_select
        d, i = search_select(codes, scales, emb, count, kf or k)
    else:
        d, i = search_kernel(codes, scales, emb, count, kf or k, chunk,
                             approx=approx, i4_block=i4_block)
    if exact is not None:  # device-side f16 re-rank, same program
        d, i = rerank_kernel(exact, emb, d, i, k)
    return emb, d, i


class FusedQueryPath:
    """Batched text search against a FlatIndex in one dispatch."""

    def __init__(self, encoder, index: FlatIndex):
        self.encoder = encoder
        self.index = index

    @staticmethod
    def supports(index) -> bool:
        return isinstance(index, FlatIndex)

    def dispatch(self, texts: list[str], k: int
                 ) -> tuple[jax.Array, jax.Array, jax.Array, int]:
        """Enqueue the fused program; returns DEVICE arrays + k_eff
        without blocking on execution. Caller must hold the device-state
        lock for the duration of this call (the program reads the live
        index buffer references, which a concurrent donating ingest
        would invalidate) and run finalize() OUTSIDE it — the readback
        is where the execution wait happens, and holding the lock
        across it is what produced the p99 3.5 s query tail under
        concurrent ingest (doc/performance.md)."""
        enc = self.encoder
        ids_list = enc.tokenize_texts(texts)
        input_ids, mask = enc.pad_batch(ids_list)
        ix = self.index
        k_eff = min(k, ix.capacity)
        approx = (ix.selector == "approx"
                  or (ix.selector == "auto" and ix.dtype != "f32"))
        kf = ix.device_fetch_width(k_eff) if ix.device_rerank else None
        from dawnsearch_tpu.ops import scan_select
        fused_sel = (scan_select.eligible(ix.count, ix.capacity, ix.dim,
                                          ix.dtype, ix.selector,
                                          ix.fused_min_rows)
                     and (ix.dtype != "i4"
                          or ix._i4_block == scan_select.DEFAULT_TN))
        with METRICS.timer("fused_query_dispatch"):
            emb, d, i = _fused_program(
                enc.params, jnp.asarray(input_ids), jnp.asarray(mask),
                ix._codes, ix._scales, jnp.int32(ix.count),
                cfg=enc.cfg, mask_padding=enc.mask_padding,
                include_padding=enc.include_padding_in_pool,
                k=k_eff, chunk=ix.chunk, approx=approx,
                kf=kf, exact=ix._exact, fused_sel=fused_sel,
                i4_block=ix._i4_block)
        return emb, d, i, k_eff

    @staticmethod
    def finalize(emb, d, i, n: int, k: int, k_eff: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Block on the dispatched program and shape the host results."""
        emb, d, i = np.asarray(emb), np.asarray(d), np.asarray(i)
        if k_eff < k:
            d = np.pad(d, ((0, 0), (0, k - k_eff)), constant_values=np.inf)
            i = np.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return emb[:n], d[:n, :k], i[:n, :k]

    def search_texts(self, texts: list[str], k: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (embeddings (N, H), distances (N, k), row ids (N, k)).
        Synchronous wrapper; concurrent servers use dispatch/finalize."""
        with METRICS.timer("fused_query"):
            emb, d, i, k_eff = self.dispatch(texts, k)
            return self.finalize(emb, d, i, len(texts), k, k_eff)


def _quantize_rows(emb, qdtype: str):
    """In-program storage quantizer for the fused ingest paths: i8
    (index/flat.py) or i4 biased nibble VALUES (ops/quant.py — the
    row-block packing is position-dependent and happens at the write,
    write_rows_i4 / blend_rows_i4)."""
    if qdtype == "i4":
        from dawnsearch_tpu.ops.quant import quantize_i4_vals
        return quantize_i4_vals(emb)
    from dawnsearch_tpu.index.flat import _quantize_rows_i8
    return _quantize_rows_i8(emb)


def _write_codes(codes, qcodes, count, qdtype: str, i4_block):
    """dynamic_update_slice for i8/bf16 codes; the row-block
    read-modify-write for i4 (ops/quant.write_rows_i4, traced count)."""
    if qdtype == "i4":
        from dawnsearch_tpu.ops.quant import write_rows_i4
        return write_rows_i4(codes, qcodes, count, i4_block)
    return jax.lax.dynamic_update_slice(codes, qcodes, (count, 0))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mask_padding", "include_padding", "qdtype",
                     "i4_block"),
    donate_argnums=(3, 4))
def _fused_ingest_program(params, input_ids, mask, codes, scales, count, *,
                          cfg, mask_padding, include_padding,
                          qdtype: str = "i8", i4_block: int | None = None):
    """encode -> i8/i4 quantize -> write into the (donated) index buffers
    at row offset `count`. Rows beyond the caller's valid n are scratch:
    they sit past `count + n`, are masked out of every search, and the
    next insert overwrites them."""
    emb = encode_batch(params, input_ids, mask, cfg=cfg,
                       mask_padding=mask_padding,
                       include_padding=include_padding)
    qcodes, qscales = _quantize_rows(emb, qdtype)
    codes = _write_codes(codes, qcodes, count, qdtype, i4_block)
    scales = jax.lax.dynamic_update_slice(scales, qscales, (count,))
    return codes, scales, emb


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mask_padding", "include_padding", "qdtype",
                     "i4_block"),
    donate_argnums=(3, 4, 5))
def _fused_ingest_program_exact(params, input_ids, mask, codes, scales,
                                exact, count, *, cfg, mask_padding,
                                include_padding, qdtype: str = "i8",
                                i4_block: int | None = None):
    """_fused_ingest_program + the f16 shadow write (device re-rank)."""
    emb = encode_batch(params, input_ids, mask, cfg=cfg,
                       mask_padding=mask_padding,
                       include_padding=include_padding)
    qcodes, qscales = _quantize_rows(emb, qdtype)
    codes = _write_codes(codes, qcodes, count, qdtype, i4_block)
    scales = jax.lax.dynamic_update_slice(scales, qscales, (count,))
    exact = jax.lax.dynamic_update_slice(
        exact, emb.astype(jnp.float16), (count, 0))
    return codes, scales, exact, emb


def _chunk_by_bucket(ingest_fn, encoder, texts, token_ids):
    """Split a batch at the encoder's largest batch bucket and recurse
    through `ingest_fn` — any caller-chosen ingest batch size is safe
    regardless of the bucket grid. Returns None when no split needed."""
    maxb = getattr(encoder, "batch_buckets", [len(texts)])[-1]
    if len(texts) <= maxb:
        return None
    outs = []
    for s in range(0, len(texts), maxb):
        tk = token_ids[s:s + maxb] if token_ids is not None else None
        outs.append(ingest_fn(texts[s:s + maxb], token_ids=tk))
    return np.concatenate(outs)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "mask_padding", "include_padding",
                     "has_exact", "qdtype", "i4_block"),
    donate_argnums=(3, 4, 5, 6))
def _sharded_fused_ingest_program(params, input_ids, mask, codes, scales,
                                  exact, idsbuf, sel, uids, nvalid, starts,
                                  *, mesh, cfg, mask_padding,
                                  include_padding, has_exact,
                                  qdtype: str = "i8",
                                  i4_block: int | None = None):
    """encode -> i8 quantize -> every shard blend-writes its slice at
    its own offset, ONE program over the mesh. The per-shard row
    assignment (`sel`, from ShardedFlatIndex._plan_insert) is
    host-computed; the embeddings are replicated and each device
    gathers only its rows. Block rows past a shard's fill (nvalid[s])
    keep the old buffer contents — a full shard participates as a
    no-op, so near max_capacity the batch still lands on shards with
    room (round-2 advisor finding)."""
    from jax.sharding import PartitionSpec as P

    from dawnsearch_tpu.parallel.sharded_index import AXIS, _blend_write

    emb = encode_batch(params, input_ids, mask, cfg=cfg,
                       mask_padding=mask_padding,
                       include_padding=include_padding)
    qcodes, qscales = _quantize_rows(emb, qdtype)
    f16 = (emb.astype(jnp.float16) if has_exact
           else jnp.zeros((), jnp.float16))

    def local(codes_blk, scales_blk, exact_blk, ids_blk, sel_blk, uid_blk,
              nv, start, qc, qs, fx):
        cap = ids_blk.shape[1]   # LOGICAL rows (i4 codes pack 2/row)
        idx = sel_blk[0]                              # (maxb,)
        mr = idx.shape[0]
        s = jnp.minimum(start[0], cap - mr)
        shift = start[0] - s
        iota = jnp.arange(mr, dtype=jnp.int32)
        m = (iota >= shift) & (iota < shift + nv[0])
        if qdtype == "i4":
            from dawnsearch_tpu.ops.quant import blend_rows_i4
            codes_out = blend_rows_i4(codes_blk[0], qc[idx], shift, s, m,
                                      i4_block)[None]
        else:
            codes_out = _blend_write(codes_blk, qc[idx][None], shift, s, m)
        scales_out = _blend_write(scales_blk, qs[idx][None], shift, s, m)
        ids_out = _blend_write(ids_blk, uid_blk, shift, s, m)
        if has_exact:
            exact_out = _blend_write(exact_blk, fx[idx][None], shift, s, m)
        else:
            exact_out = exact_blk
        return codes_out, scales_out, exact_out, ids_out

    exact_spec = P(AXIS, None, None) if has_exact else P()
    f16_spec = P(None, None) if has_exact else P()
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None), exact_spec,
                  P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS),
                  P(AXIS), P(None, None), P(None), f16_spec),
        out_specs=(P(AXIS, None, None), P(AXIS, None), exact_spec,
                   P(AXIS, None)),
        check_vma=False,
    )(codes, scales, exact, idsbuf, sel, uids, nvalid, starts,
      qcodes, qscales, f16)
    return out, emb


class ShardedFusedIngestPath:
    """Batched page ingest against a quantized (i8/i4) ShardedFlatIndex in one
    dispatch — the multi-chip twin of FusedIngestPath (the SPMD
    replacement for the reference's one-page-at-a-time insert,
    search_service.rs:158-181, on a sharded engine)."""

    def __init__(self, encoder, index):
        self.encoder = encoder
        self.index = index

    @staticmethod
    def supports(index) -> bool:
        from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
        return (isinstance(index, ShardedFlatIndex)
                and index.dtype in ("i8", "i4"))

    @property
    def max_batch(self) -> int | None:
        buckets = getattr(self.encoder, "batch_buckets", None)
        return buckets[-1] if buckets else None

    def dispatch(self, texts: list[str],
                 token_ids: list[list[int]] | None = None) -> jax.Array:
        """Enqueue one bucket-sized sharded ingest program; see
        FusedIngestPath.dispatch for the locking contract."""
        enc = self.encoder
        ix = self.index
        n = len(texts)
        ids_list = (token_ids if token_ids is not None
                    else enc.tokenize_texts(texts))
        input_ids, mask = enc.pad_batch(ids_list)
        # _plan_insert grows shards as needed and, at max_capacity,
        # re-plans within each shard's remaining room (blend writes make
        # full shards no-ops); it raises only when the index is
        # genuinely full (fewer free slots than rows).
        per_shard, max_rows = ix._plan_insert(n)
        uids = np.arange(ix._next_id, ix._next_id + n, dtype=np.int64)
        S = ix.n_shards
        sel = np.zeros((S, max_rows), np.int32)
        uid_blocks = np.full((S, max_rows), -1, np.int32)
        starts = np.zeros((S,), np.int32)
        for s in range(S):
            rows = per_shard[s]
            starts[s] = ix._counts[s]
            if len(rows):
                sel[s, : len(rows)] = rows
                uid_blocks[s, : len(rows)] = uids[rows]
        with METRICS.timer("fused_ingest_dispatch"):
            (ix._codes, ix._scales, ix._exact, ix._ids), emb = \
                _sharded_fused_ingest_program(
                    enc.params, jnp.asarray(input_ids), jnp.asarray(mask),
                    ix._codes, ix._scales, ix._exact, ix._ids,
                    jax.device_put(jnp.asarray(sel), ix._shard2),
                    jax.device_put(jnp.asarray(uid_blocks), ix._shard2),
                    jax.device_put(jnp.asarray(
                        [len(p) for p in per_shard], dtype=jnp.int32),
                        ix._shard1),
                    jax.device_put(jnp.asarray(starts), ix._shard1),
                    mesh=ix.mesh, cfg=enc.cfg,
                    mask_padding=enc.mask_padding,
                    include_padding=enc.include_padding_in_pool,
                    has_exact=ix.exact is not None, qdtype=ix.dtype,
                    i4_block=getattr(ix, "_i4_block", None))
        for s in range(S):
            ix._counts[s] += len(per_shard[s])
        ix._next_id = int(uids[-1]) + 1
        return emb

    def ingest(self, texts: list[str],
               token_ids: list[list[int]] | None = None) -> np.ndarray:
        """Embed + stripe-append `texts` across shards; returns (n, H)
        f32 embeddings for durable storage. Caller must hold the
        provider lock (buffer donation is not reentrant)."""
        chunked = _chunk_by_bucket(self.ingest, self.encoder, texts,
                                   token_ids)
        if chunked is not None:
            return chunked
        with METRICS.timer("fused_ingest"):
            emb = np.asarray(self.dispatch(texts, token_ids=token_ids))
        return emb[: len(texts)]


class FusedIngestPath:
    """Batched page ingest against a quantized (i8/i4) FlatIndex in one
    dispatch."""

    def __init__(self, encoder, index: FlatIndex):
        self.encoder = encoder
        self.index = index

    @staticmethod
    def supports(index) -> bool:
        return isinstance(index, FlatIndex) and index.dtype in ("i8", "i4")

    @property
    def max_batch(self) -> int | None:
        """Largest batch dispatch() accepts (the encoder's top batch
        bucket); None = unbounded. Serving loops sub-batch at this size
        so searches can interleave between ingest dispatches."""
        buckets = getattr(self.encoder, "batch_buckets", None)
        return buckets[-1] if buckets else None

    def dispatch(self, texts: list[str],
                 token_ids: list[list[int]] | None = None) -> jax.Array:
        """Enqueue encode + quantize + index-write for one bucket-sized
        batch (len(texts) <= max_batch); bumps count and swaps buffer
        references, returning the (padded) DEVICE embeddings without
        blocking on execution. Caller must hold the device-state lock
        for this call (buffer donation invalidates the old references)
        and read the result back outside it."""
        enc = self.encoder
        ids_list = (token_ids if token_ids is not None
                    else enc.tokenize_texts(texts))
        input_ids, mask = enc.pad_batch(ids_list)
        ix = self.index
        n = len(texts)
        bsz = input_ids.shape[0]
        if ix.max_capacity is not None:
            # Scratch rows (batch padding past n) must also fit in the
            # buffer. Near max_capacity a legitimate n-page insert can
            # need count+bsz > the growable ceiling — fall back to the
            # split path (encode, then add only the n valid rows) rather
            # than fail a batch that fits.
            ceiling = -(-ix.max_capacity // ix.segment) * ix.segment
            if ix.count + bsz > ceiling and ix.count + n <= ix.max_capacity:
                emb = np.asarray(enc.encode_tokenized(ids_list), np.float32)
                ix.add(emb)
                return emb
        if ix.count + bsz > ix.capacity:  # reserve scratch rows too
            ix._grow_to(ix.count + bsz)
        with METRICS.timer("fused_ingest_dispatch"):
            if ix.device_rerank:
                ix._codes, ix._scales, ix._exact, emb = \
                    _fused_ingest_program_exact(
                        enc.params, jnp.asarray(input_ids),
                        jnp.asarray(mask), ix._codes, ix._scales,
                        ix._exact, jnp.int32(ix.count),
                        cfg=enc.cfg, mask_padding=enc.mask_padding,
                        include_padding=enc.include_padding_in_pool,
                        qdtype=ix.dtype, i4_block=ix._i4_block)
            else:
                ix._codes, ix._scales, emb = _fused_ingest_program(
                    enc.params, jnp.asarray(input_ids), jnp.asarray(mask),
                    ix._codes, ix._scales, jnp.int32(ix.count),
                    cfg=enc.cfg, mask_padding=enc.mask_padding,
                    include_padding=enc.include_padding_in_pool,
                    qdtype=ix.dtype, i4_block=ix._i4_block)
        ix.count += n
        return emb

    def ingest(self, texts: list[str],
               token_ids: list[list[int]] | None = None) -> np.ndarray:
        """Embed + append `texts` to the index; returns (n, H) f32
        embeddings for durable storage. Caller must hold the provider
        lock (buffer donation is not reentrant). `token_ids` (one list
        per text, from encoder.tokenize_texts) skips tokenization —
        the ingest pipeline computes it on a separate thread."""
        enc = self.encoder
        chunked = _chunk_by_bucket(self.ingest, enc, texts, token_ids)
        if chunked is not None:
            return chunked
        with METRICS.timer("fused_ingest"):
            emb = np.asarray(self.dispatch(texts, token_ids=token_ids))
        return emb[: len(texts)]
