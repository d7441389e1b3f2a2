"""ShardedFlatIndex: device-parallel exact search over a Mesh.

The in-pod replacement for the reference's peer fan-out: where DawnSearch
broadcasts a query datagram to every peer and merges Page replies on the
host (udp_service.rs:297-330, search_service.rs:213-276), here every
device owns a disjoint row shard, scores it locally under `shard_map`,
and the merge is `lax.top_k` over an `all_gather` of (distances, ids)
riding ICI — one XLA program, no host round-trips.

Layout:
- codes  (S, cap, D)  P("shard", None, None)   vector data (f32/bf16/i8;
                                               i4 packs D/2 bytes per row)
- scales (S, cap)     P("shard", None)         i8 per-row scales
- exact  (S, cap, D)  P("shard", None, None)   optional f16 shadow (re-rank)
- ids    (S, cap)     P("shard", None)         user ids, gathered at search
- counts (S,)         P("shard")               valid rows per shard

With `exact="f16"`, each shard re-ranks its local candidates from its
own f16 shadow BEFORE the gather (index/flat.py rerank_kernel), so the
merged global top-k is exact-ordered and only k rows per shard ever
cross ICI — the re-rank adds no collective traffic.

User ids live device-side so results need no host-side remapping and
stay stable across capacity growth. Inserts are host-coordinated,
balance-striped to the least-full shards, then written with one
shard_map dynamic-update (each device writes at its own offset).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dawnsearch_tpu.index.flat import (
    DEFAULT_CHUNK, DEFAULT_SEGMENT, IndexFull, rerank_kernel, search_kernel)
from dawnsearch_tpu.ops.vector import EM_LEN
from dawnsearch_tpu.parallel.mesh import make_mesh

AXIS = "shard"


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pow2(n: int, lo: int = 8) -> int:
    """Next power of two >= n (>= lo): bounds jit'd block shapes to
    O(log max_batch) distinct compiles (see _prepare_add)."""
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


@functools.partial(
    jax.jit,
    static_argnames=("k", "kf", "chunk", "mesh", "has_scales", "has_exact",
                     "approx", "dp_axis", "fused_sel", "i4_block"))
def _sharded_search(codes, scales, exact, ids, counts, queries, *, k: int,
                    kf: int, chunk: int, mesh: Mesh, has_scales: bool,
                    has_exact: bool, approx: bool = False,
                    dp_axis: str | None = None, fused_sel: bool = False,
                    i4_block: int | None = None):
    """Queries -> merged (distances, user ids).

    Rows shard over AXIS ("shard"); the merge is lax.top_k over an
    all_gather along it (ICI). With `dp_axis` set (a second mesh axis),
    the query batch ALSO shards over that axis — each dp group scans
    the same row shards for its slice of queries, multiplying QPS by
    the dp degree. Without it queries are replicated. With `has_exact`,
    each shard scans for kf >= k candidates and re-ranks them locally
    from its f16 shadow before gathering only k."""

    def local(codes_blk, scales_blk, exact_blk, ids_blk, counts_blk, q):
        cap = ids_blk.shape[1]   # LOGICAL rows (i4 codes pack 2/row)
        B = q.shape[0]
        sc = scales_blk[0] if has_scales else None
        if fused_sel:  # Pallas score+select per shard (ops/scan_select.py)
            from dawnsearch_tpu.ops.scan_select import search_select
            d, i = search_select(codes_blk[0], sc, q, counts_blk[0], kf)
        else:
            d, i = search_kernel(codes_blk[0], sc, q, counts_blk[0], kf,
                                 chunk, approx=approx, i4_block=i4_block)
        if has_exact:
            d, i = rerank_kernel(exact_blk[0], q, d, i, k)
        safe = jnp.clip(i, 0, cap - 1)
        uid = jnp.where(i >= 0, ids_blk[0][safe], -1)
        all_d = jax.lax.all_gather(d, AXIS)  # (S, B, k)
        all_u = jax.lax.all_gather(uid, AXIS)
        S = all_d.shape[0]
        all_d = jnp.transpose(all_d, (1, 0, 2)).reshape(B, S * k)
        all_u = jnp.transpose(all_u, (1, 0, 2)).reshape(B, S * k)
        neg, sel = jax.lax.top_k(-all_d, k)
        return -neg, jnp.take_along_axis(all_u, sel, axis=1)

    scales_spec = P(AXIS, None) if has_scales else P()
    exact_spec = P(AXIS, None, None) if has_exact else P()
    q_spec = P(dp_axis, None) if dp_axis else P(None, None)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), scales_spec, exact_spec,
                  P(AXIS, None), P(AXIS), q_spec),
        out_specs=(q_spec, q_spec),
        check_vma=False,
    )(codes, scales, exact, ids, counts, queries)


def _blend_write(buf, new, shift, s, mask):
    """Write `new` (1, mr, ...) into `buf` (1, cap, ...) at clamped
    offset `s`, rolled down by `shift`, keeping old contents where
    `mask` is False. Full shards (mask all-False) are no-ops, so a
    write block never needs scratch room past the shard's capacity —
    the per-shard capacity constraint is counts[s] + adds[s] <= cap,
    not counts.max() + max_rows <= cap (round-2 advisor, fused.py:238)."""
    new = jnp.roll(new, shift, axis=1)
    zeros = (0,) * (buf.ndim - 2)
    old = jax.lax.dynamic_slice(buf, (0, s) + zeros, new.shape)
    m = mask.reshape((1, mask.shape[0]) + (1,) * (buf.ndim - 2))
    return jax.lax.dynamic_update_slice(
        buf, jnp.where(m, new, old), (0, s) + zeros)


@functools.partial(jax.jit, static_argnames=("mesh", "has_scales",
                                             "has_exact", "i4_block"),
                   donate_argnums=(0, 1, 2, 3))
def _sharded_write(codes, scales, exact, ids, row_blocks, scale_blocks,
                   exact_blocks, id_blocks, nvalid, starts, *, mesh: Mesh,
                   has_scales: bool, has_exact: bool,
                   i4_block: int | None = None):
    """Each shard blend-writes its first nvalid[s] block rows at its own
    row offset; rows past nvalid[s] (block padding) leave the buffer
    untouched, so a full shard participates as a no-op. i4 row blocks
    arrive as biased nibble VALUES and repack into the shard-local
    row-block layout inside the write (ops/quant.blend_rows_i4)."""

    def local(codes_blk, scales_blk, exact_blk, ids_blk, rows, scs, exs,
              uids, nv, start):
        cap = ids_blk.shape[1]   # LOGICAL rows (i4 codes pack 2/row)
        mr = rows.shape[1]
        s = jnp.minimum(start[0], cap - mr)  # caller guarantees mr <= cap
        shift = start[0] - s
        iota = jnp.arange(mr, dtype=jnp.int32)
        mask = (iota >= shift) & (iota < shift + nv[0])
        if i4_block is not None:
            from dawnsearch_tpu.ops.quant import blend_rows_i4
            codes_out = blend_rows_i4(codes_blk[0], rows[0], shift, s,
                                      mask, i4_block)[None]
        else:
            codes_out = _blend_write(codes_blk, rows, shift, s, mask)
        ids_out = _blend_write(ids_blk, uids, shift, s, mask)
        scales_out = (_blend_write(scales_blk, scs, shift, s, mask)
                      if has_scales else scales_blk)
        exact_out = (_blend_write(exact_blk, exs, shift, s, mask)
                     if has_exact else exact_blk)
        return codes_out, scales_out, exact_out, ids_out

    scales_spec = P(AXIS, None) if has_scales else P()
    exact_spec = P(AXIS, None, None) if has_exact else P()
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS, None, None), scales_spec, exact_spec,
                  P(AXIS, None), P(AXIS, None, None), scales_spec,
                  exact_spec, P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS, None, None), scales_spec, exact_spec,
                   P(AXIS, None)),
        check_vma=False,
    )(codes, scales, exact, ids, row_blocks, scale_blocks, exact_blocks,
      id_blocks, nvalid, starts)


class ShardedFlatIndex:
    """Exact index sharded over a mesh axis "shard". API mirrors FlatIndex
    but ids are user-assigned (default: global insertion order)."""

    def __init__(
        self,
        mesh: Mesh | None = None,
        dim: int = EM_LEN,
        dtype: str = "i8",
        capacity_per_shard: int = DEFAULT_SEGMENT,
        segment: int = DEFAULT_SEGMENT,
        chunk: int = DEFAULT_CHUNK,
        max_capacity: int | None = None,
        dp_axis: str | None = None,
        exact: str | None = None,
        rerank_extra: int = 30,
    ):
        if dtype not in ("f32", "bf16", "i8", "i4"):
            raise ValueError(f"unsupported dtype {dtype}")
        if dtype == "i4" and dim % 2:
            raise ValueError("i4 nibble packing needs an even dim")
        if exact not in (None, "f16"):
            raise ValueError(f"unsupported exact dtype {exact}")
        if exact and dtype == "f32":
            raise ValueError("exact shadow buffer is redundant for f32 storage")
        self.mesh = mesh if mesh is not None else make_mesh()
        if AXIS not in self.mesh.shape:
            raise ValueError(f'mesh must have a "{AXIS}" axis')
        if dp_axis is not None and dp_axis not in self.mesh.shape:
            raise ValueError(f'mesh has no "{dp_axis}" axis')
        # Optional query-data-parallel axis: query batches shard over it
        # (QPS x dp degree) while each dp group replicates the row
        # shards (memory x dp degree) — the standard serving trade.
        self.dp_axis = dp_axis
        self.n_shards = self.mesh.shape[AXIS]
        self.dim = dim
        self.dtype = dtype
        self.segment = segment
        self.chunk = chunk
        from dawnsearch_tpu.ops.scan_select import MIN_ROWS
        self.fused_min_rows = MIN_ROWS  # per-shard score+select gate
        self.max_capacity = max_capacity
        self.cap_per_shard = _round_up(max(capacity_per_shard, segment), segment)
        self._counts = np.zeros(self.n_shards, dtype=np.int64)
        self._next_id = 0
        jdt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "i8": jnp.int8,
               "i4": jnp.uint8}[dtype]
        S, cap = self.n_shards, self.cap_per_shard
        if dtype == "i4":
            # row-block nibble packing, (S, cap/2, dim) — lane dim a
            # 128-multiple so XLA never pads/copies (ops/quant.py)
            from dawnsearch_tpu.ops.quant import i4_block_for
            self._i4_block = i4_block_for(segment)
            if chunk % self._i4_block != 0:
                raise ValueError(
                    f"i4 chunked scan needs chunk % block == 0, got "
                    f"chunk={chunk} block={self._i4_block}")
            rows = cap // 2
        else:
            self._i4_block = None
            rows = cap
        self._codes = jax.device_put(
            jnp.zeros((S, rows, dim), jdt), self._shard3)
        self._scales = (jax.device_put(jnp.ones((S, cap), jnp.float32),
                                       self._shard2)
                        if dtype in ("i8", "i4")
                        else jnp.zeros((), jnp.float32))
        self.exact = exact
        self.rerank_extra = rerank_extra
        self._exact = (jax.device_put(jnp.zeros((S, cap, dim), jnp.float16),
                                      self._shard3)
                       if exact else jnp.zeros((), jnp.float16))
        self._ids = jax.device_put(
            jnp.full((S, cap), -1, jnp.int32), self._shard2)

    @property
    def device_rerank(self) -> bool:
        return self.exact is not None

    def device_fetch_width(self, k: int) -> int:
        """Per-shard candidate width for the on-device f16 re-rank —
        k+rerank_extra widened by the i4 ladder on the TOTAL row count
        (conservative: each shard holds 1/S of the rows, so the global
        width per shard over-fetches; FlatIndex.device_fetch_width is
        the single-shard twin)."""
        kf = k + self.rerank_extra
        if self.dtype == "i4":
            from dawnsearch_tpu.ops.quant import i4_fetch_width
            kf = max(kf, i4_fetch_width(len(self), k))
        return min(kf, self.cap_per_shard)

    @property
    def _shard3(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(AXIS, None, None))

    @property
    def _shard2(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(AXIS, None))

    @property
    def _shard1(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(AXIS))

    def __len__(self) -> int:
        return int(self._counts.sum())

    @property
    def capacity(self) -> int:
        return self.n_shards * self.cap_per_shard

    @property
    def nbytes(self) -> int:
        n = self._codes.size * self._codes.dtype.itemsize + self._ids.size * 4
        if self.dtype in ("i8", "i4"):
            n += self._scales.size * 4
        if self.exact:
            n += self._exact.size * 2
        return n

    def _grow(self, needed_per_shard: int) -> None:
        new_cap = self.cap_per_shard
        while new_cap < needed_per_shard:
            new_cap *= 2
        if self.max_capacity is not None:
            limit = _round_up(
                -(-self.max_capacity // self.n_shards), self.segment)
            new_cap = min(new_cap, max(limit, self.cap_per_shard))
        if new_cap <= self.cap_per_shard:
            raise IndexFull("sharded index full")
        pad = new_cap - self.cap_per_shard
        pad_codes = pad // 2 if self.dtype == "i4" else pad
        self._codes = jax.device_put(
            jnp.pad(self._codes, ((0, 0), (0, pad_codes), (0, 0))),
            self._shard3)
        if self.dtype in ("i8", "i4"):
            self._scales = jax.device_put(
                jnp.pad(self._scales, ((0, 0), (0, pad)), constant_values=1.0),
                self._shard2)
        if self.exact:
            self._exact = jax.device_put(
                jnp.pad(self._exact, ((0, 0), (0, pad), (0, 0))),
                self._shard3)
        self._ids = jax.device_put(
            jnp.pad(self._ids, ((0, 0), (0, pad)), constant_values=-1),
            self._shard2)
        self.cap_per_shard = new_cap

    def free_slots(self) -> int | None:
        """Total rows still insertable after all permitted growth, or
        None when growth is unbounded (max_capacity=None). Mirrors
        _plan_insert's refusal condition, so a caller that pre-checks
        occupancy against this (the multihost ADD coalescer) refuses
        exactly when a direct add() would."""
        if self.max_capacity is None:
            return None
        limit = max(_round_up(-(-self.max_capacity // self.n_shards),
                              self.segment), self.cap_per_shard)
        return int((limit - self._counts).sum())

    def _stripe_plan(self, n: int, room: np.ndarray | None = None
                     ) -> tuple[list[np.ndarray], int]:
        """Balance-stripe: water-fill n new rows onto the least-full
        shards (closed form — equivalent to giving each row to the
        current argmin shard, but O(S log range) instead of a per-row
        Python loop). With `room` (per-shard free slots), no shard
        receives more than its room — the at-max-capacity plan; caller
        must check room.sum() >= n first. -> (per-shard index arrays
        into the batch, max rows any shard receives)."""
        c = self._counts
        if room is None:
            room = np.full(self.n_shards, n, dtype=np.int64)
        lo, hi = int(c.min()), int(c.max()) + n
        while lo < hi:  # largest level L with fill-cost <= n
            mid = (lo + hi + 1) // 2
            if int(np.minimum(np.maximum(c, mid) - c, room).sum()) <= n:
                lo = mid
            else:
                hi = mid - 1
        adds = np.minimum(np.maximum(c, lo) - c, room)
        left = n - int(adds.sum())
        if left > 0:  # one extra row each to the lowest-fill shards with room
            eligible = np.nonzero(adds < room)[0]
            order = eligible[np.argsort((c + adds)[eligible], kind="stable")]
            adds[order[:left]] += 1
        bounds = np.concatenate([[0], np.cumsum(adds)]).astype(np.int64)
        per_shard = [np.arange(bounds[s], bounds[s + 1])
                     for s in range(self.n_shards)]
        return per_shard, int(adds.max())

    def _plan_insert(self, n: int) -> tuple[list[np.ndarray], int]:
        """Stripe plan + capacity management: grow shards when the plan
        needs it; when growth is capped (max_capacity), re-plan within
        each shard's remaining room. Raises only when the rows genuinely
        don't fit anywhere (sum of free slots < n)."""
        per_shard, max_rows = self._stripe_plan(n)
        adds = np.array([len(p) for p in per_shard], np.int64)
        needed = int((self._counts + adds).max())
        if needed > self.cap_per_shard:
            try:
                self._grow(needed)
            except IndexFull:
                pass
            if needed > self.cap_per_shard:
                room = (self.cap_per_shard - self._counts).astype(np.int64)
                free = int(room.sum())
                if free < n:
                    raise IndexFull(
                        f"sharded index full: {n} rows, {free} free slots")
                per_shard, max_rows = self._stripe_plan(n, room=room)
        return per_shard, max_rows

    def add(self, vectors: np.ndarray | jax.Array,
            ids: np.ndarray | None = None) -> np.ndarray:
        rows = np.asarray(vectors, np.float32)
        if rows.ndim == 1:
            rows = rows[None, :]
        n = rows.shape[0]
        if n == 0:
            return np.empty((0,), np.int64)
        if ids is None:
            ids = np.arange(self._next_id, self._next_id + n, dtype=np.int64)
        plan = self._prepare_add(rows, np.asarray(ids, np.int64))
        self._commit_add(plan)
        return plan["ids"]

    def _prepare_add(self, rows: np.ndarray, ids: np.ndarray) -> dict:
        """Host half of an insert: quantization, balance-stripe
        planning, per-shard block building (plus any capacity growth,
        recorded as grown_cap so another process can replay it). Split
        from _commit_add so the multihost leader runs this ONCE and
        ships the finished blocks — followers skip straight to the
        device writes (parallel/multihost.py ADD wire). Deterministic
        refusals (IndexFull) raise here, before any device dispatch.
        Blocks are built in the wire dtype (i8/u8 codes, not f32), so
        the multihost payload carries 1 byte/dim for quantized tiers."""
        n = rows.shape[0]
        per_shard, max_rows = self._plan_insert(n)
        # Bucket the block's row dim to a power of two (capped at the
        # shard capacity _blend_write's clamp+roll+mask contract needs):
        # _sharded_write is jit'd on (S, max_rows, D), and coalesced
        # multihost flushes arrive with arbitrary timing-dependent sizes
        # — without bucketing every distinct flush size compiles a fresh
        # cross-process program (and the jit cache grows unboundedly).
        # Padding rows are masked by lens, so this is shape-only.
        max_rows = min(_pow2(max_rows), self.cap_per_shard)

        S, D = self.n_shards, self.dim
        row_np = {"f32": np.float32, "bf16": np.float32, "i8": np.int8,
                  "i4": np.uint8}[self.dtype]
        if self.dtype == "i8":
            absmax = np.abs(rows).max(axis=1)
            scs = np.maximum(absmax, 1e-12) / 127.0
            data = np.clip(np.round(rows / scs[:, None]),
                           -127, 127).astype(np.int8)
        elif self.dtype == "i4":
            from dawnsearch_tpu.ops.quant import quantize_i4_vals_np
            # biased nibble VALUES (n, D); the row-block packing is
            # position-dependent and happens device-side in the blend
            # write (ops/quant.blend_rows_i4)
            data, scs = quantize_i4_vals_np(rows)
        row_blocks = np.zeros((S, max_rows, D), row_np)
        scale_blocks = (np.ones((S, max_rows), np.float32)
                        if self.dtype in ("i8", "i4") else None)
        exact_blocks = (np.zeros((S, max_rows, D), np.float16)
                        if self.exact else None)
        id_blocks = np.full((S, max_rows), -1, np.int32)
        starts = np.zeros((S,), np.int32)
        for s in range(S):
            sel = per_shard[s]
            starts[s] = self._counts[s]
            if len(sel):
                row_blocks[s, : len(sel)] = (
                    data[sel] if self.dtype in ("i8", "i4") else rows[sel])
                id_blocks[s, : len(sel)] = ids[sel]
                if scale_blocks is not None:
                    scale_blocks[s, : len(sel)] = scs[sel]
                if exact_blocks is not None:
                    exact_blocks[s, : len(sel)] = rows[sel].astype(np.float16)
        return dict(
            row_blocks=row_blocks, scale_blocks=scale_blocks,
            exact_blocks=exact_blocks, id_blocks=id_blocks,
            lens=np.asarray([len(p) for p in per_shard], np.int32),
            starts=starts, ids=ids, grown_cap=self.cap_per_shard)

    def _commit_add(self, plan: dict) -> None:
        """Device half of an insert: replay any growth the plan
        recorded, transfer the blocks, run the donating sharded write,
        advance the host-side counts. Every process of a multihost crew
        executes this with the same plan bytes, so the device programs
        (and any growth pads) pair up across hosts by construction."""
        if plan["grown_cap"] > self.cap_per_shard:
            self._grow(plan["grown_cap"])
        jdt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "i8": jnp.int8,
               "i4": jnp.uint8}[self.dtype]
        has_scales = self.dtype in ("i8", "i4")
        self._codes, self._scales, self._exact, self._ids = _sharded_write(
            self._codes, self._scales, self._exact, self._ids,
            jax.device_put(jnp.asarray(plan["row_blocks"], jdt),
                           self._shard3),
            jax.device_put(jnp.asarray(plan["scale_blocks"]), self._shard2)
            if has_scales else jnp.zeros((), jnp.float32),
            jax.device_put(jnp.asarray(plan["exact_blocks"]), self._shard3)
            if plan["exact_blocks"] is not None else jnp.zeros((), jnp.float16),
            jax.device_put(jnp.asarray(plan["id_blocks"]), self._shard2),
            jax.device_put(jnp.asarray(plan["lens"], dtype=jnp.int32),
                           self._shard1),
            jax.device_put(jnp.asarray(plan["starts"]), self._shard1),
            mesh=self.mesh, has_scales=has_scales,
            has_exact=self.exact is not None,
            i4_block=self._i4_block,
        )
        self._counts += plan["lens"].astype(np.int64)
        ids = plan["ids"]
        if len(ids):
            self._next_id = max(self._next_id, int(ids.max()) + 1)

    def search(self, queries: np.ndarray | jax.Array, k: int
               ) -> tuple[np.ndarray, np.ndarray]:
        """Exact global top-k -> (distances (B,k) asc, user ids; -1 = empty).

        Host (numpy) queries must be unit-normalized once any shard
        crosses the fused-selector gate (see FlatIndex.search)."""
        d, u, B, k_local, single = self.search_dispatch(queries, k)
        return self.search_finalize(d, u, k, B, k_local, single)

    def search_dispatch(self, queries: np.ndarray | jax.Array, k: int):
        """Enqueue the sharded search; the execution wait lives in
        search_finalize (same locking contract as
        FlatIndex.search_dispatch)."""
        from dawnsearch_tpu.index.flat import _check_unit_queries
        _check_unit_queries(queries, int(self._counts.min()),
                            self.cap_per_shard, self.dim, self.dtype,
                            "auto", self.fused_min_rows)
        q = jnp.asarray(queries, jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        B = q.shape[0]
        k_local = min(k, self.cap_per_shard)
        if self.dp_axis is not None:  # pad batch to the dp degree
            dp = self.mesh.shape[self.dp_axis]
            padded_b = -(-q.shape[0] // dp) * dp
            if padded_b != q.shape[0]:
                q = jnp.pad(q, ((0, padded_b - q.shape[0]), (0, 0)))
        kf = self.device_fetch_width(k_local) if self.exact else k_local
        from dawnsearch_tpu.ops import scan_select
        fused_sel = (scan_select.eligible(
            int(self._counts.min()), self.cap_per_shard, self.dim,
            self.dtype, min_rows=self.fused_min_rows)
            and (self.dtype != "i4"
                 or self._i4_block == scan_select.DEFAULT_TN))
        d, u = _sharded_search(
            self._codes, self._scales, self._exact, self._ids,
            jnp.asarray(self._counts, jnp.int32), q,
            k=k_local, kf=kf, chunk=self.chunk, mesh=self.mesh,
            has_scales=self.dtype in ("i8", "i4"),
            has_exact=self.exact is not None,
            approx=self.dtype != "f32", dp_axis=self.dp_axis,
            fused_sel=fused_sel, i4_block=self._i4_block)
        return d, u, B, k_local, single

    @staticmethod
    def search_finalize(d, u, k: int, B: int, k_local: int, single: bool
                        ) -> tuple[np.ndarray, np.ndarray]:
        d, u = np.asarray(d)[:B], np.asarray(u)[:B]
        if k_local < k:
            d = np.pad(d, ((0, 0), (0, k - k_local)), constant_values=np.inf)
            u = np.pad(u, ((0, 0), (0, k - k_local)), constant_values=-1)
        d, u = d[:, :k], u[:, :k]
        if single:
            return d[0], u[0]
        return d, u

    # -- persistence (device-sharded arrays gather to host, reload
    #    re-shards onto whatever mesh the new process has) --------------

    def save(self, path: str) -> None:
        self.deferred_save()(path)

    def deferred_save(self):
        """Reference-capture + deferred readback/write, the
        FlatIndex.deferred_save twin — the closure carries the SAME
        safety contract (run it only while donating writes are
        excluded, i.e. under SearchProvider.ingest_gate; donation marks
        the captured buffers deleted)."""
        from dawnsearch_tpu.index.flat import _atomic_savez
        codes, scales, exact, ids = (self._codes, self._scales,
                                     self._exact, self._ids)
        counts, next_id = np.array(self._counts), self._next_id
        dtype, dim, has_scales = self.dtype, self.dim, (
            self.dtype in ("i8", "i4"))
        has_exact = self.exact is not None
        i4_block = self._i4_block

        def write(path: str) -> None:
            _atomic_savez(
                path,
                kind="sharded",
                codes=np.asarray(codes),
                scales=(np.asarray(scales) if has_scales
                        else np.empty(0)),
                exact=(np.asarray(exact) if has_exact else np.empty(0)),
                ids=np.asarray(ids),
                counts=counts,
                next_id=next_id,
                dtype=dtype,
                dim=dim,
                # absent key = pre-round-4 dim-plane i4 layout
                # (migrated on load; see ops/quant.py header)
                i4_block=(i4_block or 0),
            )
        return write

    @classmethod
    def load(cls, path: str, mesh: Mesh | None = None,
             **kwargs) -> "ShardedFlatIndex":
        """Reload onto `mesh`. A different shard count than at save time
        is fine as long as it divides the saved shard count evenly (rows
        are re-striped); otherwise rows are re-added through add()."""
        with np.load(path, allow_pickle=False) as z:
            codes = z["codes"]  # (S0, cap, D); i4: (S0, cap/2, D)
            scales = z["scales"]
            exact = z["exact"] if "exact" in z.files else np.empty(0)
            ids = z["ids"]
            counts = z["counts"].astype(np.int64)
            dtype = str(z["dtype"])
            dim = int(z["dim"])  # logical dim
            next_id = int(z["next_id"])
            snap_block = int(z["i4_block"]) if "i4_block" in z.files else 0
        has_exact = exact.size > 0
        S0 = codes.shape[0]
        # logical per-shard capacity: new-format i4 packs 2 rows/stored
        # row; legacy dim-plane i4 (absent i4_block key) stored (cap,
        # D/2) — migrate below
        legacy_i4 = dtype == "i4" and snap_block == 0
        cap0 = codes.shape[1] if (dtype != "i4" or legacy_i4) \
            else codes.shape[1] * 2
        kwargs.setdefault("segment", cap0)  # preserve saved capacity
        kwargs.setdefault("exact", "f16" if has_exact else None)
        idx = cls(mesh=mesh, dim=dim, dtype=dtype,
                  capacity_per_shard=cap0, **kwargs)
        if dtype == "i4" and (legacy_i4 or snap_block != idx._i4_block):
            # repack every shard into idx's row-block layout
            from dawnsearch_tpu.ops.quant import pack_i4_np, unpack_i4_np
            if legacy_i4:
                vals = np.concatenate(
                    [codes & 0xF, codes >> 4], axis=-1).astype(np.uint8)
            else:
                vals = (unpack_i4_np(
                            codes.reshape(-1, dim), snap_block)
                        .astype(np.int16) + 8).astype(np.uint8).reshape(
                            S0, cap0, dim)
            codes = pack_i4_np(vals.reshape(-1, dim), idx._i4_block
                               ).reshape(S0, cap0 // 2, dim)
        if idx.n_shards == S0:
            idx._codes = jax.device_put(
                jnp.asarray(codes, idx._codes.dtype), idx._shard3)
            if dtype in ("i8", "i4"):
                idx._scales = jax.device_put(jnp.asarray(scales),
                                             idx._shard2)
            if has_exact and idx.exact:
                idx._exact = jax.device_put(
                    jnp.asarray(exact, jnp.float16), idx._shard3)
            elif idx.exact == "f16":
                # requested shadow absent from the snapshot: backfill
                # from dequantized codes instead of serving an all-zero
                # re-rank buffer (round-2 advisor; see FlatIndex.load)
                if dtype == "i4":
                    from dawnsearch_tpu.ops.quant import unpack_i4_np
                    # blocks never straddle shard boundaries (block
                    # divides cap_per_shard), so a flat unpack is safe
                    deq = (unpack_i4_np(
                               codes.reshape(-1, dim), idx._i4_block
                           ).astype(np.float32).reshape(S0, cap0, dim)
                           * scales[:, :, None])
                else:
                    deq = codes.astype(np.float32)
                    if dtype == "i8":
                        deq = deq * scales[:, :, None]
                idx._exact = jax.device_put(
                    jnp.asarray(deq.astype(np.float16)), idx._shard3)
            idx._ids = jax.device_put(jnp.asarray(ids, jnp.int32),
                                      idx._shard2)
            idx._counts = counts
        else:  # re-stripe through the normal insert path
            all_ids, all_rows, all_scales = [], [], []
            for s in range(S0):
                n = int(counts[s])
                all_ids.append(ids[s, :n].astype(np.int64))
                if has_exact:
                    rows = exact[s, :n].astype(np.float32)
                elif dtype == "i4":
                    from dawnsearch_tpu.ops.quant import unpack_i4_np
                    rows = (unpack_i4_np(codes[s], idx._i4_block)
                            [:n].astype(np.float32)
                            * scales[s, :n, None])
                else:
                    rows = codes[s, :n].astype(np.float32)
                    if dtype == "i8":
                        rows = rows * scales[s, :n, None]
                all_rows.append(rows)
            if all_rows:
                idx.add(np.concatenate(all_rows),
                        ids=np.concatenate(all_ids))
        idx._next_id = max(idx._next_id, next_id)
        return idx
