"""IVFIndex: inverted-file ANN index for large shards, TPU-first.

DEMOTED to examples/ in round 3 (was dawnsearch_tpu/index/ivf.py): see
auto_index.py for the damning clustered-regime measurement. This stays
a working, tested experiment — the reference's own bucket-search
experiment (examples_old/search_bucket.rs) is its ancestor.

The stand-in for USearch's HNSW engine
(/root/reference/src/search/search_provider.rs:35-42): a graph ANN is
pointer-chasing-hostile on TPU, but the reference itself validated a
bucket/IVF shape — 200 centroids, insert into nearest buckets, probe 10
(/root/reference/examples_old/search_bucket.rs:15-17,45-90). Here that
becomes:

- **Train**: spherical k-means on device — assignment is a chunked
  matmul + argmax under `lax.scan`, the update a `segment_sum`; O(1)
  compiled shapes regardless of corpus size.
- **Storage**: padded per-list blocks `codes (C, L, D)` with per-list
  `counts`, user `ids (C, L)` and i8 `scales (C, L)` — everything
  static-shaped; a full list spills to the next-nearest centroid
  (bounded, like the reference's multi-bucket insert) and only grows
  `L` (one recompile) when all candidates are full.
- **Search**: coarse top-nprobe over `Q @ centroidsᵀ`, gather the probed
  list blocks, one batched einsum, mask padded slots, `lax.top_k` over
  the flattened (nprobe * L) candidates. Query batches stream through a
  `lax.scan` so the gathered working set stays HBM-bounded.

Exactness oracle: `nprobe == n_centroids` probes every list and must
match brute force exactly (tested).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from dawnsearch_tpu.ops.vector import EM_LEN

_JDT = {"f32": jnp.float32, "bf16": jnp.bfloat16, "i8": jnp.int8}


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# k-means training
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("iters", "chunk"))
def _kmeans(vectors: jax.Array, init: jax.Array, iters: int,
            chunk: int = 8192) -> jax.Array:
    """Spherical k-means (IP metric on unit vectors). `vectors` (N, D)
    padded to a chunk multiple with zero rows (zero rows contribute
    nothing to sums and are assigned to whatever; harmless)."""
    N, D = vectors.shape
    C = init.shape[0]
    n_chunks = N // chunk
    vc = vectors.reshape(n_chunks, chunk, D)

    def step(cent, _):
        def assign_chunk(carry, block):
            sums, counts = carry
            sims = jax.lax.dot_general(
                block, cent, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (chunk, C)
            a = jnp.argmax(sims, axis=1)
            valid = jnp.any(block != 0.0, axis=1)
            onehot = (jax.nn.one_hot(a, C, dtype=jnp.float32)
                      * valid[:, None])
            sums = sums + jax.lax.dot_general(
                onehot, block, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            assign_chunk,
            (jnp.zeros((C, D), jnp.float32), jnp.zeros((C,), jnp.float32)),
            vc)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
                        cent)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        return new / jnp.maximum(norm, 1e-12), None

    cent, _ = jax.lax.scan(step, init.astype(jnp.float32), None, length=iters)
    return cent


def train_centroids(vectors: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 0, chunk: int = 8192) -> np.ndarray:
    """k-means++-lite init (random distinct rows) then Lloyd on device."""
    v = np.asarray(vectors, np.float32)
    n = v.shape[0]
    if n < n_centroids:
        raise ValueError(f"need >= {n_centroids} training rows, got {n}")
    rng = np.random.default_rng(seed)
    init = v[rng.choice(n, n_centroids, replace=False)]
    pad = _round_up(n, chunk) - n
    if pad:
        v = np.concatenate([v, np.zeros((pad, v.shape[1]), np.float32)])
    return np.asarray(_kmeans(jnp.asarray(v), jnp.asarray(init), iters,
                              chunk=min(chunk, v.shape[0])))


# ---------------------------------------------------------------------------
# search kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "sub", "has_scales"))
def _ivf_search(centroids, codes, scales, ids, counts, queries, *,
                k: int, nprobe: int, sub: int, has_scales: bool):
    """(B, D) queries -> (B, k) asc distances + user ids. B % sub == 0."""
    B, D = queries.shape
    C, L = codes.shape[0], codes.shape[1]
    q = queries.astype(jnp.float32)
    coarse = jax.lax.dot_general(q, centroids, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(coarse, nprobe)  # (B, P)

    qs = q.reshape(B // sub, sub, D)
    ps = probes.reshape(B // sub, sub, nprobe)

    def body(_, inp):
        qc, pc = inp  # (sub, D), (sub, P)
        blocks = jnp.take(codes, pc, axis=0)        # (sub, P, L, D)
        block_ids = jnp.take(ids, pc, axis=0)       # (sub, P, L)
        block_cnt = jnp.take(counts, pc, axis=0)    # (sub, P)
        # bf16 operands: i8 codes are exact in bf16, and the probe stage
        # is gather-bandwidth-bound anyway (see flat._chunk_scores).
        if blocks.dtype == jnp.float32:
            dots = jnp.einsum("bpld,bd->bpl", blocks, qc,
                              preferred_element_type=jnp.float32)
        else:
            dots = jnp.einsum("bpld,bd->bpl", blocks.astype(jnp.bfloat16),
                              qc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        if has_scales:
            dots = dots * jnp.take(scales, pc, axis=0)
        dist = 1.0 - dots
        slot = jax.lax.broadcasted_iota(jnp.int32, (sub, nprobe, L), 2)
        dist = jnp.where(slot < block_cnt[:, :, None], dist, jnp.inf)
        flat_d = dist.reshape(sub, nprobe * L)
        flat_i = block_ids.reshape(sub, nprobe * L)
        kk = min(k, nprobe * L)
        if codes.dtype == jnp.int8 and kk < 128:
            d, sel = jax.lax.approx_min_k(flat_d, kk, recall_target=0.99)
        else:
            neg, sel = jax.lax.top_k(-flat_d, kk)
            d = -neg
        i = jnp.take_along_axis(flat_i, sel, axis=1)
        if kk < k:
            d = jnp.pad(d, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
            i = jnp.pad(i, ((0, 0), (0, k - kk)), constant_values=-1)
        return None, (d, jnp.where(jnp.isfinite(d), i, -1))

    _, (dists, out_ids) = jax.lax.scan(body, None, (qs, ps))
    return dists.reshape(B, k), out_ids.reshape(B, k)


@functools.partial(jax.jit, static_argnames=("n_cand",))
def _assign_candidates(rows: jax.Array, centroids: jax.Array,
                       n_cand: int) -> jax.Array:
    """(N, D) rows -> (N, n_cand) nearest-centroid ids, nearest first.
    bf16 operands (assignment is robust to it), f32 accumulation."""
    sims = jax.lax.dot_general(
        rows.astype(jnp.bfloat16), centroids.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return jax.lax.top_k(sims, n_cand)[1]


def _dedup_topk(d: np.ndarray, i: np.ndarray, k: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Drop duplicate ids per row (keep the first = nearest copy), then
    truncate to k. Needed under multi_assign where a vector's copies can
    surface from several probed lists."""
    B = d.shape[0]
    out_d = np.full((B, k), np.inf, d.dtype)
    out_i = np.full((B, k), -1, i.dtype)
    for b in range(B):
        _, first = np.unique(i[b], return_index=True)
        keep = np.sort(first)         # first occurrences, distance order
        keep = keep[i[b][keep] >= 0]  # drop the -1 sentinel
        keep = keep[: k]
        out_d[b, : len(keep)] = d[b, keep]
        out_i[b, : len(keep)] = i[b, keep]
    return out_d, out_i


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_rows(codes, scales, ids, list_idx, slot_idx, rows, row_scales,
                  row_ids):
    codes = codes.at[list_idx, slot_idx].set(rows.astype(codes.dtype))
    scales = scales.at[list_idx, slot_idx].set(row_scales)
    ids = ids.at[list_idx, slot_idx].set(row_ids)
    return codes, scales, ids


class IVFIndex:
    """Approximate index over padded inverted lists. API mirrors
    FlatIndex (add / search / save / load) plus train().

    `multi_assign` > 1 replicates every vector into its m nearest lists
    (best-effort for the extra copies) — the reference's validated
    recall lever (3-nearest-bucket insert, search_bucket.rs:16-17,60-67)
    at an m-times memory cost; duplicate ids are removed at search time.
    """

    SPILL = 4  # candidate lists per primary insert (nearest-first)

    def __init__(
        self,
        dim: int = EM_LEN,
        dtype: str = "i8",
        n_centroids: int = 256,
        nprobe: int = 16,
        list_capacity: int = 128,
        query_sub_batch: int = 32,
        multi_assign: int = 1,
    ):
        if dtype not in _JDT:
            raise ValueError(f"unsupported dtype {dtype}")
        if multi_assign < 1 or multi_assign > n_centroids:
            raise ValueError(f"multi_assign {multi_assign} out of range")
        self.dim = dim
        self.dtype = dtype
        self.n_centroids = n_centroids
        self.nprobe = min(nprobe, n_centroids)
        self.list_capacity = list_capacity
        self.query_sub_batch = query_sub_batch
        self.multi_assign = multi_assign
        self.trained = False
        self._next_id = 0
        self._n_rows = 0  # logical rows (copies counted once)
        self._centroids = jnp.zeros((n_centroids, dim), jnp.float32)
        self._alloc(list_capacity)

    def _alloc(self, L: int) -> None:
        C, D = self.n_centroids, self.dim
        self._codes = jnp.zeros((C, L, D), _JDT[self.dtype])
        self._scales = jnp.ones((C, L), jnp.float32)
        self._ids = jnp.full((C, L), -1, jnp.int32)
        self._counts = np.zeros(C, dtype=np.int64)
        self.list_capacity = L

    def __len__(self) -> int:
        return self._n_rows  # logical rows; copies from multi_assign count once

    @property
    def nbytes(self) -> int:
        n = self._codes.size * self._codes.dtype.itemsize + self._ids.size * 4
        n += self._centroids.size * 4
        if self.dtype == "i8":
            n += self._scales.size * 4
        return n

    # -- build ------------------------------------------------------------

    def train(self, vectors: np.ndarray, iters: int = 10, seed: int = 0) -> None:
        self._centroids = jnp.asarray(
            train_centroids(vectors, self.n_centroids, iters=iters, seed=seed))
        self.trained = True

    def _grow_lists(self) -> None:
        old_codes, old_scales, old_ids = self._codes, self._scales, self._ids
        L = self.list_capacity * 2
        pad = L - self.list_capacity
        self._codes = jnp.pad(old_codes, ((0, 0), (0, pad), (0, 0)))
        self._scales = jnp.pad(old_scales, ((0, 0), (0, pad)),
                               constant_values=1.0)
        self._ids = jnp.pad(old_ids, ((0, 0), (0, pad)), constant_values=-1)
        self.list_capacity = L

    def _assign_batch(self, cand: np.ndarray, required: bool) -> tuple:
        """Allocate one slot per row from its candidate lists
        (nearest-first, occupancy-driven spill), vectorized over rows.

        Returns (row_sel, list_idx, slot_idx) for the rows that landed.
        `required=True` grows the lists until every row lands (primary
        copies); `required=False` drops rows whose candidates are all
        full (best-effort extra copies under multi_assign)."""
        n = cand.shape[0]
        list_idx = np.full(n, -1, np.int64)
        slot_idx = np.zeros(n, np.int64)
        pending = np.arange(n)
        while len(pending):
            for col in range(cand.shape[1]):
                if not len(pending):
                    break
                c = cand[pending, col]
                order = np.argsort(c, kind="stable")
                cs = c[order]
                # rank within each equal-list run of the sorted view
                rank = np.arange(len(cs)) - np.searchsorted(cs, cs, "left")
                slot = self._counts[cs] + rank
                ok = slot < self.list_capacity
                landed = pending[order[ok]]
                list_idx[landed] = cs[ok]
                slot_idx[landed] = slot[ok]
                np.add.at(self._counts, cs[ok], 1)
                pending = pending[order[~ok]]
            if len(pending):
                if not required:
                    break
                self._grow_lists()  # rare; one recompile per doubling
        sel = np.nonzero(list_idx >= 0)[0]
        return sel, list_idx[sel], slot_idx[sel]

    def add(self, vectors: np.ndarray | jax.Array,
            ids: np.ndarray | None = None) -> np.ndarray:
        if not self.trained:
            raise RuntimeError("IVFIndex.add before train()")
        rows = np.asarray(vectors, np.float32)
        if rows.ndim == 1:
            rows = rows[None, :]
        n = rows.shape[0]
        if n == 0:
            return np.empty((0,), np.int64)
        if ids is None:
            ids = np.arange(self._next_id, self._next_id + n, dtype=np.int64)
        if int(np.max(ids)) > np.iinfo(np.int32).max:
            # device ids are int32; silent wraparound would corrupt results
            raise ValueError("IVFIndex ids must fit int32")
        self._next_id = max(self._next_id, int(ids.max()) + 1)

        # Candidate lists nearest-first (the reference inserts into the
        # 3 nearest buckets, search_bucket.rs:16,60-67): copy j targets
        # the j-th nearest, spilling to later candidates when full.
        # Assignment runs ON DEVICE (bf16 matmul + top_k): at 8M rows x
        # 4096 centroids the host-numpy version costs hours.
        m = self.multi_assign
        n_cand = min(self.SPILL + m - 1, self.n_centroids)
        cand = np.asarray(_assign_candidates(
            jnp.asarray(rows), self._centroids, n_cand))

        sel_all, lists_all, slots_all = [], [], []
        for copy in range(m):
            sel, li, si = self._assign_batch(cand[:, copy:], required=copy == 0)
            sel_all.append(sel)
            lists_all.append(li)
            slots_all.append(si)
        row_sel = np.concatenate(sel_all)
        list_idx = np.concatenate(lists_all)
        slot_idx = np.concatenate(slots_all)

        if self.dtype == "i8":
            absmax = np.abs(rows).max(axis=1)
            scs = (np.maximum(absmax, 1e-12) / 127.0).astype(np.float32)
            data = np.clip(np.round(rows / scs[:, None]), -127, 127)
        else:
            scs = np.ones(n, np.float32)
            data = rows
        self._codes, self._scales, self._ids = _scatter_rows(
            self._codes, self._scales, self._ids,
            jnp.asarray(list_idx, jnp.int32), jnp.asarray(slot_idx, jnp.int32),
            jnp.asarray(data[row_sel], jnp.float32),
            jnp.asarray(scs[row_sel]),
            jnp.asarray(np.asarray(ids)[row_sel], jnp.int32))
        self._n_rows += n
        return ids

    # -- query ------------------------------------------------------------

    def search(self, queries: np.ndarray | jax.Array, k: int,
               nprobe: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Approximate top-k -> (distances asc, user ids; -1 = empty)."""
        q = jnp.asarray(queries, jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        B = q.shape[0]
        sub = min(self.query_sub_batch, B)
        padded = _round_up(B, sub)
        if padded != B:
            q = jnp.pad(q, ((0, padded - B), (0, 0)))
        m = self.multi_assign
        k_fetch = k * m if m > 1 else k  # headroom for duplicate copies
        d, i = _ivf_search(
            self._centroids, self._codes,
            self._scales, self._ids,
            jnp.asarray(self._counts, jnp.int32), q,
            k=k_fetch, nprobe=min(nprobe or self.nprobe, self.n_centroids),
            sub=sub, has_scales=self.dtype == "i8")
        d, i = np.asarray(d[:B]), np.asarray(i[:B])
        if m > 1:
            d, i = _dedup_topk(d, i, k)
        if single:
            return d[0], i[0]
        return d, i

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        np.savez(tmp, centroids=np.asarray(self._centroids),
                 codes=np.asarray(self._codes),
                 scales=np.asarray(self._scales),
                 ids=np.asarray(self._ids), counts=self._counts,
                 dtype=self.dtype, nprobe=self.nprobe,
                 next_id=self._next_id, trained=self.trained,
                 multi_assign=self.multi_assign, n_rows=self._n_rows)
        os.replace(tmp + ".npz", path)

    @classmethod
    def load(cls, path: str, **kwargs) -> "IVFIndex":
        with np.load(path, allow_pickle=False) as z:
            dtype = str(z["dtype"])
            codes = z["codes"]
            idx = cls(dim=codes.shape[2], dtype=dtype,
                      n_centroids=codes.shape[0],
                      nprobe=int(z["nprobe"]),
                      list_capacity=codes.shape[1],
                      multi_assign=(int(z["multi_assign"])
                                    if "multi_assign" in z.files else 1),
                      **kwargs)
            idx._centroids = jnp.asarray(z["centroids"])
            idx._codes = jnp.asarray(codes, _JDT[dtype])
            idx._scales = jnp.asarray(z["scales"])
            idx._ids = jnp.asarray(z["ids"], jnp.int32)
            idx._counts = z["counts"].astype(np.int64)
            idx._next_id = int(z["next_id"])
            idx.trained = bool(z["trained"])
            idx._n_rows = (int(z["n_rows"]) if "n_rows" in z.files
                           else int(idx._counts.sum()))
        return idx
