"""IVF vs flat at 8M rows on the real chip (VERDICT r1 item 3c;
clustered mode: VERDICT r2 item 6).

8M is the regime AutoIndex's flat->IVF migration threshold targets
(index/auto.py DEFAULT_TRAIN_THRESHOLD); round 1 never measured it.
This records, per engine: QPS at batch 1024 k=10, raw recall@10 vs
exact f32 ground truth, and recall@10 with the serving path's f32
re-rank of k+30 candidates.

`--clustered` swaps the isotropic corpus for a mixture of 4096
Gaussians (sigma chosen so within-cluster cosine ~0.93 vs ~0 between)
and draws queries as perturbations of corpus rows — the one corpus
class where a coarse k-means partition carries real signal. This is
IVF's earn-or-demote benchmark: if IVF can't win here, it can't win
anywhere (the reference's own bucket experiment,
examples_old/search_bucket.rs, had the same question).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_ivf_8m.py [--clustered]
(~20 min: 8M-row builds + ground truth streaming on host BLAS).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import CORPUS_BLOCK, corpus_blocks  # noqa: E402
from dawnsearch_tpu.index.flat import FlatIndex, search_kernel  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ivf_index import IVFIndex  # demoted experiment (round 3)  # noqa: E402

import os

N_ROWS = int(os.environ.get("BENCH_IVF_ROWS", 8_000_000))  # smoke override
NQ = 128
K = 10


def log(obj) -> None:
    print(json.dumps(obj), flush=True)


def queries(nq: int = NQ) -> np.ndarray:
    rng = np.random.default_rng(7)
    q = rng.standard_normal((1024, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q[:nq]


# ---- clustered mode (mixture of Gaussians) --------------------------------

N_CLUSTERS = 4096
SIGMA = 0.02       # within-cluster: cos(row, center) ~ 1/sqrt(1+384s^2) ~ 0.93
SIGMA_Q = 0.015    # queries perturb corpus rows a little less


def _centers() -> np.ndarray:
    rng = np.random.default_rng(5)
    c = rng.standard_normal((N_CLUSTERS, 384)).astype(np.float32)
    return c / np.linalg.norm(c, axis=-1, keepdims=True)


def clustered_blocks(n_rows: int, seed: int = 0, block: int = CORPUS_BLOCK):
    """Deterministic per-block mixture sampling (same contract as
    corpus_blocks: build and ground truth stream identical rows)."""
    centers = _centers()
    for s0 in range(0, n_rows, block):
        n = min(block, n_rows - s0)
        rng = np.random.default_rng(seed + 1000 + s0)
        cid = rng.integers(0, N_CLUSTERS, size=n)
        v = centers[cid] + SIGMA * rng.standard_normal(
            (n, 384)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        yield s0, v


def clustered_queries(nq: int = NQ) -> np.ndarray:
    """Perturbed corpus rows: the realistic clustered-query model whose
    true neighbors live in the query's own cluster."""
    s0, v = next(clustered_blocks(CORPUS_BLOCK))
    rng = np.random.default_rng(11)
    rows = v[rng.integers(0, len(v), size=nq)]
    q = rows + SIGMA_Q * rng.standard_normal((nq, 384)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def ground_truth(qs: np.ndarray, blocks_fn=None):
    """Exact f32 top-K streamed over the corpus; keeps blocks for
    re-rank lookups."""
    blocks_fn = blocks_fn or corpus_blocks
    best_d = np.full((len(qs), K), np.inf)
    best_i = np.full((len(qs), K), -1, np.int64)
    t0 = time.perf_counter()
    corpus = {}
    for s0, v in blocks_fn(N_ROWS):
        corpus[s0] = v
        dd = 1.0 - qs @ v.T
        idx = np.argpartition(dd, K, axis=1)[:, :K]
        cd = np.concatenate([best_d, np.take_along_axis(dd, idx, 1)], 1)
        ci = np.concatenate([best_i, idx + s0], 1)
        sel = np.argsort(cd, axis=1)[:, :K]
        best_d = np.take_along_axis(cd, sel, 1)
        best_i = np.take_along_axis(ci, sel, 1)
    log({"step": "ground_truth", "seconds": round(time.perf_counter() - t0, 1)})
    return best_i, corpus


def recall(found: np.ndarray, truth: np.ndarray) -> float:
    return float(np.mean([len(set(a.tolist()) & set(b.tolist())) / K
                          for a, b in zip(found, truth)]))


def rerank(qs, d, i, corpus):
    out = np.full((len(qs), K), -1, np.int64)
    for b in range(len(qs)):
        cand = i[b][i[b] >= 0]
        if not len(cand):
            continue
        vecs = np.stack(
            [corpus[(c // CORPUS_BLOCK) * CORPUS_BLOCK][c % CORPUS_BLOCK]
             for c in cand])
        exact = 1.0 - qs[b] @ vecs.T
        out[b, : min(K, len(cand))] = cand[np.argsort(exact)[:K]]
    return out


def time_flat(index: FlatIndex, batch: int = 1024, reps: int = 8) -> float:
    from dawnsearch_tpu.ops import scan_select

    rng = np.random.default_rng(7)
    q = rng.standard_normal((batch, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q)
    # serving default: the shared scan_select.eligible gate
    fused = scan_select.eligible(index.count, index.capacity, index.dim,
                                 index.dtype)

    @functools.partial(jax.jit, static_argnames=("k", "chunk", "reps",
                                                 "fused"))
    def many(codes, scales, count, q, k, chunk, reps, fused):
        def body(carry, _):
            qq = q + carry[:, :1] * 1e-12
            if fused:
                d, i = scan_select.search_select(codes, scales, qq, count, k)
            else:
                d, i = search_kernel(codes, scales, qq, count, k, chunk,
                                     approx=True)
            return jnp.pad(d, ((0, 0), (0, q.shape[1] - k))), (d, i)
        _, (d, i) = jax.lax.scan(
            body, jnp.zeros((q.shape[0], q.shape[1]), jnp.float32),
            None, length=reps)
        return d[-1], i[-1]

    kw = dict(k=K, chunk=index.chunk, reps=reps, fused=fused)
    args = (index._codes, index._scales, jnp.int32(index.count), q)
    np.asarray(many(*args, **kw)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(*args, **kw)[0][0, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return batch / best


def time_ivf(ix: IVFIndex, nprobe: int, batch: int = 1024,
             reps: int = 4) -> float:
    """Same timing discipline as flat: reps inside one dispatch with a
    carried data dependency, host readback at the end."""
    from ivf_index import _ivf_search

    rng = np.random.default_rng(7)
    q = rng.standard_normal((batch, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q)
    counts = jnp.asarray(ix._counts, jnp.int32)
    sub = min(ix.query_sub_batch, batch)

    @functools.partial(jax.jit, static_argnames=("k", "nprobe", "sub",
                                                 "reps"))
    def many(centroids, codes, scales, ids, counts, q, k, nprobe, sub,
             reps):
        def body(carry, _):
            qq = q + carry[:, :1] * 1e-12
            d, i = _ivf_search(centroids, codes, scales, ids, counts, qq,
                               k=k, nprobe=nprobe, sub=sub,
                               has_scales=True)
            return jnp.pad(d, ((0, 0), (0, q.shape[1] - k))), (d, i)
        _, (d, i) = jax.lax.scan(
            body, jnp.zeros((q.shape[0], q.shape[1]), jnp.float32),
            None, length=reps)
        return d[-1], i[-1]

    args = (ix._centroids, ix._codes, ix._scales, ix._ids, counts, q)
    kw = dict(k=K, nprobe=nprobe, sub=sub, reps=reps)
    np.asarray(many(*args, **kw)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(*args, **kw)[0][0, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return batch / best


def main() -> None:
    clustered = "--clustered" in sys.argv
    blocks_fn = clustered_blocks if clustered else corpus_blocks
    qs = clustered_queries() if clustered else queries()
    log({"mode": "clustered" if clustered else "isotropic",
         "clusters": N_CLUSTERS if clustered else None,
         "sigma": SIGMA if clustered else None})
    truth, corpus = ground_truth(qs, blocks_fn)

    # ---- flat 8M ----
    cap = -(-N_ROWS // 16384) * 16384  # fused-selector tile multiple
    flat = FlatIndex(dtype="i8", capacity=cap, max_capacity=N_ROWS,
                     segment=cap)
    t0 = time.perf_counter()
    for _, v in blocks_fn(N_ROWS):
        flat.add(v)
    log({"step": "flat_build", "seconds": round(time.perf_counter() - t0, 1),
         "mb": round(flat.nbytes / 1e6)})
    qps = time_flat(flat)
    d, i = flat.search(qs, K)
    r_raw = recall(i, truth)
    d2, i2 = flat.search(qs, K + 30)
    r_rr = recall(rerank(qs, d2, i2, corpus), truth)
    log({"engine": "flat_i8", "rows": N_ROWS, "qps": round(qps, 1),
         "recall_raw": round(r_raw, 4), "recall_rerank": round(r_rr, 4)})
    del flat
    if "--flat-only" in sys.argv:
        return

    # ---- IVF 8M ----
    C = int(sys.argv[sys.argv.index("--centroids") + 1]) \
        if "--centroids" in sys.argv else 4096
    L = int(np.ceil(N_ROWS / C * 1.4 / 128) * 128)
    ivf = IVFIndex(dtype="i8", n_centroids=C, nprobe=16, list_capacity=L,
                   query_sub_batch=16)
    t0 = time.perf_counter()
    sample = next(blocks_fn(N_ROWS, seed=99, block=1_000_000))[1]
    ivf.train(sample, iters=8)
    log({"step": "ivf_train", "seconds": round(time.perf_counter() - t0, 1),
         "centroids": C, "list_capacity": L})
    t0 = time.perf_counter()
    for _, v in blocks_fn(N_ROWS):
        ivf.add(v)
    log({"step": "ivf_build", "seconds": round(time.perf_counter() - t0, 1),
         "mb": round(ivf.nbytes / 1e6),
         "fill": round(float(ivf._counts.mean()) / L, 3),
         "max_fill": round(float(ivf._counts.max()) / L, 3)})
    for nprobe in (8, 16, 32, 64):
        qps = time_ivf(ivf, nprobe)
        ivf.nprobe = nprobe
        d, i = ivf.search(qs, K, nprobe=nprobe)
        r_raw = recall(i, truth)
        d2, i2 = ivf.search(qs, K + 30, nprobe=nprobe)
        r_rr = recall(rerank(qs, d2, i2, corpus), truth)
        log({"engine": "ivf_i8", "rows": N_ROWS, "nprobe": nprobe,
             "qps": round(qps, 1), "recall_raw": round(r_raw, 4),
             "recall_rerank": round(r_rr, 4)})


if __name__ == "__main__":
    main()
