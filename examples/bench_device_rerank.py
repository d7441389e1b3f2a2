"""Device-side f16 re-rank A/B at 1M rows (flat i8, batch 1024, k=10).

Compares, on the real chip:
  (a) fused score+select only (serving default, no re-rank)
  (b) fused score+select (kf=k+30) + DEVICE f16 re-rank, one program
  (c) the round-1 approx_min_k scan, with and without the re-rank
and reports recall@10 vs exact f32 ground truth for each.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_device_rerank.py
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
from bench import corpus_blocks  # noqa: E402
from dawnsearch_tpu.index.flat import (  # noqa: E402
    FlatIndex, rerank_kernel, search_kernel)

N = 1_000_000
K = 10
BATCH = 1024
NQ = 256


def log(o):
    print(json.dumps(o), flush=True)


def main() -> None:
    rng = np.random.default_rng(7)
    qs = rng.standard_normal((BATCH, 384)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    # ground truth on the first NQ queries
    best_d = np.full((NQ, K), np.inf)
    best_i = np.full((NQ, K), -1, np.int64)
    blocks = []
    for s0, v in corpus_blocks(N):
        blocks.append(v)
        dd = 1.0 - qs[:NQ] @ v.T
        idx = np.argpartition(dd, K, axis=1)[:, :K]
        cd = np.concatenate([best_d, np.take_along_axis(dd, idx, 1)], 1)
        ci = np.concatenate([best_i, idx + s0], 1)
        sel = np.argsort(cd, axis=1)[:, :K]
        best_d = np.take_along_axis(cd, sel, 1)
        best_i = np.take_along_axis(ci, sel, 1)

    def recall(ids):
        return float(np.mean([len(set(a.tolist()) & set(b.tolist())) / K
                              for a, b in zip(ids[:NQ], best_i)]))

    t0 = time.perf_counter()
    # capacity must stay a segment (TN) multiple for the fused selector
    cap = 1 << 20
    ix = FlatIndex(dtype="i8", capacity=cap, max_capacity=cap, segment=cap,
                   exact="f16")
    for v in blocks:
        ix.add(v)
    log({"step": "build_with_f16_shadow",
         "seconds": round(time.perf_counter() - t0, 1),
         "mb": round(ix.nbytes / 1e6)})

    q = jnp.asarray(qs)

    from dawnsearch_tpu.ops.scan_select import search_select

    @functools.partial(jax.jit,
                       static_argnames=("k", "kf", "chunk", "reps", "mode"))
    def many(codes, scales, exact, count, q, k, kf, chunk, reps, mode):
        def body(carry, _):
            qq = q + carry[:, :1] * 1e-12
            if mode == "fused_rerank":
                d, i = search_select(codes, scales, qq, count, kf)
                d, i = rerank_kernel(exact, qq, d, i, k)
            elif mode == "fused_only":
                d, i = search_select(codes, scales, qq, count, k)
            elif mode == "approx_rerank":
                d, i = search_kernel(codes, scales, qq, count, kf, chunk,
                                     approx=True)
                d, i = rerank_kernel(exact, qq, d, i, k)
            else:
                d, i = search_kernel(codes, scales, qq, count, k, chunk,
                                     approx=True)
            return jnp.pad(d, ((0, 0), (0, q.shape[1] - k))), (d, i)
        _, (d, i) = jax.lax.scan(
            body, jnp.zeros((q.shape[0], q.shape[1]), jnp.float32),
            None, length=reps)
        return d[-1], i[-1]

    for mode in ("fused_only", "fused_rerank", "approx_only",
                 "approx_rerank"):
        kw = dict(k=K, kf=K + 30, chunk=ix.chunk, reps=8, mode=mode)
        args = (ix._codes, ix._scales, ix._exact, jnp.int32(ix.count), q)
        d, i = many(*args, **kw)
        np.asarray(d)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(*args, **kw)[0][0, 0])
            best = min(best, (time.perf_counter() - t0) / kw["reps"])
        ids = np.asarray(many(*args, **kw)[1])
        log({"mode": mode, "qps": round(BATCH / best, 1),
             "per_batch_ms": round(best * 1000, 2),
             "recall_at_10": round(recall(ids), 4)})


if __name__ == "__main__":
    main()
