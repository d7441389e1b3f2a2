"""Single-chip scale envelope: flat i8 search at 16M rows (6.5 GB HBM).

QPS with the fused score+select kernel (candidate folding active at
this size: 131072 window winners fold to 16384 before the final exact
top_k) + recall vs a sampled exact ground truth. Measured (s8 +
packed-key selector): 14,060 QPS at raw recall 0.966; 8M rows in the
same harness: 25,544 QPS at 0.977 (doc/performance.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_16m.py
(~20 min: the 16M-row host build dominates.)
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
from dawnsearch_tpu.index.flat import FlatIndex  # noqa: E402
from dawnsearch_tpu.ops.scan_select import search_select  # noqa: E402

N = 1 << 24  # 16,777,216
K = 10
BATCH = 1024
NQ = 64


def log(o):
    print(json.dumps(o), flush=True)


def main() -> None:
    rng = np.random.default_rng(7)
    qs = rng.standard_normal((BATCH, 384)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    best_d = np.full((NQ, K), np.inf)
    best_i = np.full((NQ, K), -1, np.int64)
    ix = FlatIndex(dtype="i8", capacity=N, max_capacity=N, segment=N)
    t0 = time.perf_counter()
    for s0, v in corpus_blocks(N):
        ix.add(v)
        dd = 1.0 - qs[:NQ] @ v.T
        idx = np.argpartition(dd, K, axis=1)[:, :K]
        cd = np.concatenate([best_d, np.take_along_axis(dd, idx, 1)], 1)
        ci = np.concatenate([best_i, idx + s0], 1)
        sel = np.argsort(cd, axis=1)[:, :K]
        best_d = np.take_along_axis(cd, sel, 1)
        best_i = np.take_along_axis(ci, sel, 1)
    log({"step": "build", "rows": len(ix), "gb": round(ix.nbytes / 1e9, 2),
         "seconds": round(time.perf_counter() - t0, 1)})

    q = jnp.asarray(qs)

    @functools.partial(jax.jit, static_argnames=("k", "reps"))
    def many(codes, scales, count, q, k, reps):
        def body(carry, _):
            qq = q + carry[:, :1] * 1e-12
            d, i = search_select(codes, scales, qq, count, k)
            return jnp.pad(d, ((0, 0), (0, q.shape[1] - k))), (d, i)
        _, (d, i) = jax.lax.scan(
            body, jnp.zeros((q.shape[0], q.shape[1]), jnp.float32),
            None, length=reps)
        return d[-1], i[-1]

    # small probe first (wedge safety at a new memory envelope)
    pd, _ = search_select(ix._codes, ix._scales, q[:8],
                          jnp.int32(ix.count), K)
    log({"step": "probe", "ok": bool(np.isfinite(np.asarray(pd)).all())})

    kw = dict(k=K, reps=4)
    args = (ix._codes, ix._scales, jnp.int32(ix.count), q)
    d, i = many(*args, **kw)
    np.asarray(d)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(*args, **kw)[0][0, 0])
        best = min(best, (time.perf_counter() - t0) / kw["reps"])
    ids = np.asarray(many(*args, **kw)[1])
    recall = float(np.mean([len(set(a.tolist()) & set(b.tolist())) / K
                            for a, b in zip(ids[:NQ], best_i)]))
    log({"engine": "flat_i8_fused", "rows": N,
         "qps": round(BATCH / best, 1),
         "per_batch_ms": round(best * 1000, 2),
         "recall_at_10": round(recall, 4)})


if __name__ == "__main__":
    main()
