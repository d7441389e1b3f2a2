"""Index-variant A/B harness: recall@10 + latency across engines.

Capability-envelope twin of the reference's manual benchmark binaries
(/root/reference/examples_old/{search,search_bucket,search_usearch}.rs),
which print "Searched N pages in X ms" per index variant for eyeballing
recall/latency trade-offs. Here one run sweeps:

- FlatIndex f32 / bf16 / i8 (exact; i8 shows the quantization recall cost)
- IVFIndex at several nprobe settings (the bucket-search trade-off,
  search_bucket.rs:15-17)

Run: [DAWNSEARCH_JAX_PLATFORM=cpu] python examples/bench_index_variants.py [n_rows] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DAWNSEARCH_JAX_PLATFORM"):
    import jax
    jax.config.update("jax_platforms",
                      os.environ["DAWNSEARCH_JAX_PLATFORM"])

from dawnsearch_tpu.index.flat import FlatIndex
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ivf_index import IVFIndex  # demoted experiment (round 3)

K = 10


def recall_at_k(found: np.ndarray, truth: np.ndarray) -> float:
    return float(np.mean([len(set(f) & set(t)) / K
                          for f, t in zip(found, truth)]))


def main(n_rows: int = 100_000, n_queries: int = 256) -> None:
    rng = np.random.default_rng(0)
    # clustered corpus: what web pages actually look like in embedding
    # space (and what makes IVF work)
    centers = rng.standard_normal((256, 384)).astype(np.float32)
    x = centers[rng.integers(0, 256, n_rows)] + \
        0.3 * rng.standard_normal((n_rows, 384)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(n_rows, n_queries, replace=False)] + \
        0.05 * rng.standard_normal((n_queries, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    exact = np.argsort(1.0 - q @ x.T, axis=1)[:, :K]

    def bench(name, ix, search_kw=None):
        search_kw = search_kw or {}
        ix.search(q[:8], K, **search_kw)  # warmup/compile
        t0 = time.perf_counter()
        _, ids = ix.search(q, K, **search_kw)
        dt = time.perf_counter() - t0
        print(f"{name:24s} recall@10={recall_at_k(ids, exact):.3f} "
              f"{1e3*dt:8.1f} ms/{n_queries}q "
              f"({n_queries/dt:8.0f} qps) {ix.nbytes/1e6:7.1f} MB")

    for dtype in ("f32", "bf16", "i8"):
        ix = FlatIndex(dtype=dtype, capacity=n_rows)
        ix.add(x)
        bench(f"flat/{dtype}", ix)

    ivf = IVFIndex(dtype="i8", n_centroids=256, nprobe=16,
                   list_capacity=2 * n_rows // 256)
    ivf.train(x[: min(n_rows, 65536)], iters=8)
    ivf.add(x)
    for nprobe in (4, 16, 64, 256):
        bench(f"ivf/i8 nprobe={nprobe}", ivf, {"nprobe": nprobe})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 256)
