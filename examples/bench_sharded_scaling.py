"""Shard-scaling shape of ShardedFlatIndex on the virtual CPU mesh.

The product claim (doc/performance.md "index at 8M rows") is that QPS
is EXPECTED near-linear in shard count on real chips: each shard scans
1/S of the rows on its own MXU, and the merge is an all_gather of only
(S, B, k) pairs plus one lax.top_k. One physical chip cannot measure
that directly. What the 8-device virtual CPU mesh CAN measure is the
claim's load-bearing half: that the merge term is negligible next to
the scan. All S virtual devices share ONE set of host cores, so at
FIXED TOTAL ROWS the scan work is constant in S and any wall-time
growth with S is the sharding overhead itself (collective + per-shard
top-k + program dispatch). If that overhead is flat/small, then on real
hardware — where each shard's scan runs on a dedicated chip — wall time
per batch drops ~1/S and QPS scales ~S until the (S*k)-column merge or
ICI latency bites (at k=10, B=1024 that is ~80 KB/shard, orders below
the scan until S is large).

Prints one JSON line per shard count: {"shards": S, "ms_per_batch": ..,
"overhead_vs_s1": ..}. Run on an otherwise-idle host; timings here are
shape evidence for doc/performance.md, not throughput claims.

Run: JAX_PLATFORMS=cpu python examples/bench_sharded_scaling.py
(~2 min; the reference has no counterpart — its fan-out cost rides the
network, udp_service.rs:315-330.)
"""

from __future__ import annotations

import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from dawnsearch_tpu.parallel.mesh import make_mesh  # noqa: E402
from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex  # noqa: E402

N_TOTAL = 1 << 17  # 131,072 rows, fixed across shard counts
BATCH = 128
K = 10
REPS = 5


def main() -> None:
    rng = np.random.default_rng(3)
    corpus = rng.standard_normal((N_TOTAL, 384)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    qs = rng.standard_normal((BATCH, 384)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    base_ms = None
    for S in (1, 2, 4, 8):
        mesh = make_mesh({"shard": S}, devices=jax.devices()[:S])
        ix = ShardedFlatIndex(mesh=mesh, dtype="i8",
                              capacity_per_shard=N_TOTAL // S,
                              segment=N_TOTAL // S)
        for s0 in range(0, N_TOTAL, 1 << 16):
            ix.add(corpus[s0:s0 + (1 << 16)])
        d, u = ix.search(qs, K)  # compile + correctness probe
        assert (u >= 0).all() and np.isfinite(d).all()
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(ix.search(qs, K)[0])
            best = min(best, time.perf_counter() - t0)
        ms = best * 1000
        if base_ms is None:
            base_ms = ms
        print(json.dumps({
            "shards": S, "rows_total": N_TOTAL,
            "ms_per_batch": round(ms, 2),
            "overhead_vs_s1": round(ms / base_ms - 1.0, 4)}), flush=True)


if __name__ == "__main__":
    main()
