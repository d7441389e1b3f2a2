"""Measured cost of the multihost (DCN-tier) control plane.

Round-3 VERDICT weak-5: the multihost tier was correctness-only — the
broadcast control plane (parallel/multihost.py) had no measured ops/s.
This harness measures it the only way this single-chip machine allows
(the same instrument tests/test_multihost.py uses): a REAL 2-process
jax.distributed crew with gloo collectives, 2 virtual CPU devices per
process, versus a single-process ShardedFlatIndex over the SAME total
4-device mesh. Absolute CPU numbers are not TPU numbers; the measured
quantity is the RELATIVE overhead the crew adds per op — the control
stream's header + payload (the leader's prepared insert blocks for
add, queries for search) and the cross-process collective inside the
jitted program — which is the tier's real price on any transport.
Caveat on this box: nproc=1, so the crew's two processes timeshare
one core (doc/multihost.md discusses the resulting add ceiling).

Workload (both sides identical): dim 384, add 65,536 unit rows in
256-row batches (the ingest contract's scale), then 50 x batch-64
k=10 searches, then one snapshot save.

Run: python examples/bench_multihost.py            (orchestrates both)
Roles (internal): `single`, `crew <pid> <port>`.

Reference frame: the UDP swarm this tier replaces publishes its cost as
the 200 ms fan-out deadline (/root/reference/src/net/udp_service.rs:
297-341); the closed crew's cost is the broadcast+collective latency
measured here.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 384
ADD_TOTAL = int(os.environ.get("BENCH_MH_ADD_TOTAL", 65536))
ADD_BATCH = int(os.environ.get("BENCH_MH_ADD_BATCH", 256))
SEARCH_ITERS = int(os.environ.get("BENCH_MH_SEARCH_ITERS", 50))
SEARCH_BATCH = int(os.environ.get("BENCH_MH_SEARCH_BATCH", 64))
K = 10


def _corpus(n: int):
    import numpy as np
    rng = np.random.default_rng(7)
    rows = rng.standard_normal((n, DIM)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows


def _measure(index, data_dir: str) -> dict:
    """The identical workload both sides run; returns metric dict."""
    import numpy as np
    rows = _corpus(ADD_TOTAL)

    t0 = time.perf_counter()
    for i in range(0, ADD_TOTAL, ADD_BATCH):
        index.add(rows[i:i + ADD_BATCH])
    # adds are async on device; a search forces the queue to drain and
    # its result readback bounds the add wall-clock honestly
    np.asarray(index.search(rows[:1], 1)[0])
    add_s = time.perf_counter() - t0

    q = rows[:SEARCH_BATCH]
    for _ in range(3):  # warmup: compile the search program
        np.asarray(index.search(q, K)[0])
    lat = []
    t0 = time.perf_counter()
    for _ in range(SEARCH_ITERS):
        t1 = time.perf_counter()
        np.asarray(index.search(q, K)[0])
        lat.append(time.perf_counter() - t1)
    search_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    index.save(os.path.join(data_dir, "bench_snapshot.npz"))
    save_s = time.perf_counter() - t0

    lat.sort()
    return {
        "rows": len(index),
        "add_rows_per_s": ADD_TOTAL / add_s,
        "add_s": add_s,
        "search_qps": SEARCH_ITERS * SEARCH_BATCH / search_s,
        "search_p50_ms": 1e3 * lat[len(lat) // 2],
        "search_p99_ms": 1e3 * lat[min(len(lat) - 1,
                                       int(len(lat) * 0.99))],
        "save_s": save_s,
    }


def run_single(data_dir: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.node import make_index_factory

    cfg = Config(data_dir=data_dir, index_kind="sharded")
    index = make_index_factory(cfg, dim=DIM)()
    m = _measure(index, data_dir)
    print("RESULT " + json.dumps({"role": "single", **m}), flush=True)
    return 0


def run_crew(proc: int, port: str, data_dir: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.parallel import multihost

    cfg = Config(data_dir=data_dir, index_kind="sharded",
                 dist_coordinator=f"127.0.0.1:{port}",
                 dist_num_processes=2, dist_process_id=proc,
                 dist_ping_interval=60.0)
    multihost.init_distributed(cfg.dist_coordinator, 2, proc)
    if proc > 0:
        multihost.follower_main(cfg)
        return 0

    from dawnsearch_tpu.node import make_index_factory
    crew = multihost.MultihostCrew(ping_interval=cfg.dist_ping_interval,
                                   coordinator=cfg.dist_coordinator)
    index = make_index_factory(cfg, dim=DIM, crew=crew)()
    m = _measure(index, data_dir)
    print("RESULT " + json.dumps({"role": "crew", **m}), flush=True)
    crew.shutdown()
    return 0


def _spawn(args, env):
    return subprocess.Popen([sys.executable, __file__, *args],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)


def _collect(procs) -> dict:
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["role"]] = r
    return results


def orchestrate() -> int:
    import tempfile
    env = dict(os.environ, PYTHONPATH=REPO)
    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        print("[bench_multihost] single-process baseline "
              "(4 CPU devices)...", file=sys.stderr)
        res = _collect([_spawn(["single", d1], env)])
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        print("[bench_multihost] 2-process gloo crew "
              "(2x2 CPU devices)...", file=sys.stderr)
        res.update(_collect([_spawn(["crew", str(p), port, d2], env)
                             for p in (0, 1)]))

    s, c = res["single"], res["crew"]
    rows = [
        ("add (rows/s, 256-row batches)", s["add_rows_per_s"],
         c["add_rows_per_s"]),
        ("search QPS (batch 64, k=10)", s["search_qps"], c["search_qps"]),
        ("search p50 (ms/batch)", s["search_p50_ms"], c["search_p50_ms"]),
        ("search p99 (ms/batch)", s["search_p99_ms"], c["search_p99_ms"]),
        ("snapshot save (s)", s["save_s"], c["save_s"]),
    ]
    print(f"{'metric':38s} {'single':>12s} {'crew':>12s} {'crew/single':>12s}",
          file=sys.stderr)
    for name, sv, cv in rows:
        print(f"{name:38s} {sv:12.1f} {cv:12.1f} {cv / sv:12.2f}",
              file=sys.stderr)
    print(json.dumps({"single": s, "crew": c}))
    return 0


def main() -> int:
    if len(sys.argv) == 1:
        return orchestrate()
    role = sys.argv[1]
    if role == "single":
        return run_single(sys.argv[2])
    if role == "crew":
        return run_crew(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    raise SystemExit(f"unknown role {role}")


if __name__ == "__main__":
    raise SystemExit(main())
