"""Multihost (DCN-tier) crew cost: add + search ops/s on a 2-process
gloo crew vs the same-device-count single-process sharded index.

Round-3 VERDICT item 4b: the tier was verified correct but never
measured — "works" without "at what cost". This harness measures the
only cost this one-chip machine can expose honestly: the CONTROL-PLANE
overhead (broadcast_one_to_all header+payload per op, cross-process
gloo collectives inside the device programs) relative to an identical
single-process index on the same number of virtual CPU devices. The
absolute numbers are CPU-mesh numbers, not TPU numbers; the RATIO is
the design's overhead (documented in doc/multihost.md).

Run: python examples/bench_multihost.py
  (spawns itself twice as crew workers; ~2-4 min on this box)

Prints one JSON line per measurement; the final line is the summary
table used in doc/multihost.md.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 16384
ADD_BATCH = 512
SEARCH_BATCH = 64
SEARCH_REPS = 40
K = 10


def log(o) -> None:
    print("BENCH " + json.dumps(o), flush=True)


def corpus(n: int) -> np.ndarray:
    rng = np.random.default_rng(11)
    v = rng.standard_normal((n, 384)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def measure(index, tag: str) -> dict:
    """Identical protocol for crew-wrapped and plain indexes."""
    rows = corpus(ROWS)
    t0 = time.perf_counter()
    for s in range(0, ROWS, ADD_BATCH):
        index.add(rows[s: s + ADD_BATCH])
    # both paths are host-synchronous per add (numpy in, metadata out),
    # but force one search to drain any in-flight device work anyway
    index.search(rows[:1], 1)
    add_s = time.perf_counter() - t0

    q = rows[:SEARCH_BATCH]
    index.search(q, K)  # warm the search program at this bucket
    t0 = time.perf_counter()
    for _ in range(SEARCH_REPS):
        d, u = index.search(q, K)
    search_s = time.perf_counter() - t0
    assert (u[:, 0] == np.arange(SEARCH_BATCH)).all()

    out = {
        "engine": tag,
        "rows": ROWS,
        "add_rows_per_s": round(ROWS / add_s, 1),
        "add_ms_per_batch": round(1000 * add_s / (ROWS // ADD_BATCH), 2),
        "search_qps": round(SEARCH_BATCH * SEARCH_REPS / search_s, 1),
        "search_ms_per_batch": round(1000 * search_s / SEARCH_REPS, 2),
    }
    log(out)
    return out


def worker(proc: int, nproc: int, port: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.parallel import multihost

    cfg = Config(data_dir="/tmp/bench_multihost_data", index_kind="sharded",
                 dist_coordinator=f"127.0.0.1:{port}",
                 dist_num_processes=nproc, dist_process_id=proc,
                 dist_ping_interval=60.0)
    multihost.init_distributed(cfg.dist_coordinator, nproc, proc)

    if proc > 0:
        multihost.follower_main(cfg)
        return 0

    from dawnsearch_tpu.node import make_index_factory
    crew = multihost.MultihostCrew(ping_interval=0)
    index = make_index_factory(cfg, dim=384, crew=crew)()
    measure(index, "crew_2proc_gloo")
    crew.shutdown()
    return 0


def main() -> None:
    # --- 2-process crew (2 virtual CPU devices each, 4 shards) ---
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(p), "2", port],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for p in (0, 1)]
    crew_result = None
    for p in procs:
        out, _ = p.communicate(timeout=600)
        for line in out.splitlines():
            if line.startswith("BENCH "):
                crew_result = json.loads(line[len("BENCH "):])
                print(line, flush=True)
        if p.returncode != 0:
            print(out[-2000:], file=sys.stderr)
            raise SystemExit(f"crew worker failed rc={p.returncode}")

    # --- single-process baseline on the SAME device count (4) ---
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    from jax.sharding import Mesh

    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                ("dp", "shard"))
    # same construction defaults as the crew's factory (node.py
    # make_index_factory: dtype i8, host re-rank, default segments)
    single = measure(ShardedFlatIndex(mesh=mesh, dtype="i8"),
                     "single_proc_4dev")

    summary = {
        "rows": ROWS,
        "crew": crew_result,
        "single": single,
        "add_overhead_x": round(single["add_rows_per_s"]
                                / max(crew_result["add_rows_per_s"], 1e-9), 2),
        "search_overhead_x": round(single["search_qps"]
                                   / max(crew_result["search_qps"], 1e-9), 2),
    }
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 4:  # spawned worker: <proc> <nproc> <port>
        raise SystemExit(worker(int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3]))
    main()
