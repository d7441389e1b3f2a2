"""Subprocess worker for tests/test_multihost.py.

Runs ONE process of a 2-process multihost crew on virtual CPU devices
(2 per process -> a 4-shard global mesh), the same gloo-collective code
path a real pod takes over DCN. Invoked as:

    python tests/multihost_worker.py <process_id> <num_processes> \
        <coordinator_port> <data_dir> <scenario>

Scenario "index": the leader drives MultihostShardedIndex directly —
add in three batches (auto + explicit ids), search, exact-recall check
against numpy, save, stop — and prints machine-readable RESULT lines
the test asserts on. Followers mirror through run_follower. Scenario
"node": the leader runs a full DawnNode (HTTP serving path) against the
crew-wrapped index.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    proc, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, data_dir, scenario = sys.argv[3], sys.argv[4], sys.argv[5]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    import numpy as np

    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.parallel import multihost

    cfg = Config(data_dir=data_dir, index_kind="sharded",
                 dist_coordinator=f"127.0.0.1:{port}",
                 dist_num_processes=nproc, dist_process_id=proc,
                 dist_ping_interval=2.0)  # fast pings: exercise keepalive
    multihost.init_distributed(cfg.dist_coordinator, nproc, proc)

    if proc > 0:
        if scenario == "failadd":
            # inject a follower-LOCAL device failure in add(): the
            # fail-stop contract says run_follower must raise (crew
            # dies visibly), never log-and-desync
            from dawnsearch_tpu.parallel.sharded_index import (
                ShardedFlatIndex)

            def boom(self, *a, **k):
                raise RuntimeError("injected follower-local failure")

            # the follower's half of an ADD is _commit_add (the leader
            # ships its finished _prepare_add plan over the wire)
            ShardedFlatIndex._commit_add = boom
            try:
                multihost.follower_main(cfg)
            except RuntimeError as e:
                print("RESULT " + json.dumps(
                    {"role": "follower", "ok": False, "died": True,
                     "err": str(e)}), flush=True)
                os._exit(0)  # skip interpreter teardown: the leader may
                #              still hold half-open gloo state
            print("RESULT " + json.dumps(
                {"role": "follower", "ok": False, "died": False}),
                flush=True)
            return 0
        multihost.follower_main(cfg)
        print("RESULT " + json.dumps({"role": "follower", "ok": True}),
              flush=True)
        return 0

    if scenario == "node":
        return leader_node(cfg)
    if scenario == "failadd":
        return leader_failadd(cfg)
    return leader_index(cfg)


def leader_index(cfg) -> int:
    """Drive the wrapped index directly (no encoder): add/search/save."""
    import numpy as np

    from dawnsearch_tpu.node import make_index_factory
    from dawnsearch_tpu.parallel import multihost

    crew = multihost.MultihostCrew(ping_interval=cfg.dist_ping_interval,
                                   coordinator=cfg.dist_coordinator)
    index = make_index_factory(cfg, dim=384, crew=crew)()

    rng = np.random.default_rng(3)
    rows = rng.standard_normal((700, 384)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    index.add(rows[:256])
    index.add(rows[256:600])
    # explicit ids on the last batch (the store contract: row id + 1)
    index.add(rows[600:], ids=np.arange(600, 700, dtype=np.int64))

    q = rows[:16]
    d, u = index.search(q, 10)
    exact = np.argsort(1.0 - q @ rows.T, axis=1)[:, :10]
    recall = float(np.mean([len(set(u[b].tolist())
                                & set(exact[b].tolist())) / 10
                            for b in range(len(q))]))
    self_hits = bool((u[:, 0] == np.arange(len(q))).all())
    # odd batch (pads by repetition) + single-vector call
    d1, u1 = index.search(rows[5], 5)

    import time
    time.sleep(5)  # idle across >1 ping interval: keepalive must hold

    d2, u2 = index.search(q[:3], 10)
    snap = os.path.join(cfg.data_dir, "crew_snapshot.npz")
    index.save(snap)

    print("RESULT " + json.dumps({
        "role": "leader", "count": len(index), "recall": recall,
        "self_hits": self_hits,
        "single_hit": int(u1[0]) == 5,
        "post_idle_hit": bool((u2[:, 0] == np.arange(3)).all()),
        "snapshot": os.path.exists(snap),
    }), flush=True)
    crew.shutdown()
    return 0


def leader_failadd(cfg) -> int:
    """Leader half of the fail-stop injection: dispatch one add whose
    follower half raises a local device failure. The follower dies
    (fail-stop); the leader's half of the global-mesh collective then
    either raises a distributed-runtime error or blocks until the crew
    is torn down — either way the desync is VISIBLE, never silent."""
    import threading

    import numpy as np

    from dawnsearch_tpu.node import make_index_factory
    from dawnsearch_tpu.parallel import multihost

    crew = multihost.MultihostCrew(  # ping 0: deterministic stream
        ping_interval=0, coordinator=cfg.dist_coordinator)
    index = make_index_factory(cfg, dim=384, crew=crew)()

    rows = np.random.default_rng(0).standard_normal((16, 384))
    rows = (rows / np.linalg.norm(rows, axis=1, keepdims=True)).astype(
        np.float32)
    state = {"outcome": "blocked"}

    def do_add():
        try:
            index.add(rows)
            index.flush()  # broadcast NOW (16 rows sit below the
            #                dist_add_flush_rows coalescing threshold)
            state["outcome"] = "completed"
        except Exception as e:  # distributed runtime error = visible
            state["outcome"] = "raised"
            state["err"] = f"{type(e).__name__}: {e}"[:500]

    t = threading.Thread(target=do_add, daemon=True)
    t.start()
    t.join(timeout=60.0)
    print("RESULT " + json.dumps({"role": "leader", **state}), flush=True)
    # no crew.shutdown(): the follower is dead, OP_STOP would hang; and
    # the add thread may be wedged in the peerless collective — leave
    # via _exit (daemon thread, no teardown)
    os._exit(0)


def leader_node(cfg) -> int:
    """Full DawnNode on the crew: insert pages through the service,
    query through the provider stack (batcher coalescing + re-rank)."""
    import numpy as np

    from dawnsearch_tpu.node import DawnNode

    cfg.web = False
    node = DawnNode(cfg).start()
    texts = [f"document number {i} about topic {i % 7}" for i in range(40)]
    urls = [f"http://x.example/{i}" for i in range(40)]
    ids = node.service.insert_pages(list(zip(urls, texts, texts)))
    res = node.service.text_search("document number 3", search_remote=False)
    ok = len(res.pages) > 0 and all(i is not None for i in ids)
    print("RESULT " + json.dumps({
        "role": "leader", "count": len(node.provider.index),
        "inserted": sum(1 for i in ids if i is not None),
        "served": ok,
    }), flush=True)
    node.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
