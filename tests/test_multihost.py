"""Multi-host (DCN) tier: 2 OS processes x 2 virtual CPU devices each
serve ONE 4-shard ShardedFlatIndex through gloo collectives — the same
jax.distributed code path a real pod takes over DCN, which is the only
instrument this single-chip bench provides (SURVEY §4's "multi-node
without a cluster" analog, one level up from the in-process mesh).

Covers: cluster bootstrap (parallel/multihost.init_distributed), the
broadcast control plane (INIT/ADD/SEARCH/SAVE/PING/STOP), exact-recall
parity against numpy on the leader, keepalive across idle gaps,
snapshot save through the collective gather, and cross-world reload —
the crew-written snapshot loads in THIS single-process suite (8-device
mesh re-stripe) with identical search results.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_crew(tmp_path, scenario: str, timeout: float = 300.0):
    """Spawn leader (pid 0) + follower (pid 1); return their RESULT
    dicts keyed by role."""
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(p), "2", str(port),
             str(tmp_path), scenario],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for p in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["role"]] = r
    assert {"leader", "follower"} <= set(results), outs
    return results


def test_crew_index_ops(tmp_path):
    res = _run_crew(tmp_path, "index")
    lead = res["leader"]
    assert lead["count"] == 700
    # bare-index recall: i8 quantized scan without the provider's f32
    # re-rank (single-process measures the same ~0.99 at this scale)
    assert lead["recall"] >= 0.98
    assert lead["self_hits"]
    assert lead["single_hit"] and lead["post_idle_hit"]
    assert lead["snapshot"]
    assert res["follower"]["ok"]

    # The crew-written snapshot is format-identical to a single-process
    # sharded snapshot: reload HERE (8-device conftest mesh, so the
    # saved 4 shards re-stripe through add()) and reproduce the search.
    from dawnsearch_tpu.index import load_index
    idx = load_index(os.path.join(tmp_path, "crew_snapshot.npz"))
    assert len(idx) == 700
    rng = np.random.default_rng(3)  # worker's corpus, regenerated
    rows = rng.standard_normal((700, 384)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    _, u = idx.search(rows[:8], 10)
    exact = np.argsort(1.0 - rows[:8] @ rows.T, axis=1)[:, :10]
    rec = np.mean([len(set(u[b].tolist()) & set(exact[b].tolist())) / 10
                   for b in range(8)])
    assert rec >= 0.98 and (u[:, 0] == np.arange(8)).all()


def test_crew_full_node(tmp_path):
    res = _run_crew(tmp_path, "node")
    lead = res["leader"]
    assert lead["inserted"] == 40
    assert lead["count"] == 40
    assert lead["served"]
    assert res["follower"]["ok"]


def test_send_after_shutdown_is_dropped(monkeypatch):
    """A keepalive ping that loses the lock race to shutdown() must NOT
    broadcast into a crew whose followers already exited on OP_STOP —
    that wedges the leader in a peerless collective (round-3 review
    finding). send() re-checks _stopped under the lock."""
    from dawnsearch_tpu.parallel import multihost as mh

    sent = []
    monkeypatch.setattr(mh, "_bcast",
                        lambda x: (sent.append(np.array(x)), x)[1])
    crew = mh.MultihostCrew(ping_interval=0)
    crew.shutdown()
    assert [int(h[0]) for h in sent] == [mh.OP_STOP]
    crew.send(mh.OP_PING)  # the late timer thread's broadcast
    crew.send(mh.OP_ADD, (1, 1, 3), (np.zeros((1, 3), np.float32),))
    assert [int(h[0]) for h in sent] == [mh.OP_STOP]  # both dropped


def test_follower_fail_stop_on_op_before_init(tmp_path):
    """An op arriving while the follower has no index means the leader
    is entering a collective this process cannot join: the follower must
    fail stop (raise), not warn-and-skip — skipping hangs the leader
    inside the device program forever (round-3 review finding)."""
    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.parallel import multihost as mh

    crew = mh.MultihostCrew(ping_interval=0)
    headers = iter([
        np.array([mh.OP_PING, 0, 0, 0, 0, 0, 0, 0], np.int64),  # benign
        np.array([mh.OP_SEARCH, 8, 8, 10, 384, 0, 0, 0], np.int64),
    ])
    crew.recv_header = lambda: next(headers)
    payloads = []
    crew.recv = lambda shape, dtype: (payloads.append(shape),
                                      np.zeros(shape, dtype))[1]
    cfg = Config()
    cfg.data_dir = str(tmp_path)
    with pytest.raises(RuntimeError, match="failing"):
        mh.run_follower(crew, cfg, str(tmp_path / "index.npz"))
    # the payload was still consumed before raising (stream stays sane
    # for any diagnostics a wrapper might attempt)
    assert payloads == [(8, 384)]


def test_multihost_config_validation(tmp_path):
    """make_index_factory refuses multihost configs that cannot work,
    at BOOT (leader and follower run the same check via the same
    factory call in run_follower), not weeks later in a rebuild path:
    non-sharded index kinds, and a sub-mesh (mesh_shards != every
    device) — a sub-mesh could exclude all of some process's devices,
    leaving it with no addressable shard of any global buffer."""
    import jax
    import pytest

    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.node import make_index_factory

    def cfg(**kw):
        c = Config()
        c.data_dir = str(tmp_path / "data")
        c.dist_num_processes = 2
        for k, v in kw.items():
            setattr(c, k, v)
        return c

    with pytest.raises(ValueError, match="sharded"):
        make_index_factory(cfg(index_kind="flat"))
    with pytest.raises(ValueError, match="mesh_shards"):
        make_index_factory(cfg(index_kind="sharded", mesh_shards=4))
    # 0 (= every device) and the explicit full count are both fine
    make_index_factory(cfg(index_kind="sharded", mesh_shards=0))
    make_index_factory(cfg(index_kind="sharded",
                           mesh_shards=len(jax.devices())))
