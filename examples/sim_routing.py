"""Semantic-address DHT routing simulation.

Capability-envelope twin of the reference's offline experiment
(/root/reference/examples_old/sim.rs:7-177): every node gets a random
unit-vector "semantic address"; documents are stored on the node whose
address is nearest to their embedding; a query greedily routes from a
random start node to neighbors closer (by inner product) to the query
vector, and we measure how often greedy routing reaches the true
nearest node — the feasibility question behind scaling the P2P network
beyond broadcast fan-out.

TPU-first twist: instead of the reference's per-node scalar loops over
i8 vectors, the whole simulation is batched linear algebra — one
(nodes, dim) matrix, neighbor tables from a top-k over one matmul,
routing steps vectorized over every query at once.

Run: python examples/sim_routing.py [n_nodes] [n_queries]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DAWNSEARCH_JAX_PLATFORM"):
    import jax
    jax.config.update("jax_platforms",
                      os.environ["DAWNSEARCH_JAX_PLATFORM"])

from dawnsearch_tpu.ops.quant import quantize_i8, dequantize_i8


def simulate(n_nodes: int = 1000, n_queries: int = 10_000, dim: int = 384,
             n_neighbors: int = 16, max_hops: int = 32, seed: int = 0,
             quantize: bool = True) -> float:
    rng = np.random.default_rng(seed)
    addr = rng.standard_normal((n_nodes, dim)).astype(np.float32)
    addr /= np.linalg.norm(addr, axis=1, keepdims=True)
    if quantize:  # the reference routes over i8 addresses (sim.rs)
        q = quantize_i8(addr)
        addr_eff = np.asarray(dequantize_i8(q))
    else:
        addr_eff = addr

    # Kademlia-ish neighbor table: each node knows its n nearest peers
    # plus a few random long links (small-world shortcuts).
    sims = addr_eff @ addr_eff.T
    np.fill_diagonal(sims, -np.inf)
    near = np.argsort(-sims, axis=1)[:, :n_neighbors]
    far = rng.integers(0, n_nodes, size=(n_nodes, 4))
    neighbors = np.concatenate([near, far], axis=1)  # (N, n_neighbors+4)

    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    truth = np.argmax(queries @ addr_eff.T, axis=1)

    cur = rng.integers(0, n_nodes, size=n_queries)
    cur_sim = np.einsum("qd,qd->q", queries, addr_eff[cur])
    active = np.ones(n_queries, bool)
    hops = 0
    for _ in range(max_hops):
        if not active.any():
            break
        cand = neighbors[cur[active]]  # (A, K)
        cand_sims = np.einsum("qd,qkd->qk", queries[active], addr_eff[cand])
        best = np.argmax(cand_sims, axis=1)
        best_sim = cand_sims[np.arange(len(best)), best]
        improved = best_sim > cur_sim[active] + 1e-9
        idx = np.nonzero(active)[0]
        move = idx[improved]
        cur[move] = cand[improved, best[improved]]
        cur_sim[move] = best_sim[improved]
        done = idx[~improved]
        active[done] = False  # local optimum reached
        hops += 1
    success = float(np.mean(cur == truth))
    return success


if __name__ == "__main__":
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    for quant in (False, True):
        ratio = simulate(n_nodes, n_queries, quantize=quant)
        print(f"nodes={n_nodes} queries={n_queries} "
              f"i8={quant}: greedy routing success ratio {ratio:.3f}")
