"""Host-side NSW graph index — the CPU-parity experiment.

Capability-envelope twin of the reference's hand-rolled
navigable-small-world index (/root/reference/examples_old/search_nsw.rs:
24-190: greedy search + neighbor expansion during insert). This is the
pointer-chasing design the TPU index deliberately does NOT use
(doc/performance.md explains why); it exists to reproduce the
reference's CPU-side A/B and as a recall baseline for graph methods.

Run: [DAWNSEARCH_JAX_PLATFORM=cpu] python examples/search_nsw.py [n_rows] [n_queries]
"""

from __future__ import annotations

import heapq
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class NSWIndex:
    """Navigable small world: greedy beam search over a built graph."""

    def __init__(self, dim: int = 384, m: int = 16, ef_build: int = 32,
                 seed: int = 0):
        self.m = m
        self.ef_build = ef_build
        self.vectors: list[np.ndarray] = []
        self.neighbors: list[list[int]] = []
        self.rng = np.random.default_rng(seed)

    def _search_graph(self, q: np.ndarray, ef: int) -> list[tuple[float, int]]:
        """Beam search -> [(distance, id)] up to ef, ascending."""
        if not self.vectors:
            return []
        entry = int(self.rng.integers(0, len(self.vectors)))
        d0 = 1.0 - float(q @ self.vectors[entry])
        visited = {entry}
        cand = [(d0, entry)]            # min-heap of frontier
        best = [(-d0, entry)]           # max-heap of current results
        while cand:
            d, node = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            for nb in self.neighbors[node]:
                if nb in visited:
                    continue
                visited.add(nb)
                dn = 1.0 - float(q @ self.vectors[nb])
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, i) for nd, i in best)

    def add(self, v: np.ndarray) -> int:
        new_id = len(self.vectors)
        found = self._search_graph(v, self.ef_build)
        self.vectors.append(np.asarray(v, np.float32))
        links = [i for _, i in found[: self.m]]
        self.neighbors.append(links)
        for nb in links:  # bidirectional, pruned to 2m
            lst = self.neighbors[nb]
            lst.append(new_id)
            if len(lst) > 2 * self.m:
                dists = [1.0 - float(self.vectors[nb] @ self.vectors[j])
                         for j in lst]
                order = np.argsort(dists)[: 2 * self.m]
                self.neighbors[nb] = [lst[j] for j in order]
        return new_id

    def search(self, q: np.ndarray, k: int, ef: int = 64):
        found = self._search_graph(np.asarray(q, np.float32), max(ef, k))
        return found[:k]


def main(n_rows: int = 20_000, n_queries: int = 100) -> None:
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((64, 384)).astype(np.float32)
    x = centers[rng.integers(0, 64, n_rows)] + \
        0.3 * rng.standard_normal((n_rows, 384)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(n_rows, n_queries, replace=False)]

    ix = NSWIndex()
    t0 = time.perf_counter()
    for row in x:
        ix.add(row)
    print(f"built NSW over {n_rows} rows in {time.perf_counter()-t0:.1f}s")

    exact = np.argsort(1.0 - q @ x.T, axis=1)[:, :10]
    t0 = time.perf_counter()
    found = [ix.search(qq, 10) for qq in q]
    dt = time.perf_counter() - t0
    recall = np.mean([len({i for _, i in f} & set(t)) / 10
                      for f, t in zip(found, exact)])
    print(f"search: {1e3*dt/n_queries:.2f} ms/query "
          f"({n_queries/dt:.0f} qps), recall@10={recall:.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 100)
