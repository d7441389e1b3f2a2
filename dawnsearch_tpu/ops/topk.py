"""Top-k selection and merging.

Device side, the reference's O(k)-scan accumulator
(/root/reference/src/search/best_results.rs:28-108) becomes `lax.top_k`
over batched score matrices, and distributed merging becomes
`lax.top_k` over an `all_gather` of per-shard (scores, ids)
(see dawnsearch_tpu.parallel.sharded_index).

Host side, `BestResults` mirrors the reference semantics exactly —
dedup by result id, bounded size k, worst-distance tracking
(best_results.rs:44-107) — because the P2P layer still needs an
incremental, deadline-driven merge of remote Page packets
(search_service.rs:213-260).
"""

from __future__ import annotations

import dataclasses
from typing import Generic, Hashable, TypeVar

import jax
import jax.numpy as jnp

T = TypeVar("T")


def top_k_smallest(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Smallest-k along the last axis -> (values, indices).

    `scores` are distances (lower = better), matching the reference's
    ascending sort (best_results.rs:71-79). Uses lax.top_k on negated
    scores — one fused XLA op instead of a scan.
    """
    neg_vals, idx = jax.lax.top_k(-scores, k)
    return -neg_vals, idx


def merge_topk(
    scores_a: jax.Array,
    ids_a: jax.Array,
    scores_b: jax.Array,
    ids_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two (…, k)-ish candidate sets into the best k (smallest scores)."""
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    vals, idx = top_k_smallest(scores, k)
    return vals, jnp.take_along_axis(ids, idx, axis=-1)


@dataclasses.dataclass
class _Entry(Generic[T]):
    id: Hashable
    distance: float
    payload: T


class BestResults(Generic[T]):
    """Bounded best-k set with id dedup (reference best_results.rs:28-108).

    Used on the host for merging remote peers' results as they stream in;
    `worst_distance()` feeds the network `distance_limit`
    (reference search_service.rs:222).
    """

    def __init__(self, k: int):
        if k <= 0:
            raise ValueError("k must be positive")
        self.k = k
        self._entries: dict[Hashable, _Entry[T]] = {}

    def __len__(self) -> int:
        return len(self._entries)

    def insert(self, id: Hashable, distance: float, payload: T = None) -> bool:
        """Insert unless a duplicate id or worse than the current worst of a
        full set (best_results.rs:44-65). Returns True if inserted."""
        if id in self._entries:
            # Keep the better of the two distances for the same id.
            if distance < self._entries[id].distance:
                self._entries[id] = _Entry(id, distance, payload)
            return False
        if len(self._entries) >= self.k:
            worst_id, worst = max(self._entries.items(), key=lambda kv: kv[1].distance)
            if distance >= worst.distance:
                return False
            del self._entries[worst_id]
        self._entries[id] = _Entry(id, distance, payload)
        return True

    def is_full(self) -> bool:
        return len(self._entries) >= self.k

    def worst_distance(self) -> float | None:
        """Distance of the worst kept entry, or None if empty
        (best_results.rs:81-95; used as distance_limit only when full,
        search_service.rs:216-222)."""
        if not self._entries:
            return None
        return max(e.distance for e in self._entries.values())

    def sorted(self) -> list[tuple[Hashable, float, T]]:
        """Ascending by distance (best_results.rs:71-79)."""
        out = sorted(self._entries.values(), key=lambda e: e.distance)
        return [(e.id, e.distance, e.payload) for e in out]
