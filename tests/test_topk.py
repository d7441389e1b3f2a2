"""Top-k selection/merge + host BestResults (vs src/search/best_results.rs)."""

import jax.numpy as jnp
import numpy as np

from dawnsearch_tpu.ops import topk as T


def test_top_k_smallest(rng):
    s = rng.standard_normal((3, 50)).astype(np.float32)
    vals, idx = T.top_k_smallest(jnp.asarray(s), 5)
    for b in range(3):
        expected = np.sort(s[b])[:5]
        np.testing.assert_allclose(np.asarray(vals)[b], expected, rtol=1e-6)
        np.testing.assert_array_equal(np.sort(np.asarray(idx)[b]),
                                      np.sort(np.argsort(s[b])[:5]))


def test_merge_topk(rng):
    a = rng.standard_normal((1, 8)).astype(np.float32)
    b = rng.standard_normal((1, 8)).astype(np.float32)
    ia = np.arange(8)[None, :]
    ib = np.arange(100, 108)[None, :]
    vals, ids = T.merge_topk(jnp.asarray(a), jnp.asarray(ia),
                             jnp.asarray(b), jnp.asarray(ib), 8)
    all_scores = np.concatenate([a, b], axis=-1)[0]
    all_ids = np.concatenate([ia, ib], axis=-1)[0]
    order = np.argsort(all_scores)[:8]
    np.testing.assert_allclose(np.asarray(vals)[0], all_scores[order], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids)[0], all_ids[order])


class TestBestResults:
    def test_insert_dedup(self):
        br = T.BestResults(3)
        assert br.insert("a", 1.0)
        assert not br.insert("a", 2.0)  # dup id rejected (best_results.rs:44-49)
        assert len(br) == 1

    def test_dedup_keeps_better(self):
        br = T.BestResults(3)
        br.insert("a", 2.0)
        br.insert("a", 1.0)
        assert br.sorted()[0][1] == 1.0

    def test_eviction_at_capacity(self):
        br = T.BestResults(2)
        br.insert("a", 1.0)
        br.insert("b", 3.0)
        assert not br.insert("c", 5.0)  # worse than worst, rejected
        assert br.insert("d", 2.0)  # evicts b
        ids = [i for i, _, _ in br.sorted()]
        assert ids == ["a", "d"]

    def test_worst_distance_semantics(self):
        br = T.BestResults(2)
        assert br.worst_distance() is None
        br.insert("a", 1.5)
        assert br.worst_distance() == 1.5
        br.insert("b", 0.5)
        assert br.worst_distance() == 1.5
        assert br.is_full()

    def test_sorted_ascending(self):
        br = T.BestResults(5)
        for i, d in enumerate([3.0, 1.0, 2.0]):
            br.insert(i, d)
        assert [d for _, d, _ in br.sorted()] == [1.0, 2.0, 3.0]
