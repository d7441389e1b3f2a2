"""L0 vector primitive tests vs. reference semantics (src/search/vector.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dawnsearch_tpu.ops import vector as V


def test_normalize_unit_length(rng):
    x = rng.standard_normal((5, V.EM_LEN)).astype(np.float32)
    n = np.asarray(V.normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_is_normalized_tolerance(unit_vectors):
    v = unit_vectors(1)[0]
    assert bool(V.is_normalized(jnp.asarray(v)))
    assert bool(V.is_normalized(jnp.asarray(v * 1.009)))  # inside 0.01 (vector.rs:185)
    assert not bool(V.is_normalized(jnp.asarray(v * 1.02)))
    assert not bool(V.is_normalized(jnp.asarray(v * np.float32(np.inf))))


def test_distances_match_naive(rng):
    a = rng.standard_normal((V.EM_LEN,)).astype(np.float32)
    b = rng.standard_normal((V.EM_LEN,)).astype(np.float32)
    np.testing.assert_allclose(
        float(V.l2_sq(jnp.asarray(a), jnp.asarray(b))),
        float(np.sum((a - b) ** 2)), rtol=1e-5)
    np.testing.assert_allclose(
        float(V.inner_product(jnp.asarray(a), jnp.asarray(b))),
        float(np.dot(a, b)), rtol=1e-5)
    np.testing.assert_allclose(
        float(V.cosine_distance(jnp.asarray(a), jnp.asarray(b))),
        1.0 - float(np.dot(a, b)), rtol=1e-5)


@pytest.mark.parametrize("metric", ["ip", "l2", "dot"])
def test_pairwise_scores(unit_vectors, metric):
    q = unit_vectors(4)
    x = unit_vectors(16)
    s = np.asarray(V.pairwise_scores(jnp.asarray(q), jnp.asarray(x), metric=metric))
    dots = q @ x.T
    if metric == "dot":
        expected = dots
    elif metric == "ip":
        expected = 1.0 - dots
    else:
        expected = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(s, expected, atol=2e-3)


def test_pairwise_l2_consistent_with_ip_for_unit(unit_vectors):
    # For normalized vectors: l2^2 = 2 * (1 - dot) = 2 * ip-distance.
    q, x = unit_vectors(3), unit_vectors(7)
    l2 = np.asarray(V.pairwise_scores(jnp.asarray(q), jnp.asarray(x), metric="l2"))
    ip = np.asarray(V.pairwise_scores(jnp.asarray(q), jnp.asarray(x), metric="ip"))
    np.testing.assert_allclose(l2, 2.0 * ip, atol=2e-3)


def test_random_address_is_unit():
    import jax
    v = V.random_address(jax.random.PRNGKey(7))
    assert bool(V.is_normalized(v))
    assert np.all(np.asarray(v) >= 0)  # uniform [0,1) components (vector.rs:168-179)


def test_byte_roundtrip(unit_vectors):
    v = unit_vectors(1)[0]
    b = V.embedding_to_bytes(v)
    assert len(b) == V.EM_LEN * 4
    back = V.bytes_to_embedding(b)
    np.testing.assert_array_equal(back, v)


def test_byte_cast_rejects_unnormalized(rng):
    v = rng.standard_normal(V.EM_LEN).astype(np.float32) * 5
    with pytest.raises(ValueError):
        V.embedding_to_bytes(v)
    with pytest.raises(ValueError):
        V.bytes_to_embedding(v.tobytes())
    with pytest.raises(ValueError):
        V.bytes_to_embedding(b"\x00" * 7)
