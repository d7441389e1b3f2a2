"""Embedding vector primitives, batched for TPU.

TPU-native rebuild of the reference's scalar-loop vector math
(/root/reference/src/search/vector.rs). Where the reference defines
per-pair scalar functions (`distance`, `distance_ip`, `distance_cosine`,
vector.rs:89-134), we define *batched* jnp ops so the MXU does the work:
a (B, D) x (N, D) score computation is one matmul.

Conventions (matching the reference semantics):
- EM_LEN = 384 (vector.rs:26)
- "distance" == squared L2 (vector.rs:95-97)
- "distance_ip" == raw inner product; for normalized vectors the index
  orders by 1 - ip like USearch's IP metric (search_provider.rs:35-42)
- normalization tolerance 0.01 (vector.rs:185-192)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

EM_LEN = 384
MAX_VECTOR_DELTA = 0.01


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis` (reference: vector.rs:194-197, batched)."""
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(norm, eps)


def vector_length(v: jax.Array, axis: int = -1) -> jax.Array:
    """L2 norm (reference: vector.rs:181-183)."""
    return jnp.linalg.norm(v, axis=axis)


def is_normalized(v: jax.Array, axis: int = -1, tol: float = MAX_VECTOR_DELTA) -> jax.Array:
    """Whether ||v|| is within `tol` of 1 and finite (vector.rs:185-192)."""
    l = vector_length(v.astype(jnp.float32), axis=axis)
    return jnp.isfinite(l) & (l > 1.0 - tol) & (l < 1.0 + tol)


def l2_sq(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Squared L2 distance, elementwise over the batch (vector.rs:95-97)."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(d * d, axis=axis)


def inner_product(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Inner product over `axis` (vector.rs:99-101)."""
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=axis)


def cosine_distance(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """1 - <a, b>; equals cosine distance for normalized inputs (vector.rs:128-134)."""
    return 1.0 - inner_product(a, b, axis=axis)


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise_scores(
    queries: jax.Array, database: jax.Array, metric: str = "ip"
) -> jax.Array:
    """Batched (B, D) x (N, D) -> (B, N) score matrix on the MXU.

    metric="ip"  -> distance = 1 - q.x   (USearch MetricKind::IP ordering,
                    reference search_provider.rs:35-42: lower is better)
    metric="l2"  -> squared L2 distance
    metric="dot" -> raw inner product (higher is better; caller negates)
    """
    q = queries.astype(jnp.float32)
    x = database.astype(jnp.float32)
    dots = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if metric == "dot":
        return dots
    if metric == "ip":
        return 1.0 - dots
    if metric == "l2":
        qq = jnp.sum(q * q, axis=-1, keepdims=True)
        xx = jnp.sum(x * x, axis=-1)
        return jnp.maximum(qq - 2.0 * dots + xx[None, :], 0.0)
    raise ValueError(f"unknown metric: {metric}")


def random_address(key: jax.Array, dim: int = EM_LEN) -> jax.Array:
    """Random unit vector; components uniform [0,1) then normalized,
    matching the reference's rng.gen() semantics (vector.rs:168-179)."""
    v = jax.random.uniform(key, (dim,), dtype=jnp.float32)
    return normalize(v)


# ---------------------------------------------------------------------------
# Host-side byte casts (reference: vector.rs:199-216). Numpy instead of
# unsafe pointer casts; used by the SQLite store for embedding blobs.
# ---------------------------------------------------------------------------


def embedding_to_bytes(v: np.ndarray) -> bytes:
    """f32[D] -> little-endian bytes, validating normalization
    (reference vector.rs:207-212)."""
    v = np.asarray(v, dtype="<f4")
    _check_normalized_np(v)
    return v.tobytes()


def bytes_to_embedding(b: bytes, dim: int = EM_LEN) -> np.ndarray:
    """bytes -> f32[D], validating length and normalization
    (reference vector.rs:199-205)."""
    if len(b) != dim * 4:
        raise ValueError(f"expected {dim * 4} bytes, got {len(b)}")
    v = np.frombuffer(b, dtype="<f4").copy()
    _check_normalized_np(v)
    return v


def _check_normalized_np(v: np.ndarray) -> None:
    l = float(np.linalg.norm(v.astype(np.float64)))
    if not np.isfinite(l) or not (1.0 - MAX_VECTOR_DELTA < l < 1.0 + MAX_VECTOR_DELTA):
        raise ValueError(f"Vector is not normalized (length {l})")
