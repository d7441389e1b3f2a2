"""Quantizer tests: i24 wire codec, i16, i8 storage (vs src/search/vector.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dawnsearch_tpu.ops import quant as Q
from dawnsearch_tpu.ops.vector import EM_LEN


def test_i24_roundtrip_precision(unit_vectors):
    v = unit_vectors(1)[0]
    b = Q.to_i24_bytes(v)
    assert len(b) == EM_LEN * 3  # 1152 bytes (vector.rs i24 wire size)
    back = Q.from_i24_bytes(b)
    # 24-bit over [-1,1]: step = 2/0x7FFFFF ~ 2.4e-7
    np.testing.assert_allclose(back, v, atol=3e-7)


def test_i24_reference_encoding_values():
    # Exact byte layout per vector.rs:74-86: v = int((x+1)/2 * 0x7FFFFF), LE bytes.
    x = np.zeros(EM_LEN, dtype=np.float32)
    x[0] = 1.0
    x[1] = -1.0
    b = Q.to_i24_bytes(x)
    assert b[0:3] == bytes([0xFF, 0xFF, 0x7F])  # +1 -> 0x7FFFFF
    assert b[3:6] == bytes([0x00, 0x00, 0x00])  # -1 -> 0
    mid = int((0.5) * 0x7FFFFF)  # 0.0 -> halfway (truncated like the `as i32` cast)
    assert b[6:9] == bytes([mid & 0xFF, (mid >> 8) & 0xFF, (mid >> 16) & 0xFF])


def test_i24_rejects_unnormalized():
    with pytest.raises(ValueError):
        Q.from_i24_bytes(b"\x00" * (EM_LEN * 3))
    with pytest.raises(ValueError):
        Q.from_i24_bytes(b"\x00" * 5)


def test_i16_matches_reference_formula(rng):
    x = (rng.standard_normal(EM_LEN) * 0.05).astype(np.float32)
    q = np.asarray(Q.to_i16(jnp.asarray(x)))
    expected = np.round(x * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(q, expected)
    back = np.asarray(Q.from_i16(jnp.asarray(q)))
    np.testing.assert_allclose(back, x, atol=1.0 / 32767)


def test_i8_roundtrip_error_small(unit_vectors):
    v = unit_vectors(32)
    q = Q.quantize_i8(jnp.asarray(v))
    assert q.codes.dtype == jnp.int8
    assert q.codes.shape == (32, EM_LEN)
    back = np.asarray(Q.dequantize_i8(q))
    # max component of a unit 384-d vector is ~0.2; i8 step = max/127.
    err = np.abs(back - v).max()
    assert err < 2e-3


def test_i8_scores_close_to_exact(unit_vectors):
    q = unit_vectors(8)
    x = unit_vectors(256)
    db = Q.quantize_i8(jnp.asarray(x))
    approx = np.asarray(Q.scores_i8(jnp.asarray(q), db))
    exact = 1.0 - q @ x.T
    np.testing.assert_allclose(approx, exact, atol=5e-3)


def test_i8_preserves_topk_order(unit_vectors):
    # recall@10 of i8 scoring vs exact must be high on random data
    q = unit_vectors(4)
    x = unit_vectors(2000)
    db = Q.quantize_i8(jnp.asarray(x))
    approx = np.asarray(Q.scores_i8(jnp.asarray(q), db))
    exact = 1.0 - q @ x.T
    for b in range(q.shape[0]):
        top_exact = set(np.argsort(exact[b])[:10].tolist())
        top_approx = set(np.argsort(approx[b])[:10].tolist())
        assert len(top_exact & top_approx) >= 9
