"""Pallas kernels vs XLA reference (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dawnsearch_tpu.models.bert import BertConfig, encode_batch
from dawnsearch_tpu.models.weights import init_params
from dawnsearch_tpu.ops.attention import fused_attention, fused_mean_pool


@pytest.fixture(scope="module")
def qkv(rng=None):
    r = np.random.default_rng(0)
    B, nh, S, hd = 4, 12, 32, 32
    mk = lambda: jnp.asarray(r.standard_normal((B, nh, S, hd)), jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[0, 20:] = 0
    mask[2, 5:] = 0
    bias = jnp.asarray(np.where(mask > 0, 0.0, -1e30), jnp.float32)
    return mk(), mk(), mk(), bias, mask


def xla_attention(q, k, v, bias):
    hd = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32)


def test_fused_attention_matches_xla(qkv):
    q, k, v, bias, _ = qkv
    ref = np.asarray(xla_attention(q, k, v, bias))
    out = np.asarray(fused_attention(q, k, v, bias, nh=q.shape[1]))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_attention_no_bias(qkv):
    q, k, v, _, _ = qkv
    ref = np.asarray(xla_attention(q, k, v, jnp.zeros(q.shape[:1] +
                                                      q.shape[2:3])))
    out = np.asarray(fused_attention(q, k, v, None, nh=q.shape[1]))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_mean_pool(qkv):
    *_, mask = qkv
    r = np.random.default_rng(1)
    B, S, H = mask.shape[0], mask.shape[1], 384
    hidden = jnp.asarray(r.standard_normal((B, S, H)), jnp.float32)
    m = jnp.asarray(mask)
    out = np.asarray(fused_mean_pool(hidden, m))
    ref = np.asarray(hidden) * mask[..., None]
    ref = ref.sum(1) / np.maximum(mask.sum(1), 1)[:, None]
    ref /= np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_fused_mean_pool_include_padding(qkv):
    *_, mask = qkv
    r = np.random.default_rng(2)
    hidden = jnp.asarray(r.standard_normal((4, 32, 384)), jnp.float32)
    out = np.asarray(fused_mean_pool(hidden, jnp.asarray(mask),
                                     include_padding=True))
    ref = np.asarray(hidden).mean(1)
    ref /= np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_full_model_fused_matches_xla():
    """encode_batch with both Pallas kernels == pure-XLA output."""
    params = init_params(jax.random.key(0))
    r = np.random.default_rng(3)
    ids = jnp.asarray(r.integers(100, 30000, (4, 32)), jnp.int32)
    mask = np.ones((4, 32), np.int32)
    mask[1, 10:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(encode_batch(params, ids, mask))
    fused = np.asarray(encode_batch(
        params, ids, mask,
        cfg=BertConfig(attn_impl="fused", pool_impl="fused")))
    np.testing.assert_allclose(fused, ref, atol=1e-4)


def test_fused_layer_matches_xla():
    """The whole-layer kernel (ops/layer.py) == pure-XLA encoder output."""
    params = init_params(jax.random.key(0))
    r = np.random.default_rng(9)
    ids = jnp.asarray(r.integers(100, 30000, (4, 32)), jnp.int32)
    mask = np.ones((4, 32), np.int32)
    mask[1, 10:] = 0
    mask[3, 5:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(encode_batch(
        params, ids, mask,
        cfg=BertConfig(attn_impl="xla", ffn_impl="xla")))
    fused = np.asarray(encode_batch(
        params, ids, mask, cfg=BertConfig(layer_impl="layer")))
    np.testing.assert_allclose(fused, ref, atol=1e-4)


def test_fused_layer_i8_close_to_f32():
    """W8A8 whole-layer kernel (layer_impl="layer_i8") stays within
    quantization tolerance of the f32 XLA encoder, masked rows
    included. Measured on-chip cos >= 0.9992 up to BERT-large shapes
    (doc/performance.md "i8 projections"); the assert bound is looser
    because interpret-mode runs this at MiniLM shape only."""
    params = init_params(jax.random.key(0))
    r = np.random.default_rng(13)
    ids = jnp.asarray(r.integers(100, 30000, (8, 32)), jnp.int32)
    mask = np.ones((8, 32), np.int32)
    mask[2, 7:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(encode_batch(
        params, ids, mask, cfg=BertConfig(attn_impl="xla", ffn_impl="xla")))
    for dtype in (jnp.float32, jnp.bfloat16):
        i8 = np.asarray(encode_batch(
            params, ids, mask,
            cfg=BertConfig(layer_impl="layer_i8", dtype=dtype)))
        cos = np.sum(i8 * ref, axis=-1)
        assert np.all(cos > 0.999), (dtype, cos.min())


def test_fused_layer_bf16_close_to_f32():
    """bf16 whole-layer kernel stays within bf16 tolerance of f32 XLA."""
    params = init_params(jax.random.key(0))
    r = np.random.default_rng(11)
    ids = jnp.asarray(r.integers(100, 30000, (8, 32)), jnp.int32)
    mask = jnp.asarray(np.ones((8, 32), np.int32))
    ref = np.asarray(encode_batch(
        params, ids, mask, cfg=BertConfig(attn_impl="xla", ffn_impl="xla")))
    fused = np.asarray(encode_batch(
        params, ids, mask,
        cfg=BertConfig(layer_impl="layer", dtype=jnp.bfloat16)))
    cos = np.sum(fused * ref, axis=-1)
    assert np.all(cos > 0.999)
