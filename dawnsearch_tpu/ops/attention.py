"""Fused attention + fused pool/normalize Pallas kernels.

The encoder's dense projections already run at MXU peak (~95 TFLOPs
measured on v5e), but naive attention — though ~1% of the FLOPs at
MiniLM's head_dim=32 — costs ~40% of wall time because XLA materializes
the (B, nh, S, S) f32 scores tensor in HBM and pays layout changes
around the tiny per-head matmuls (reference equivalent:
/root/reference/src/embedding/model.rs:284-348, which materializes
scores the same way on candle).

`fused_attention` computes softmax(QKᵀ/√d + bias)·V per (batch row)
entirely in VMEM: grid over B, one block holds all heads' (S, hd)
tiles, scores never touch HBM. Sequences here are <=512 so the full
(S, S) tile fits — no online-softmax tiling needed (that machinery
buys nothing at S=128; see guides). Padding is handled by an additive
bias, exactly like the XLA path.

`fused_mean_pool` fuses masked mean-pool + L2 normalization
(reference: embedding_service.rs:126-134) into one pass.

Both kernels run in interpreter mode off-TPU so the CPU test mesh
exercises identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, nh: int,
                 scale: float):
    """One batch row: all heads, full (S, S) softmax in VMEM."""
    bias = bias_ref[0]  # (1, S) f32, 0 on valid keys / -1e30 on padding
    for h in range(nh):
        q = q_ref[0, h]  # (S, hd)
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = (p / l).astype(q.dtype)
        o_ref[0, h] = jnp.dot(
            p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nh",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: jax.Array | None, nh: int) -> jax.Array:
    """(B, nh, S, hd) q/k/v + (B, S) additive bias -> (B, nh, S, hd)."""
    B, nh_, S, hd = q.shape
    assert nh_ == nh
    if bias is None:
        bias = jnp.zeros((B, S), jnp.float32)
    spec = pl.BlockSpec((1, nh, S, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, nh=nh, scale=1.0 / (hd ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((B, nh, S, hd), q.dtype),
        grid=(B,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(q, k, v, bias[:, None, :].astype(jnp.float32))


# ---------------------------------------------------------------------------
# pool + normalize
# ---------------------------------------------------------------------------


def _pool_kernel(h_ref, m_ref, o_ref, *, include_padding: bool):
    h = h_ref[0].astype(jnp.float32)  # (S, H)
    if include_padding:
        pooled = jnp.mean(h, axis=0, keepdims=True)  # (1, H)
    else:
        m = m_ref[0].astype(jnp.float32)  # (1, S)
        weights = m.reshape(-1, 1)  # (S, 1)
        pooled = jnp.sum(h * weights, axis=0, keepdims=True)
        count = jnp.maximum(jnp.sum(weights), 1.0)
        pooled = pooled / count
    norm = jnp.sqrt(jnp.sum(pooled * pooled))
    o_ref[0] = pooled / jnp.maximum(norm, 1e-12)


@functools.partial(jax.jit, static_argnames=("include_padding",))
def fused_mean_pool(hidden: jax.Array, mask: jax.Array,
                    include_padding: bool = False) -> jax.Array:
    """(B, S, H) hidden + (B, S) mask -> (B, H) unit vectors, one pass."""
    B, S, H = hidden.shape
    out = pl.pallas_call(
        functools.partial(_pool_kernel, include_padding=include_padding),
        out_shape=jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(hidden, mask[:, None, :].astype(jnp.float32))
    return out[:, 0, :]
