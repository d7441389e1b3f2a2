"""Fused FFN + residual + LayerNorm Pallas kernel.

After the packed attention kernel landed (ops/attention.py), the
profile shows the encoder is FFN-bound: the two FFN matmuls + gelu +
LayerNorm cost ~9.3 ms/layer at B=2048 S=128 (~74 TFLOPs effective) and
XLA round-trips the (B*S, 1536) intermediate through HBM (~1.6 GB/layer
both ways). This kernel computes

    y = LayerNorm(x + gelu(x @ W1 + b1) @ W2 + b2)

per M-tile with the intermediate resident in VMEM and both weight
matrices loaded once (constant index_map -> no per-step refetch).
Matmuls accumulate f32 on the MXU; gelu (exact erf, HF parity) and
LayerNorm run f32 — numerics identical to the unfused path
(tests/test_pallas_kernels.py).

Reference equivalent: BertIntermediate + BertOutput
(/root/reference/src/embedding/model.rs:409-464), which materializes
the intermediate tensor the same way on candle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x: jax.Array) -> jax.Array:
    """Polynomial erf (Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7):
    Mosaic lowers neither erf nor erfc, and 1.5e-7 absolute error is
    an order below the f32 parity tolerance of the encoder tests."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b_ref,
                o_ref, *, eps: float):
    x = x_ref[...]                        # (TM, H) compute dtype
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)      # (TM, I) f32
    h = (0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    y = y + x.astype(jnp.float32)                # residual
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_ffn(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
              eps: float = 1e-12) -> jax.Array:
    """(M, H) x -> LayerNorm(x + gelu(x@w1+b1)@w2 + b2) in one pass.

    Weights are (H, I)/(I, H) in the model's x@w convention; the six
    small operands ride constant BlockSpecs (loaded once, resident
    across the whole grid)."""
    M, H = x.shape
    I = w1.shape[1]
    tm = 256
    while M % tm:
        tm //= 2
    dt = x.dtype

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, H), dt),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((H, I)),             # w1
            const((1, I)),             # b1
            const((I, H)),             # w2
            const((1, H)),             # b2
            const((1, H)),             # ln scale
            const((1, H)),             # ln bias
        ],
        out_specs=pl.BlockSpec((tm, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w1.astype(dt), b1[None, :], w2.astype(dt), b2[None, :],
      ln_scale[None, :], ln_bias[None, :])
