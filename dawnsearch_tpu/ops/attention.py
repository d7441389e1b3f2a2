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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                 group: int):
    """(TB, nh, S, hd) block: all heads of TB batch rows in one step.

    Round-1's kernel put ONE row per grid step and looped heads in
    Python — 12 tiny K=32 matmuls per step, B grid steps, pure
    per-step overhead (it lost to XLA everywhere,
    doc/performance.md r1). Here every step runs ONE batched
    dot_general over (TB*G, S, hd) so the MXU sees deep batched work,
    and TB rows amortize the pipeline; a head-group loop (G heads at a
    time, unrolled) bounds the f32 scores tile to fit VMEM at S=512.
    """
    TB, nh, S, hd = q_ref.shape
    bias = bias_ref[...]  # (TB, 1, S) f32: 0 valid / -1e30 padded keys
    for g0 in range(0, nh, group):
        g = min(group, nh - g0)
        q = q_ref[:, g0: g0 + g].reshape(TB * g, S, hd)
        k = k_ref[:, g0: g0 + g].reshape(TB * g, S, hd)
        v = v_ref[:, g0: g0 + g].reshape(TB * g, S, hd)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (TB*g, S, S)
        s = s.reshape(TB, g, S, S) + bias[:, :, None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # normalize the small (S, hd) output, not the (S, S) probs:
        # S/hd-x fewer divisions on the VPU
        o = jax.lax.dot_general(
            p.astype(q.dtype).reshape(TB * g, S, S), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(TB, g, S, hd)
        o = o * (1.0 / l)
        o_ref[:, g0: g0 + g] = o.astype(o_ref.dtype)


def _tile_plan(B: int, nh: int, S: int) -> tuple[int, int]:
    """(rows per grid step, heads per group) under a ~4 MB f32 scores
    budget — full (S, S) softmax per head, no online tiling (S <= 512
    always fits once grouped; flash machinery buys nothing here)."""
    budget = 1 << 21  # f32 elements ~= 8 MB (scoped vmem raised below)
    per_head = S * S
    group = max(1, min(nh, budget // per_head))
    tb = 1  # largest power of two that fits the budget and divides B
    while (tb * 2 * per_head * group <= budget and B % (tb * 2) == 0
           and tb < 256):
        tb *= 2
    return tb, group


@functools.partial(jax.jit, static_argnames=("nh",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: jax.Array | None, nh: int) -> jax.Array:
    """(B, nh, S, hd) q/k/v + (B, S) additive bias -> (B, nh, S, hd)."""
    B, nh_, S, hd = q.shape
    assert nh_ == nh
    if bias is None:
        bias = jnp.zeros((B, S), jnp.float32)
    tb, group = _tile_plan(B, nh, S)
    spec = pl.BlockSpec((tb, nh, S, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / (hd ** 0.5),
                          group=group),
        out_shape=jax.ShapeDtypeStruct((B, nh, S, hd), q.dtype),
        grid=(B // tb,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((tb, 1, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # default scoped limit is 16 MB; v5e has 128 MB physical
            # VMEM — the S=512 tile needs ~17 MB live
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v, bias[:, None, :].astype(jnp.float32))


# ---------------------------------------------------------------------------
# packed attention: heads stay on lanes, matmuls run dense on the MXU
# ---------------------------------------------------------------------------


def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, nh: int,
                   hd: int, scale: float):
    """(TB, S, H) blocks, H = nh*hd, natural hidden layout.

    Per 128-lane group of g = 128//hd heads, K and V are tiled g times
    and masked block-diagonally so ONE dense (S, 128) x (gS, 128)
    contraction computes every head's scores (the per-head K=hd matmul
    runs the MXU at hd/128 utilization AND serializes nh*TB tiny ops —
    measured 8.3 ms vs XLA 5.7 ms at B=2048 S=128; this formulation
    trades 128/hd-x padded FLOPs, which the MXU eats, for dense
    streaming). Softmax is per lane-block; output lands directly in
    (S, H) layout so the encoder needs NO head transposes at all.
    """
    TB, S, H = q_ref.shape
    g = 128 // hd
    bias = bias_ref[...]  # (TB, 1, S) f32
    bias_t = jnp.concatenate([bias] * g, axis=-1)  # (TB, 1, gS)
    # block-diagonal mask: row block h (rows hS:(h+1)S) keeps lanes
    # hd*h:hd*(h+1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g * S, 128), 0) // S
    lanes = jax.lax.broadcasted_iota(jnp.int32, (g * S, 128), 1) // hd
    bd_mask = (rows == lanes)
    for gi in range(nh // g):
        lo = gi * 128
        q = q_ref[:, :, lo: lo + 128]            # (TB, S, 128)
        k = k_ref[:, :, lo: lo + 128]
        v = v_ref[:, :, lo: lo + 128]
        k_bd = jnp.where(bd_mask, jnp.concatenate([k] * g, axis=1), 0)
        v_bd = jnp.where(bd_mask, jnp.concatenate([v] * g, axis=1), 0)
        s = jax.lax.dot_general(
            q, k_bd, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (TB, S, gS)
        s = s + bias_t
        parts, invs = [], []
        for h in range(g):  # per-head softmax on lane-aligned slices
            sh = s[:, :, h * S: (h + 1) * S]
            m = jnp.max(sh, axis=-1, keepdims=True)
            p = jnp.exp(sh - m)
            parts.append(p.astype(q.dtype))
            inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)  # (TB, S, 1)
            invs.append(jnp.broadcast_to(inv, (TB, S, hd)))
        p_cat = jnp.concatenate(parts, axis=-1)  # (TB, S, gS)
        o = jax.lax.dot_general(
            p_cat, v_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (TB, S, 128)
        o = o * jnp.concatenate(invs, axis=-1)
        o_ref[:, :, lo: lo + 128] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nh",))
def fused_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias: jax.Array | None, nh: int) -> jax.Array:
    """(B, S, H) q/k/v (heads packed on the feature axis, H = nh*hd) +
    (B, S) additive bias -> (B, S, H). Requires 128 % hd == 0 and
    128 % (S * 128//hd)-compatible shapes; callers fall back to
    `fused_attention` otherwise."""
    B, S, H = q.shape
    hd = H // nh
    assert 128 % hd == 0 and H % 128 == 0
    if bias is None:
        bias = jnp.zeros((B, S), jnp.float32)
    # scores per lane group: (TB, S, gS) f32; budget ~8 MB
    g = 128 // hd
    per_row = S * g * S
    tb = 1
    while (tb * 2 * per_row <= (1 << 21) and B % (tb * 2) == 0
           and tb < 256):
        tb *= 2
    spec = pl.BlockSpec((tb, S, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_kernel, nh=nh, hd=hd,
                          scale=1.0 / (hd ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((B, S, H), q.dtype),
        grid=(B // tb,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((tb, 1, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v, bias[:, None, :].astype(jnp.float32))


# ---------------------------------------------------------------------------
# pool + normalize
# ---------------------------------------------------------------------------


def _pool_kernel(h_ref, m_ref, o_ref, *, include_padding: bool):
    h = h_ref[...].astype(jnp.float32)  # (TB, S, H)
    if include_padding:
        pooled = jnp.mean(h, axis=1)  # (TB, H)
    else:
        w = m_ref[...].astype(jnp.float32).reshape(
            h.shape[0], h.shape[1], 1)  # (TB, S, 1)
        pooled = jnp.sum(h * w, axis=1)
        count = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # (TB, 1)
        pooled = pooled / count
    norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=1, keepdims=True))
    o_ref[...] = pooled / jnp.maximum(norm, 1e-12)


@functools.partial(jax.jit, static_argnames=("include_padding",))
def fused_mean_pool(hidden: jax.Array, mask: jax.Array,
                    include_padding: bool = False) -> jax.Array:
    """(B, S, H) hidden + (B, S) mask -> (B, H) unit vectors, one pass."""
    B, S, H = hidden.shape
    tb = 1  # rows per grid step (amortize per-step overhead)
    while tb < 64 and B % (tb * 2) == 0 and tb * 2 * S * H <= (1 << 20):
        tb *= 2
    return pl.pallas_call(
        functools.partial(_pool_kernel, include_padding=include_padding),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(hidden, mask[:, None, :].astype(jnp.float32))
