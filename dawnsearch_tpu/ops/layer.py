"""Whole-transformer-layer Pallas kernel: one HBM round trip per layer.

After the packed attention (ops/attention.py) and fused FFN (ops/ffn.py)
kernels, the remaining encoder time is XLA's dense projections and the
activation traffic BETWEEN the fused regions: per layer the hidden
states stream HBM->VMEM->HBM six times (QKV dense, attention, out-proj,
LN, FFN-in, FFN-out). At B=2048 S=128 bf16 that is ~2.8 GB/layer of
HBM traffic for ~0.93 TFLOP of matmul — bandwidth-bound at ~45% MXU.

This kernel computes the ENTIRE post-LN BERT layer
(reference: BertLayer, /root/reference/src/embedding/model.rs:467-499)

    qkv  = x @ Wqkv + bqkv                       (one fused projection)
    ctx  = packed_attention(q, k, v, bias)       (scores stay in VMEM)
    x1   = LayerNorm(x + ctx @ Wo + bo)
    h    = gelu(x1 @ W1 + b1)
    y    = LayerNorm(x1 + h @ W2 + b2)

per (tb sequences x S tokens) block with EVERY intermediate resident in
VMEM: per layer, HBM sees one read of x and one write of y (~0.4
GB/layer at the shape above, a 7x traffic cut). All seven weight
operands ride constant BlockSpecs (loaded once, ~3.6 MB bf16 total —
MiniLM's 384-wide layers fit VMEM with room for a deep activation
block). Matmuls accumulate f32 on the MXU; softmax/LayerNorm run f32;
gelu uses the A&S 7.1.26 erf polynomial (|err|<=1.5e-7, Mosaic lowers
no erf) — numerics match the unfused path at the encoder tests' f32
tolerances.

Attention inside the block is the block-diagonal packed formulation of
ops/attention.py::_packed_kernel (heads stay on the 128-lane axis; one
dense (S,128)x(gS,128) MXU contraction scores g=128/hd heads at once),
so the layer needs NO (B,S,nh,hd) relayouts anywhere.

Requires 128 % head_dim == 0 and hidden % 128 == 0 (all-MiniLM shapes);
models outside that envelope use the per-op kernels via
BertConfig(layer_impl="ops").
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
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _ln(y32: jax.Array, scale_ref, bias_ref, eps: float) -> jax.Array:
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    y = (y32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale_ref[...].astype(jnp.float32) + \
        bias_ref[...].astype(jnp.float32)


def _packed_attention_block(q, k, v, bias, rel=None, *, nh: int, hd: int,
                            scale: float):
    """(TB, S, H) q/k/v + (TB, 1, S) bias -> (TB, S, H) context.

    Identical math to ops/attention.py::_packed_kernel, inlined so the
    whole layer shares one VMEM residency. rel: optional per-head
    relative-position score bias (MPNet), pre-packed to the group
    layout (nh//g, S, g*S) where block h of the last axis is head
    gi*g+h's (S, S) bias — one broadcast add per group, no relayout."""
    TB, S, H = q.shape
    g = 128 // hd
    bias_t = jnp.concatenate([bias] * g, axis=-1)  # (TB, 1, gS)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g * S, 128), 0) // S
    lanes = jax.lax.broadcasted_iota(jnp.int32, (g * S, 128), 1) // hd
    bd_mask = (rows == lanes)
    outs = []
    for gi in range(nh // g):
        lo = gi * 128
        qg = q[:, :, lo: lo + 128]
        kg = k[:, :, lo: lo + 128]
        vg = v[:, :, lo: lo + 128]
        k_bd = jnp.where(bd_mask, jnp.concatenate([kg] * g, axis=1), 0)
        v_bd = jnp.where(bd_mask, jnp.concatenate([vg] * g, axis=1), 0)
        s = jax.lax.dot_general(
            qg, k_bd, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (TB, S, gS)
        s = s + bias_t
        if rel is not None:
            s = s + rel[gi][None]  # (1, S, gS) over TB
        parts, invs = [], []
        for h in range(g):
            sh = s[:, :, h * S: (h + 1) * S]
            m = jnp.max(sh, axis=-1, keepdims=True)
            p = jnp.exp(sh - m)
            parts.append(p.astype(qg.dtype))
            inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            invs.append(jnp.broadcast_to(inv, (TB, S, hd)))
        p_cat = jnp.concatenate(parts, axis=-1)
        o = jax.lax.dot_general(
            p_cat, v_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o * jnp.concatenate(invs, axis=-1))
    return jnp.concatenate(outs, axis=-1)  # (TB, S, H) f32


def _layer_kernel(x_ref, bias_ref, *args, nh: int, hd: int, eps: float,
                  has_rel: bool = False):
    rel_ref = args[0] if has_rel else None
    (qkv_w_ref, qkv_b_ref, ao_w_ref, ao_b_ref, aln_s_ref, aln_b_ref,
     w1_ref, b1_ref, w2_ref, b2_ref, fln_s_ref, fln_b_ref,
     o_ref) = args[1 if has_rel else 0:]
    TB, S, H = x_ref.shape
    x = x_ref[...]                      # (TB, S, H) compute dtype
    x2d = x.reshape(TB * S, H)
    dt = x.dtype

    qkv = jax.lax.dot_general(
        x2d, qkv_w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + qkv_b_ref[...].astype(jnp.float32)).astype(dt)
    q = qkv[:, :H].reshape(TB, S, H)
    k = qkv[:, H: 2 * H].reshape(TB, S, H)
    v = qkv[:, 2 * H:].reshape(TB, S, H)

    ctx = _packed_attention_block(
        q, k, v, bias_ref[...], None if rel_ref is None else rel_ref[...],
        nh=nh, hd=hd, scale=1.0 / (hd ** 0.5)).astype(dt).reshape(TB * S, H)

    att = jax.lax.dot_general(
        ctx, ao_w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    att = att + ao_b_ref[...].astype(jnp.float32) + x2d.astype(jnp.float32)
    x1 = _ln(att, aln_s_ref, aln_b_ref, eps).astype(dt)  # (TB*S, H)

    h = jax.lax.dot_general(
        x1, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = (0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))).astype(dt)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32) + x1.astype(jnp.float32)
    y = _ln(y, fln_s_ref, fln_b_ref, eps)
    o_ref[...] = y.reshape(TB, S, H).astype(o_ref.dtype)


def _mm_i8(x32: jax.Array, wq_ref, ws_ref) -> jax.Array:
    """(M, K) f32 @ per-column-quantized i8 weights -> (M, N) f32.

    Dynamic per-row symmetric quantization of the activations (the
    selector kernel's proven recipe, ops/scan_select.py:152-157, moved
    in-kernel): row scale = absmax/127, s8xs8->s32 on the MXU (394 TOPS
    nominal — 2x the bf16 rate), both scales folded back in f32. Row
    quantization error is ~0.4% of row absmax; measured end-to-end
    effect is in fused_bert_layer_i8's docstring."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6)
    xq = jnp.round(x32 * (127.0 / s)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s * (1.0 / 127.0)) * \
        ws_ref[...].astype(jnp.float32)


def _layer_kernel_i8(x_ref, bias_ref, *args, nh: int, hd: int, eps: float,
                     has_rel: bool = False):
    """_layer_kernel with the four projections on the s8 MXU path.

    Attention (softmax numerics) stays in the compute dtype; residuals,
    LayerNorm and gelu stay f32 — in fact MORE of the datapath is f32
    than in the bf16 kernel because the i8 matmuls take f32 in and give
    f32 out, so the bf16 round trips between projections disappear."""
    rel_ref = args[0] if has_rel else None
    (qkv_wq_ref, qkv_ws_ref, qkv_b_ref, ao_wq_ref, ao_ws_ref, ao_b_ref,
     aln_s_ref, aln_b_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref,
     b2_ref, fln_s_ref, fln_b_ref, o_ref) = args[1 if has_rel else 0:]
    TB, S, H = x_ref.shape
    x = x_ref[...]                      # (TB, S, H) compute dtype
    dt = x.dtype
    x32 = x.reshape(TB * S, H).astype(jnp.float32)

    qkv = _mm_i8(x32, qkv_wq_ref, qkv_ws_ref) + \
        qkv_b_ref[...].astype(jnp.float32)
    qkv = qkv.astype(dt)
    q = qkv[:, :H].reshape(TB, S, H)
    k = qkv[:, H: 2 * H].reshape(TB, S, H)
    v = qkv[:, 2 * H:].reshape(TB, S, H)

    ctx = _packed_attention_block(
        q, k, v, bias_ref[...], None if rel_ref is None else rel_ref[...],
        nh=nh, hd=hd, scale=1.0 / (hd ** 0.5)).reshape(TB * S, H)  # f32

    att = _mm_i8(ctx, ao_wq_ref, ao_ws_ref) + \
        ao_b_ref[...].astype(jnp.float32) + x32
    x1 = _ln(att, aln_s_ref, aln_b_ref, eps)         # (TB*S, H) f32

    h = _mm_i8(x1, w1q_ref, w1s_ref) + b1_ref[...].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))    # f32
    y = _mm_i8(h, w2q_ref, w2s_ref) + b2_ref[...].astype(jnp.float32) + x1
    y = _ln(y, fln_s_ref, fln_b_ref, eps)
    o_ref[...] = y.reshape(TB, S, H).astype(o_ref.dtype)


def _quant_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(K, N) f32 weights -> (i8 codes, (1, N) f32 per-column scales)."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                    1e-12) / 127.0
    return jnp.round(w / s).astype(jnp.int8), s.astype(jnp.float32)


def _tile_rows(B: int, S: int, H: int, I: int, hd: int) -> int:
    """Sequences per grid step under a VMEM activation budget.

    Live f32-equivalent elements per sequence row: qkv 3*S*H, scores
    S*(128//hd)*S per lane group, FFN intermediate S*I, plus x/ctx/x1.
    Budget ~4M f32 elements (~16 MB) leaves room for weights (~3.6 MB)
    and double-buffered x blocks."""
    g = 128 // hd
    per_seq = S * (3 * H + g * S + I + 3 * H)
    budget = 1 << 22
    tb = 1
    while tb * 2 * per_seq <= budget and B % (tb * 2) == 0 and tb < 128:
        tb *= 2
    return tb


def _pack_rel(rel_bias: jax.Array, nh: int, hd: int) -> jax.Array:
    """(nh, S, S) per-head bias -> (nh//g, S, g*S) group layout matching
    the packed attention's lane blocks (head gi*g+h lives in columns
    [h*S, (h+1)*S) of group gi)."""
    g = 128 // hd
    S = rel_bias.shape[1]
    return rel_bias.astype(jnp.float32).reshape(
        nh // g, g, S, S).transpose(0, 2, 1, 3).reshape(nh // g, S, g * S)


def _layer_pallas(kernel_body, x, bias, rel_bias, I: int, *, nh: int,
                  eps: float, weights: list) -> jax.Array:
    """Shared pallas_call harness for the whole-layer kernel variants.

    The x/bias/rel blocking, tile-rows grid, and the VMEM-budget policy
    live ONCE; a variant supplies its kernel body and a [(spec shape,
    operand)] weight list (fused_bert_layer vs fused_bert_layer_i8
    differ only there — a prior copy encoded the rel packing and the
    64/128 MB budget rule twice)."""
    B, S, H = x.shape
    hd = H // nh
    assert 128 % hd == 0 and H % 128 == 0
    if bias is None:
        bias = jnp.zeros((B, S), jnp.float32)
    tb = _tile_rows(B, S, H, I, hd)
    g = 128 // hd

    xspec = pl.BlockSpec((tb, S, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    rel_specs, rel_ops = [], []
    if rel_bias is not None:
        rel_specs = [const((nh // g, S, g * S))]
        rel_ops = [_pack_rel(rel_bias, nh, hd)]
    return pl.pallas_call(
        functools.partial(kernel_body, nh=nh, hd=hd, eps=eps,
                          has_rel=rel_bias is not None),
        out_shape=jax.ShapeDtypeStruct((B, S, H), x.dtype),
        grid=(B // tb,),
        in_specs=[
            xspec,
            pl.BlockSpec((tb, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *rel_specs,
            *[const(w.shape) for w in weights],
        ],
        out_specs=xspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the flagship (no-rel) budget is unchanged; the rel
            # operand (nh*S*S f32, ~12.6 MB for mpnet at S=512) plus
            # wide-model weights need the larger bound
            vmem_limit_bytes=(128 if rel_bias is not None else 64)
            * 1024 * 1024),
        interpret=_interpret(),
    )(x, bias[:, None, :].astype(jnp.float32), *rel_ops, *weights)


@functools.partial(jax.jit, static_argnames=("nh", "eps"))
def fused_bert_layer(x: jax.Array, bias: jax.Array | None, qkv_w, qkv_b,
                     ao_w, ao_b, aln_s, aln_b, w1, b1, w2, b2, fln_s,
                     fln_b, *, nh: int, eps: float = 1e-12,
                     rel_bias: jax.Array | None = None) -> jax.Array:
    """(B, S, H) x + (B, S) additive bias -> (B, S, H): one BERT layer,
    one kernel, one HBM round trip. rel_bias: optional (nh, S, S)
    shared relative-position score bias (the MPNet family,
    models/mpnet.py), riding as one constant kernel operand."""
    dt = x.dtype
    weights = [qkv_w.astype(dt), qkv_b[None, :], ao_w.astype(dt),
               ao_b[None, :], aln_s[None, :], aln_b[None, :],
               w1.astype(dt), b1[None, :], w2.astype(dt), b2[None, :],
               fln_s[None, :], fln_b[None, :]]
    return _layer_pallas(_layer_kernel, x, bias, rel_bias, w1.shape[1],
                         nh=nh, eps=eps, weights=weights)


@functools.partial(jax.jit, static_argnames=("nh", "eps"))
def fused_bert_layer_i8(x: jax.Array, bias: jax.Array | None, qkv_w,
                        qkv_b, ao_w, ao_b, aln_s, aln_b, w1, b1, w2, b2,
                        fln_s, fln_b, *, nh: int, eps: float = 1e-12,
                        rel_bias: jax.Array | None = None) -> jax.Array:
    """fused_bert_layer with W8A8 projections on the s8 MXU path.

    The roofline measurement (examples/bench_mm_roofline.py) pinned the
    bf16 kernel at 80-94% of the chip's SUSTAINED bf16 matmul rate —
    the remaining throughput lever is the i8 MXU rate (2x nominal), not
    scheduling. Here the four dense projections run s8xs8->s32: weights
    are quantized per-column at trace time (once per layer per forward,
    O(weights) — negligible), activations per-row inside the kernel.
    Attention/softmax, residuals, LayerNorm and gelu keep the bf16
    kernel's f32 numerics.

    Opt-in via BertConfig(layer_impl="layer_i8"), and shape-dependent —
    measured on v5e at S=128 (doc/performance.md "i8 projections"):

        MiniLM  (H=384)          0.97x — a LOSS; stay on "layer"
        base    (H=768, I=3072)  1.21x, cos vs bf16 >= 0.99984
        large   (H=1024, I=4096) 1.28x, cos vs bf16 >= 0.99920

    At MiniLM's thin K=384 the MXU's int8 rate gives back nothing (a
    fixed-scale diagnostic isolated quantization cost at ~4% and the
    MXU gain at ~0%), so the flagship default stays bf16; the i8 path
    is for the wider models this encoder also serves."""
    qkv_wq, qkv_ws = _quant_cols(qkv_w.astype(jnp.float32))
    ao_wq, ao_ws = _quant_cols(ao_w.astype(jnp.float32))
    w1q, w1s = _quant_cols(w1.astype(jnp.float32))
    w2q, w2s = _quant_cols(w2.astype(jnp.float32))
    weights = [qkv_wq, qkv_ws, qkv_b[None, :],
               ao_wq, ao_ws, ao_b[None, :],
               aln_s[None, :], aln_b[None, :],
               w1q, w1s, b1[None, :],
               w2q, w2s, b2[None, :],
               fln_s[None, :], fln_b[None, :]]
    return _layer_pallas(_layer_kernel_i8, x, bias, rel_bias, w1.shape[1],
                         nh=nh, eps=eps, weights=weights)
