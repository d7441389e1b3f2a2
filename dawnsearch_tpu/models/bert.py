"""BERT encoder (all-MiniLM-L6-v2 shape) as a pure-functional JAX forward.

TPU-first rebuild of the reference's candle BERT
(/root/reference/src/embedding/model.rs:225-571). Key departures from
the reference — deliberate, hardware-driven:

- Layers are *stacked* into one pytree of (L, ...) arrays and iterated
  with `lax.scan` (model.rs loops Python-side over 6 BertLayer objects,
  model.rs:502-525). One traced layer body => faster compiles, and XLA
  still fully pipelines.
- Attention is *masked* by default. The reference computes softmax over
  ALL tokens including padding (model.rs:325-347 has no mask) and also
  mean-pools over padding (embedding_service.rs:126-128). That is a
  fidelity bug w.r.t. sentence-transformers; we default to the correct
  masked behavior and expose `mask_padding=False` for reference parity.
- Compute dtype is configurable (bf16 matmuls / f32 softmax+layernorm);
  params stay f32.

Config matches sentence-transformers/all-MiniLM-L6-v2: hidden 384,
6 layers, 12 heads, FFN 1536, vocab 30522, max_pos 512 (model.rs:160-180),
hidden_act = gelu (exact erf form; the reference notes the gelu vs
gelu_new divergence at model.rs:31-33 — HF's config for this model says
"gelu", i.e. erf).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    # "bert" | "mpnet" | "roberta" — mpnet (models/mpnet.py) shares this
    # config and the layer stack but swaps the embedding recipe
    # (RoBERTa-offset position ids, no token types) and adds a shared
    # relative-position attention bias; roberta IS the BERT layer stack
    # with only the offset position ids (all-distilroberta-v1 etc. —
    # byte-level BPE vocab, models/tokenizer_bpe.py). The reference
    # hardcodes one model (embedding_service.rs:60-85).
    model_type: str = "bert"
    pad_token_id: int = 0  # mpnet checkpoints use 1 (RoBERTa layout)
    relative_attention_num_buckets: int = 32  # mpnet only
    # compute dtype for matmuls; softmax/layernorm stay f32
    dtype: Any = jnp.float32
    # "fused" = packed Pallas kernel (heads stay on lanes, scores stay
    # in VMEM — measured 19.2k vs 15.6k sentences/s end-to-end on v5e,
    # doc/performance.md); "xla" = einsum attention fallback
    attn_impl: str = "fused"
    # "fused" = Pallas FFN+residual+LayerNorm single pass (ops/ffn.py);
    # "xla" = two dense calls with an HBM intermediate
    ffn_impl: str = "fused"
    # "xla" = jnp mean-pool; "fused" = Pallas pool+normalize kernel
    pool_impl: str = "xla"
    # "layer" (default) = the whole-layer Pallas kernel (ops/layer.py):
    # QKV + attention + out-proj + LN + FFN + LN in ONE pass, one HBM
    # round trip per layer — measured 24.1k -> 31.3k sentences/s over
    # the per-op kernels at B=2048 S=128 on v5e and faster at every
    # probed shape (doc/performance.md). "layer_i8" = the same kernel
    # with the dense projections on the s8 MXU path (W8A8 dynamic
    # quantization) — measured +21%/+28% at BERT-base/large shapes but
    # a 3% LOSS at MiniLM's thin K=384, so it is opt-in for wider
    # models only (doc/performance.md "i8 projections"). "ops" =
    # per-op kernels per attn_impl/ffn_impl above (also the automatic
    # fallback when head_dim/hidden don't fit the packed-lane
    # envelope).
    layer_impl: str = "layer"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


MINILM_L6 = BertConfig()


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """LayerNorm in f32 (reference computes mean/var manually in f32,
    model.rs:68-105)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _dense(x: jax.Array, w: jax.Array, b: jax.Array, dtype) -> jax.Array:
    y = jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(dtype)


def _attention(
    x: jax.Array,
    layer: Params,
    cfg: BertConfig,
    mask_bias: jax.Array | None,
    pos_bias: jax.Array | None = None,
) -> jax.Array:
    """Multi-head self-attention (reference model.rs:284-348) via one
    fused QKV matmul; softmax in f32. attn_impl="fused" routes the
    softmax(QKᵀ)·V through the Pallas kernel (scores never reach HBM).

    pos_bias: optional (nh, S, S) f32 additive score bias, shared by
    every layer (MPNet's relative-position bias); per-head, so the
    packed kernel path is bypassed in favor of the einsum path here —
    the whole-layer kernel carries it natively (ops/layer.py)."""
    B, S, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = _dense(x, layer["qkv_w"], layer["qkv_b"], cfg.dtype)  # (B,S,3H)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if (cfg.attn_impl == "fused" and pos_bias is None
            and 128 % hd == 0 and H % 128 == 0):
        # packed kernel: heads stay on the feature axis — no
        # (B,S,nh,hd)->(B,nh,S,hd) relayouts in or out (4 per layer on
        # the einsum path), scores never reach HBM, and every matmul is
        # a dense 128-lane MXU op (ops/attention.py _packed_kernel)
        from dawnsearch_tpu.ops.attention import fused_attention_packed
        bias2d = None if mask_bias is None else mask_bias[:, 0, 0, :]
        ctx = fused_attention_packed(q, k, v, bias2d, nh=nh)
        return _dense(ctx.astype(cfg.dtype), layer["attn_out_w"],
                      layer["attn_out_b"], cfg.dtype)
    q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
    if cfg.attn_impl == "fused" and pos_bias is None:
        from dawnsearch_tpu.ops.attention import fused_attention
        bias2d = None if mask_bias is None else mask_bias[:, 0, 0, :]
        ctx = fused_attention(q, k, v, bias2d, nh=nh).astype(cfg.dtype)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        if pos_bias is not None:
            scores = scores + pos_bias[None]  # (1,nh,S,S), every layer
        if mask_bias is not None:
            scores = scores + mask_bias  # (B,1,1,S): -inf on padded keys
        if cfg.dtype == jnp.bfloat16:
            # Materialize the (B,nh,S,S) scores in bf16: attention here
            # is HBM-bound, not FLOP-bound (~1% of model FLOPs), and
            # halving scores traffic measures ~20% faster per layer.
            # exp/normalize still run in f32.
            s16 = scores.astype(jnp.bfloat16)
            m = jnp.max(s16, axis=-1, keepdims=True)
            e = jnp.exp((s16 - m).astype(jnp.float32))
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cfg.dtype)
        else:
            probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(cfg.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
    return _dense(ctx, layer["attn_out_w"], layer["attn_out_b"], cfg.dtype)


def _layer_fwd(
    x: jax.Array, layer: Params, cfg: BertConfig,
    mask_bias: jax.Array | None, pos_bias: jax.Array | None = None
) -> jax.Array:
    """One transformer layer (reference model.rs:467-499): post-LN BERT.

    pos_bias: optional (nh, S, S) shared relative-position score bias
    (MPNet); carried by the whole-layer kernel, einsum path otherwise."""
    H, hd = cfg.hidden_size, cfg.head_dim
    # an explicit attn_impl/ffn_impl="xla" override routes around ALL
    # Pallas kernels (e.g. to sidestep a platform Mosaic bug or A/B) —
    # the whole-layer kernel must not silently ignore it
    if (cfg.layer_impl in ("layer", "layer_i8") and cfg.attn_impl != "xla"
            and cfg.ffn_impl != "xla" and 128 % hd == 0 and H % 128 == 0):
        from dawnsearch_tpu.ops.layer import (fused_bert_layer,
                                              fused_bert_layer_i8)
        kernel = (fused_bert_layer_i8 if cfg.layer_impl == "layer_i8"
                  else fused_bert_layer)
        bias2d = None if mask_bias is None else mask_bias[:, 0, 0, :]
        return kernel(
            x.astype(cfg.dtype), bias2d,
            layer["qkv_w"], layer["qkv_b"],
            layer["attn_out_w"], layer["attn_out_b"],
            layer["attn_ln_scale"], layer["attn_ln_bias"],
            layer["ffn_in_w"], layer["ffn_in_b"],
            layer["ffn_out_w"], layer["ffn_out_b"],
            layer["ffn_ln_scale"], layer["ffn_ln_bias"],
            nh=cfg.num_heads, eps=cfg.layer_norm_eps, rel_bias=pos_bias)
    attn = _attention(x, layer, cfg, mask_bias, pos_bias)
    x = _layer_norm(x + attn, layer["attn_ln_scale"], layer["attn_ln_bias"],
                    cfg.layer_norm_eps)
    if cfg.ffn_impl == "fused":
        # one Pallas pass: both matmuls + gelu + residual + LayerNorm,
        # intermediate stays in VMEM (ops/ffn.py; XLA round-trips the
        # (B*S, I) tensor through HBM)
        from dawnsearch_tpu.ops.ffn import fused_ffn
        B, S, H = x.shape
        y = fused_ffn(x.reshape(B * S, H).astype(cfg.dtype),
                      layer["ffn_in_w"], layer["ffn_in_b"],
                      layer["ffn_out_w"], layer["ffn_out_b"],
                      layer["ffn_ln_scale"], layer["ffn_ln_bias"],
                      eps=cfg.layer_norm_eps)
        return y.reshape(B, S, H)
    inter = _dense(x, layer["ffn_in_w"], layer["ffn_in_b"], cfg.dtype)
    inter = jax.nn.gelu(inter.astype(jnp.float32), approximate=False).astype(cfg.dtype)
    out = _dense(inter, layer["ffn_out_w"], layer["ffn_out_b"], cfg.dtype)
    return _layer_norm(x + out, layer["ffn_ln_scale"], layer["ffn_ln_bias"],
                       cfg.layer_norm_eps)


def bert_forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    token_type_ids: jax.Array | None = None,
    cfg: BertConfig = MINILM_L6,
    mask_padding: bool = True,
) -> jax.Array:
    """Token embeddings -> (B, S, H) last hidden state.

    Reference: BertModel::forward (model.rs:528-571) = embeddings
    (model.rs:225-282) + encoder scan (model.rs:502-525).
    `mask_padding=False` reproduces the reference's unmasked attention.
    """
    B, S = input_ids.shape
    emb = params["embeddings"]
    if cfg.model_type == "roberta":
        # RoBERTa keeps BERT's layer stack verbatim; only the position
        # recipe differs (padding_idx-offset ids derived from the pad
        # token, HF create_position_ids_from_input_ids) — shared with
        # MPNet (models/mpnet.py).
        from dawnsearch_tpu.models.mpnet import mpnet_position_ids
        pos_ids = mpnet_position_ids(input_ids, cfg.pad_token_id)
    else:
        pos_ids = jnp.arange(S)[None, :]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + jnp.take(emb["position"], pos_ids, axis=0)
        + jnp.take(emb["token_type"], token_type_ids, axis=0)
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
    x = x.astype(cfg.dtype)

    mask_bias = None
    if mask_padding and attention_mask is not None:
        mask_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, -1e30
        ).astype(jnp.float32)
    return encoder_scan(x, params["layers"], cfg, mask_bias)


def encoder_scan(
    x: jax.Array, layers: Params, cfg: BertConfig,
    mask_bias: jax.Array | None, pos_bias: jax.Array | None = None
) -> jax.Array:
    """Scan the stacked layer pytree over (B, S, H) hidden states —
    shared by the BERT and MPNet families (the layer math is identical;
    MPNet adds the shared pos_bias, models/mpnet.py)."""
    def scan_body(h, layer):
        return _layer_fwd(h, layer, cfg, mask_bias, pos_bias), None

    x, _ = jax.lax.scan(scan_body, x, layers)
    return x.astype(jnp.float32)


def mean_pool(
    hidden: jax.Array,
    attention_mask: jax.Array | None = None,
    include_padding: bool = False,
) -> jax.Array:
    """Mean-pool token states -> (B, H), then caller normalizes.

    Default: masked mean like sentence-transformers. include_padding=True
    reproduces the reference's pool-over-everything
    (embedding_service.rs:126-128).
    """
    if include_padding or attention_mask is None:
        return jnp.mean(hidden, axis=1)
    m = attention_mask[..., None].astype(hidden.dtype)
    summed = jnp.sum(hidden * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return summed / counts


@functools.partial(
    jax.jit, static_argnames=("cfg", "mask_padding", "include_padding")
)
def encode_batch(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: BertConfig = MINILM_L6,
    mask_padding: bool = True,
    include_padding: bool = False,
) -> jax.Array:
    """Full sentence-embedding forward: BERT -> mean-pool -> L2 normalize.

    This is the jittable unit the serving batcher calls per (batch, seq)
    bucket; equivalent of the reference's calculate_embedding
    (embedding_service.rs:97-139) minus tokenization. Routes by
    cfg.model_type so the serving stack is model-family-agnostic.
    """
    if cfg.model_type == "mpnet":
        from dawnsearch_tpu.models.mpnet import mpnet_forward
        hidden = mpnet_forward(params, input_ids, attention_mask, cfg=cfg,
                               mask_padding=mask_padding)
    else:
        hidden = bert_forward(params, input_ids, attention_mask, cfg=cfg,
                              mask_padding=mask_padding)
    if cfg.pool_impl == "fused":
        from dawnsearch_tpu.ops.attention import fused_mean_pool
        return fused_mean_pool(hidden, attention_mask,
                               include_padding=include_padding)
    pooled = mean_pool(hidden, attention_mask, include_padding=include_padding)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)
