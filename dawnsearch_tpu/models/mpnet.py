"""MPNet encoder family (all-mpnet-base-v2 shape) on the shared layer
stack.

The reference serves exactly one model — all-MiniLM-L6-v2, downloaded
at boot (embedding_service.rs:60-92). This rebuild's encoder is
config.json-driven (models/weights.py), and MPNet is the other
canonical sentence-transformers family a MiniLM user upgrades to
(all-mpnet-base-v2: H=768, 12 layers, the top model of that library's
benchmark table). Architecturally MPNet differs from BERT in exactly
three ways (verified against the HF transformers implementation,
transformers/models/mpnet/modeling_mpnet.py — the parity oracle
tests/test_mpnet.py runs against):

1. Position ids are RoBERTa-style: `padding_idx + cumsum(ids != pad)`
   for real tokens, `padding_idx` for padding (pad_token_id = 1,
   max_position_embeddings = 514). There are no token-type embeddings.
2. Attention adds a SHARED relative-position bias to every layer's
   scores: a (num_buckets=32, nh) learned table indexed by a bucketed
   (S, S) relative-distance matrix (T5's log-bucket scheme,
   max_distance=128). The bucket matrix depends only on S, so it is
   built in numpy at trace time; only the (32, nh) table gather is
   traced.
3. q/k/v/o are separate linears in the checkpoint — fused into the
   same stacked qkv layout as BERT on import (weights.py), so the
   layer pytree and every Pallas kernel are shared unchanged, with the
   bias rides as one extra (nh, S, S) kernel operand (ops/layer.py
   rel_bias).

The softmax/LN/gelu numerics, post-LN residual order, masked mean-pool
and L2-normalize are identical to the BERT path (bert.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dawnsearch_tpu.models.bert import (BertConfig, Params, _layer_norm,
                                        encoder_scan)

MPNET_BASE = BertConfig(
    vocab_size=30527, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position_embeddings=514,
    type_vocab_size=0, model_type="mpnet", pad_token_id=1)


@functools.lru_cache(maxsize=32)
def _bucket_matrix(S: int, num_buckets: int, max_distance: int = 128
                   ) -> np.ndarray:
    """(S, S) int32 bucket index of key-relative-to-query distance —
    T5's scheme as implemented by HF MPNetEncoder.relative_position_bucket
    (modeling_mpnet.py): half the buckets split by sign, half of the
    remainder exact, the rest log-spaced up to max_distance. Depends
    only on S, so it is a trace-time numpy constant."""
    ctx = np.arange(S, dtype=np.int64)[:, None]
    mem = np.arange(S, dtype=np.int64)[None, :]
    n = ctx - mem  # == -(memory_position - context_position)
    half = num_buckets // 2
    ret = (n < 0).astype(np.int64) * half
    n = np.abs(n)
    max_exact = half // 2
    with np.errstate(divide="ignore"):
        val_if_large = max_exact + (
            np.log(np.maximum(n, 1) / max_exact)
            / np.log(max_distance / max_exact) * (half - max_exact)
        ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, half - 1)
    ret += np.where(n < max_exact, n, val_if_large)
    return ret.astype(np.int32)


def position_bias(rel_table: jax.Array, S: int, nh: int,
                  num_buckets: int) -> jax.Array:
    """(num_buckets, nh) learned table -> (nh, S, S) f32 score bias."""
    bucket = jnp.asarray(_bucket_matrix(S, num_buckets))  # (S, S)
    return jnp.take(rel_table.astype(jnp.float32), bucket,
                    axis=0).transpose(2, 0, 1)  # (nh, S, S)


def mpnet_position_ids(input_ids: jax.Array, pad_id: int) -> jax.Array:
    """RoBERTa-offset position ids (HF create_position_ids_from_input_ids):
    real token i gets pad_id + (its 1-based index among real tokens);
    padding stays at pad_id (whose position row is zero-initialized in
    trained checkpoints)."""
    real = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(real, axis=1) * real + pad_id


def mpnet_forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array | None = None,
    cfg: BertConfig = MPNET_BASE,
    mask_padding: bool = True,
) -> jax.Array:
    """Token ids -> (B, S, H) last hidden state (HF MPNetModel parity,
    minus the unused pooler)."""
    B, S = input_ids.shape
    emb = params["embeddings"]
    pos_ids = mpnet_position_ids(input_ids, cfg.pad_token_id)
    x = (jnp.take(emb["word"], input_ids, axis=0)
         + jnp.take(emb["position"], pos_ids, axis=0))
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
    x = x.astype(cfg.dtype)

    mask_bias = None
    if mask_padding and attention_mask is not None:
        mask_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, -1e30
        ).astype(jnp.float32)
    pos_bias = position_bias(params["rel_bias"], S, cfg.num_heads,
                             cfg.relative_attention_num_buckets)
    return encoder_scan(x, params["layers"], cfg, mask_bias, pos_bias)
