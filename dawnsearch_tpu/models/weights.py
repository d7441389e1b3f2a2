"""Weight init / HF-checkpoint conversion for the JAX BERT encoder.

The reference mmaps HF safetensors and loads them into candle VarBuilder
paths (embedding_service.rs:78-92, model.rs:528-560). Here we convert the
same HF `bert.*` tensor naming into our stacked-layer pytree: per-layer
tensors are fused (QKV) and stacked along a leading (L, ...) axis so the
forward can `lax.scan` over layers.

Torch nn.Linear stores (out, in) and computes x @ W.T; our dense computes
x @ w, so every weight is transposed on import.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from dawnsearch_tpu.models.bert import BertConfig, MINILM_L6, Params


def init_params(key: jax.Array, cfg: BertConfig = MINILM_L6) -> Params:
    """Random init (truncated-normal-ish 0.02 std like BERT)."""
    keys = iter(jax.random.split(key, 32))
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def w(k, shape):
        return (jax.random.normal(k, shape, dtype=jnp.float32) * 0.02)

    emb = {
        "word": w(next(keys), (cfg.vocab_size, H)),
        "position": w(next(keys), (cfg.max_position_embeddings, H)),
        "ln_scale": jnp.ones((H,), jnp.float32),
        "ln_bias": jnp.zeros((H,), jnp.float32),
    }
    if cfg.model_type != "mpnet":  # mpnet has no token types
        emb["token_type"] = w(next(keys), (cfg.type_vocab_size, H))
    layers = {
        "qkv_w": w(next(keys), (L, H, 3 * H)),
        "qkv_b": jnp.zeros((L, 3 * H), jnp.float32),
        "attn_out_w": w(next(keys), (L, H, H)),
        "attn_out_b": jnp.zeros((L, H), jnp.float32),
        "attn_ln_scale": jnp.ones((L, H), jnp.float32),
        "attn_ln_bias": jnp.zeros((L, H), jnp.float32),
        "ffn_in_w": w(next(keys), (L, H, I)),
        "ffn_in_b": jnp.zeros((L, I), jnp.float32),
        "ffn_out_w": w(next(keys), (L, I, H)),
        "ffn_out_b": jnp.zeros((L, H), jnp.float32),
        "ffn_ln_scale": jnp.ones((L, H), jnp.float32),
        "ffn_ln_bias": jnp.zeros((L, H), jnp.float32),
    }
    out = {"embeddings": emb, "layers": layers}
    if cfg.model_type == "mpnet":
        out["rel_bias"] = w(next(keys),
                            (cfg.relative_attention_num_buckets,
                             cfg.num_heads))
    return out


def _strip_prefix(tensors: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Accept `bert.`/`mpnet.`-prefixed and bare tensor namings."""
    out = {}
    for name, t in tensors.items():
        for pre in ("bert.", "mpnet.", "roberta."):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        out[name] = t
    return out


def from_hf_tensors(
    tensors: Mapping[str, np.ndarray], cfg: BertConfig = MINILM_L6
) -> Params:
    """HF BertModel/MPNetModel tensor dict (numpy) -> stacked pytree.

    MPNet keys (HF modeling_mpnet.py): separate attention.attn.{q,k,v,o}
    linears (fused to the shared qkv layout here), attention.LayerNorm,
    the encoder-level relative_attention_bias table, and no token-type
    embedding."""
    t = _strip_prefix(tensors)
    mpnet = cfg.model_type == "mpnet"

    def get(name: str) -> np.ndarray:
        if name not in t:
            raise KeyError(f"missing tensor {name!r}; have {sorted(t)[:8]}...")
        return np.asarray(t[name], dtype=np.float32)

    emb = {
        "word": get("embeddings.word_embeddings.weight"),
        "position": get("embeddings.position_embeddings.weight"),
        "ln_scale": get("embeddings.LayerNorm.weight"),
        "ln_bias": get("embeddings.LayerNorm.bias"),
    }
    if not mpnet:
        emb["token_type"] = get("embeddings.token_type_embeddings.weight")

    per_layer: dict[str, list[np.ndarray]] = {k: [] for k in (
        "qkv_w", "qkv_b", "attn_out_w", "attn_out_b",
        "attn_ln_scale", "attn_ln_bias",
        "ffn_in_w", "ffn_in_b", "ffn_out_w", "ffn_out_b",
        "ffn_ln_scale", "ffn_ln_bias",
    )}
    if mpnet:
        names = dict(q="attention.attn.q", k="attention.attn.k",
                     v="attention.attn.v", o="attention.attn.o",
                     attn_ln="attention.LayerNorm")
    else:
        names = dict(q="attention.self.query", k="attention.self.key",
                     v="attention.self.value", o="attention.output.dense",
                     attn_ln="attention.output.LayerNorm")
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        wq = get(p + names["q"] + ".weight").T
        wk = get(p + names["k"] + ".weight").T
        wv = get(p + names["v"] + ".weight").T
        per_layer["qkv_w"].append(np.concatenate([wq, wk, wv], axis=1))
        per_layer["qkv_b"].append(np.concatenate([
            get(p + names["q"] + ".bias"),
            get(p + names["k"] + ".bias"),
            get(p + names["v"] + ".bias"),
        ]))
        per_layer["attn_out_w"].append(get(p + names["o"] + ".weight").T)
        per_layer["attn_out_b"].append(get(p + names["o"] + ".bias"))
        per_layer["attn_ln_scale"].append(get(p + names["attn_ln"] + ".weight"))
        per_layer["attn_ln_bias"].append(get(p + names["attn_ln"] + ".bias"))
        per_layer["ffn_in_w"].append(get(p + "intermediate.dense.weight").T)
        per_layer["ffn_in_b"].append(get(p + "intermediate.dense.bias"))
        per_layer["ffn_out_w"].append(get(p + "output.dense.weight").T)
        per_layer["ffn_out_b"].append(get(p + "output.dense.bias"))
        per_layer["ffn_ln_scale"].append(get(p + "output.LayerNorm.weight"))
        per_layer["ffn_ln_bias"].append(get(p + "output.LayerNorm.bias"))

    # A checkpoint DEEPER than cfg (e.g. an L12 safetensors against the
    # L6 default because config.json was omitted) must fail loudly:
    # silently loading half the encoder serves semantically broken
    # embeddings with pretrained=True (round-3 review).
    extra = f"encoder.layer.{cfg.num_layers}."
    if any(k.startswith(extra) for k in t):
        raise ValueError(
            f"checkpoint has layers beyond the configured "
            f"{cfg.num_layers} (found {extra}*); put the model's real "
            f"config.json next to model.safetensors")

    layers = {k: jnp.asarray(np.stack(v)) for k, v in per_layer.items()}
    emb = {k: jnp.asarray(v) for k, v in emb.items()}
    out = {"embeddings": emb, "layers": layers}
    if mpnet:
        out["rel_bias"] = jnp.asarray(
            get("encoder.relative_attention_bias.weight"))
    return out


def load_safetensors(path: str, cfg: BertConfig = MINILM_L6) -> Params:
    """Load an HF safetensors checkpoint (model.safetensors) from disk."""
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        for name in f.keys():
            tensors[name] = f.get_tensor(name)
    return from_hf_tensors(tensors, cfg)


def config_from_hf(model_dir: str) -> BertConfig | None:
    """Build a BertConfig from an HF config.json, so any BERT-family
    sentence encoder (MiniLM-L6/L12, mpnet-width BERTs, ...) loads by
    pointing model_dir at its checkout — the reference is hardcoded to
    one model (model.rs:160-180)."""
    import json

    path = os.path.join(model_dir, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        hf = json.load(f)
    model_type = hf.get("model_type", "bert")
    if model_type not in ("bert", "mpnet", "roberta"):
        raise ValueError(
            f"{path}: model_type={model_type!r} is not a supported "
            "encoder family (bert, mpnet, roberta)")
    act = hf.get("hidden_act", "gelu")
    if act != "gelu":
        # Every kernel and the XLA fallback compute exact erf-gelu (the
        # checked HF config for this model family says "gelu"; the
        # reference notes the same divergence risk, model.rs:31-33).
        # Running a gelu_new/relu checkpoint through erf-gelu would be
        # silently wrong numerics — refuse instead.
        raise ValueError(
            f"{path}: hidden_act={act!r} is not supported (this encoder "
            "computes exact erf gelu); re-export the model or use a "
            "gelu-activation checkpoint")
    return BertConfig(
        vocab_size=hf.get("vocab_size", 30522),
        hidden_size=hf.get("hidden_size", 384),
        num_layers=hf.get("num_hidden_layers", 6),
        num_heads=hf.get("num_attention_heads", 12),
        intermediate_size=hf.get("intermediate_size", 1536),
        max_position_embeddings=hf.get("max_position_embeddings", 512),
        type_vocab_size=hf.get("type_vocab_size", 2),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
        model_type=model_type,
        pad_token_id=hf.get("pad_token_id",
                            1 if model_type in ("mpnet", "roberta") else 0),
        relative_attention_num_buckets=hf.get(
            "relative_attention_num_buckets", 32),
    )


def load_params(model_dir: str | None, cfg: BertConfig | None = None,
                seed: int = 0) -> tuple[Params, bool, BertConfig]:
    """Load pretrained weights if available, else random init.

    Returns (params, pretrained, cfg). The reference hard-downloads from
    HF Hub (embedding_service.rs:60-85); this environment has no egress,
    so we look for a local `model.safetensors` under model_dir. Shape
    config comes from model_dir/config.json when present."""
    if model_dir:
        hf_cfg = config_from_hf(model_dir)
        if hf_cfg is not None:
            # model_dir/config.json owns the SHAPE fields; the caller's
            # cfg owns every compute-policy field (dtype + kernel
            # selection) — dropping any of them here would silently
            # override the node's configured layer_impl/ffn_impl
            cfg = hf_cfg if cfg is None else dataclasses.replace(
                hf_cfg, dtype=cfg.dtype, attn_impl=cfg.attn_impl,
                ffn_impl=cfg.ffn_impl, pool_impl=cfg.pool_impl,
                layer_impl=cfg.layer_impl)
    if cfg is None:
        cfg = MINILM_L6
    if model_dir:
        for cand in ("model.safetensors", "pytorch_model.safetensors"):
            p = os.path.join(model_dir, cand)
            if os.path.exists(p):
                return load_safetensors(p, cfg), True, cfg
    return init_params(jax.random.PRNGKey(seed), cfg), False, cfg


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def to_hf_tensors(params: Params, cfg: BertConfig = MINILM_L6
                  ) -> dict[str, np.ndarray]:
    """Stacked pytree -> HF BertModel/MPNetModel tensor dict (inverse of
    from_hf_tensors): un-stack layers, split fused QKV, transpose back
    to torch's (out, in). Lets a node export weights any HF consumer
    (or another node's model_dir) can load."""
    H = cfg.hidden_size
    mpnet = cfg.model_type == "mpnet"
    emb = params["embeddings"]
    out: dict[str, np.ndarray] = {
        "embeddings.word_embeddings.weight": np.asarray(emb["word"]),
        "embeddings.position_embeddings.weight": np.asarray(emb["position"]),
        "embeddings.LayerNorm.weight": np.asarray(emb["ln_scale"]),
        "embeddings.LayerNorm.bias": np.asarray(emb["ln_bias"]),
    }
    if mpnet:
        out["encoder.relative_attention_bias.weight"] = \
            np.asarray(params["rel_bias"])
        names = dict(q="attention.attn.q", k="attention.attn.k",
                     v="attention.attn.v", o="attention.attn.o",
                     attn_ln="attention.LayerNorm")
    else:
        out["embeddings.token_type_embeddings.weight"] = \
            np.asarray(emb["token_type"])
        names = dict(q="attention.self.query", k="attention.self.key",
                     v="attention.self.value", o="attention.output.dense",
                     attn_ln="attention.output.LayerNorm")
    L = params["layers"]
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        qkv_w = np.asarray(L["qkv_w"][i])  # (H, 3H), ours = x @ w
        qkv_b = np.asarray(L["qkv_b"][i])
        out[p + names["q"] + ".weight"] = qkv_w[:, :H].T
        out[p + names["k"] + ".weight"] = qkv_w[:, H:2 * H].T
        out[p + names["v"] + ".weight"] = qkv_w[:, 2 * H:].T
        out[p + names["q"] + ".bias"] = qkv_b[:H]
        out[p + names["k"] + ".bias"] = qkv_b[H:2 * H]
        out[p + names["v"] + ".bias"] = qkv_b[2 * H:]
        out[p + names["o"] + ".weight"] = np.asarray(L["attn_out_w"][i]).T
        out[p + names["o"] + ".bias"] = np.asarray(L["attn_out_b"][i])
        out[p + names["attn_ln"] + ".weight"] = \
            np.asarray(L["attn_ln_scale"][i])
        out[p + names["attn_ln"] + ".bias"] = \
            np.asarray(L["attn_ln_bias"][i])
        out[p + "intermediate.dense.weight"] = np.asarray(L["ffn_in_w"][i]).T
        out[p + "intermediate.dense.bias"] = np.asarray(L["ffn_in_b"][i])
        out[p + "output.dense.weight"] = np.asarray(L["ffn_out_w"][i]).T
        out[p + "output.dense.bias"] = np.asarray(L["ffn_out_b"][i])
        out[p + "output.LayerNorm.weight"] = np.asarray(L["ffn_ln_scale"][i])
        out[p + "output.LayerNorm.bias"] = np.asarray(L["ffn_ln_bias"][i])
    return out


def save_safetensors(params: Params, path: str,
                     cfg: BertConfig = MINILM_L6) -> None:
    """Export params as an HF-naming safetensors checkpoint — the model
    half of checkpoint/resume (the index half lives in
    index/provider.py; the reference re-downloads weights each boot,
    embedding_service.rs:60-85)."""
    from safetensors.numpy import save_file

    tensors = {k: np.ascontiguousarray(v)
               for k, v in to_hf_tensors(params, cfg).items()}
    save_file(tensors, path)
