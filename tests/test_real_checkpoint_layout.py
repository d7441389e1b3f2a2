"""A real sentence-transformers/all-MiniLM-L6-v2 checkpoint *layout*
must load and reproduce the HF pipeline (VERDICT r1 gap #5).

The environment is zero-egress, so no pretrained weights exist; what
this pins down is everything a real weights drop into `model_dir`
would exercise: the exact safetensors key set (including the
`embeddings.position_ids` buffer and the `pooler.dense.*` tensors that
must be ignored), the real config.json, a 30522-line vocab.txt, and the
full make_encoder() -> SentenceEncoder path against HF transformers +
masked mean-pool + L2 normalize (the sentence-transformers recipe the
reference implements at embedding_service.rs:97-139).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from safetensors.numpy import save_file  # noqa: E402

from dawnsearch_tpu.config import Config  # noqa: E402
from dawnsearch_tpu.node import make_encoder  # noqa: E402

# the real all-MiniLM-L6-v2 config.json (HF hub, rev refs/pr/21 — the
# one the reference downloads, embedding_service.rs:78-85)
MINILM_CONFIG = {
    "architectures": ["BertModel"],
    "attention_probs_dropout_prob": 0.1,
    "gradient_checkpointing": False,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "hidden_size": 384,
    "initializer_range": 0.02,
    "intermediate_size": 1536,
    "layer_norm_eps": 1e-12,
    "max_position_embeddings": 512,
    "model_type": "bert",
    "num_attention_heads": 12,
    "num_hidden_layers": 6,
    "pad_token_id": 0,
    "position_embedding_type": "absolute",
    "type_vocab_size": 2,
    "use_cache": True,
    "vocab_size": 30522,
}

WORDS = ("the quick brown fox jumps over a lazy dog search engine "
         "semantic web page index query hello world fast model "
         "transformer sentence embedding vector distributed network "
         "##ing ##ed ##er ##s ##ly").split()


def minilm_key_set() -> list[str]:
    """The exact tensor names in the real model.safetensors."""
    keys = [
        "embeddings.position_ids",        # int64 buffer, must be ignored
        "embeddings.word_embeddings.weight",
        "embeddings.position_embeddings.weight",
        "embeddings.token_type_embeddings.weight",
        "embeddings.LayerNorm.weight",
        "embeddings.LayerNorm.bias",
    ]
    for i in range(6):
        p = f"encoder.layer.{i}."
        keys += [
            p + "attention.self.query.weight",
            p + "attention.self.query.bias",
            p + "attention.self.key.weight",
            p + "attention.self.key.bias",
            p + "attention.self.value.weight",
            p + "attention.self.value.bias",
            p + "attention.output.dense.weight",
            p + "attention.output.dense.bias",
            p + "attention.output.LayerNorm.weight",
            p + "attention.output.LayerNorm.bias",
            p + "intermediate.dense.weight",
            p + "intermediate.dense.bias",
            p + "output.dense.weight",
            p + "output.dense.bias",
            p + "output.LayerNorm.weight",
            p + "output.LayerNorm.bias",
        ]
    keys += ["pooler.dense.weight", "pooler.dense.bias"]  # present, unused
    return keys


def synth_tensor(name: str, rng: np.random.Generator) -> np.ndarray:
    H, I, V, P = 384, 1536, 30522, 512
    if name == "embeddings.position_ids":
        return np.arange(P, dtype=np.int64)[None, :]
    shapes = {
        "embeddings.word_embeddings.weight": (V, H),
        "embeddings.position_embeddings.weight": (P, H),
        "embeddings.token_type_embeddings.weight": (2, H),
        "attention.self.query.weight": (H, H),
        "attention.self.key.weight": (H, H),
        "attention.self.value.weight": (H, H),
        "attention.output.dense.weight": (H, H),
        "intermediate.dense.weight": (I, H),
        "output.dense.weight": (H, I),
        "pooler.dense.weight": (H, H),
    }
    leaf = name.split("encoder.layer.")[-1]
    leaf = leaf.split(".", 1)[1] if leaf[0].isdigit() else leaf
    if "LayerNorm.weight" in name:
        return np.ones(H, np.float32) + 0.02 * rng.standard_normal(
            H).astype(np.float32)
    if name.endswith(".bias"):
        dim = {"intermediate.dense.bias": I}.get(leaf, H)
        return (0.02 * rng.standard_normal(dim)).astype(np.float32)
    shape = shapes.get(leaf, shapes.get(name))
    assert shape is not None, name
    return (0.05 * rng.standard_normal(shape)).astype(np.float32)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("all-MiniLM-L6-v2")
    with open(d / "config.json", "w") as f:
        json.dump(MINILM_CONFIG, f)
    # real vocab layout: specials at the canonical BERT positions
    vocab = (["[PAD]"] + [f"[unused{i}]" for i in range(99)]
             + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS)
    vocab += [f"tok{i}" for i in range(30522 - len(vocab))]
    assert len(vocab) == 30522
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n", encoding="utf-8")
    rng = np.random.default_rng(7)
    tensors = {k: np.ascontiguousarray(synth_tensor(k, rng))
               for k in minilm_key_set()}
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "semantic web search engine",
    "a distributed network index",
    "hello world",
]


def hf_sentence_embeddings(model_dir, texts):
    tok = transformers.BertTokenizerFast(
        vocab_file=model_dir + "/vocab.txt", do_lower_case=True)
    model = transformers.BertModel.from_pretrained(model_dir)
    model.eval()
    enc = tok(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        out = model(input_ids=enc["input_ids"],
                    attention_mask=enc["attention_mask"],
                    token_type_ids=torch.zeros_like(enc["input_ids"]))
    h = out.last_hidden_state
    mask = enc["attention_mask"].unsqueeze(-1).float()
    pooled = (h * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
    pooled = torch.nn.functional.normalize(pooled, dim=-1)
    return pooled.numpy()


def test_checkpoint_drop_end_to_end(model_dir):
    cfg = Config()
    cfg.model_dir = model_dir
    cfg.compute_dtype = "f32"  # tight comparison; serving default is bf16
    enc = make_encoder(cfg)
    assert enc.cfg.vocab_size == 30522 and enc.cfg.num_layers == 6
    ours = enc.encode(TEXTS)
    theirs = hf_sentence_embeddings(model_dir, TEXTS)
    assert ours.shape == theirs.shape == (4, 384)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
    # unit vectors (vector.rs:181-192 tolerance)
    np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, atol=0.01)


def test_loader_reports_pretrained(model_dir):
    from dawnsearch_tpu.models.weights import load_params
    params, pretrained, cfg = load_params(model_dir)
    assert pretrained is True
    assert cfg.hidden_size == 384 and cfg.intermediate_size == 1536
    # pooler / position_ids were ignored, not imported
    assert set(params.keys()) == {"embeddings", "layers"}


def test_compute_policy_survives_config_json(model_dir):
    """model_dir/config.json owns the SHAPE fields only — the caller's
    kernel selection (layer_impl/ffn_impl/attn_impl/dtype) must survive
    the merge (a dropped field here silently overrides the node's
    configured kernels)."""
    import jax.numpy as jnp

    from dawnsearch_tpu.models.bert import BertConfig
    from dawnsearch_tpu.models.weights import load_params

    ask = BertConfig(dtype=jnp.bfloat16, attn_impl="xla", ffn_impl="xla",
                     pool_impl="fused", layer_impl="layer_i8")
    _, pretrained, cfg = load_params(model_dir, cfg=ask)
    assert pretrained is True
    assert cfg.hidden_size == 384 and cfg.num_layers == 6  # from json
    assert (cfg.dtype, cfg.attn_impl, cfg.ffn_impl, cfg.pool_impl,
            cfg.layer_impl) == (jnp.bfloat16, "xla", "xla", "fused",
                                "layer_i8")


def test_non_gelu_checkpoint_refused(model_dir, tmp_path):
    """hidden_act != gelu must fail loudly: every kernel and the XLA
    fallback compute exact erf-gelu, so a gelu_new/relu checkpoint
    would be silently wrong numerics."""
    import shutil

    from dawnsearch_tpu.models.weights import load_params

    d = tmp_path / "gelu_new"
    shutil.copytree(model_dir, d)
    with open(d / "config.json") as f:
        hf = json.load(f)
    hf["hidden_act"] = "gelu_new"
    with open(d / "config.json", "w") as f:
        json.dump(hf, f)
    with pytest.raises(ValueError, match="hidden_act"):
        load_params(str(d))


def test_wide_model_family_checkpoint_drop(tmp_path):
    """A non-MiniLM BERT shape (wider hidden, fewer layers) loads by
    dropping its HF-layout checkpoint + config.json into model_dir —
    the model-family contract (the reference is hardcoded to one model,
    embedding_service.rs:60-85) — and runs through BOTH whole-layer
    kernels, including the W8A8 path built for wide models."""
    import jax
    import jax.numpy as jnp

    from dawnsearch_tpu.models.bert import BertConfig, encode_batch
    from dawnsearch_tpu.models.weights import (init_params, load_params,
                                               save_safetensors)

    shape = BertConfig(vocab_size=512, hidden_size=256, num_layers=2,
                       num_heads=8, intermediate_size=1024,
                       max_position_embeddings=64)
    params = init_params(jax.random.key(3), shape)
    d = tmp_path / "wide"
    d.mkdir()
    save_safetensors(params, str(d / "model.safetensors"), shape)
    with open(d / "config.json", "w") as f:
        json.dump({"hidden_act": "gelu", "hidden_size": 256,
                   "num_hidden_layers": 2, "num_attention_heads": 8,
                   "intermediate_size": 1024, "vocab_size": 512,
                   "max_position_embeddings": 64, "type_vocab_size": 2,
                   "layer_norm_eps": 1e-12}, f)

    loaded, pretrained, cfg = load_params(str(d))
    assert pretrained is True and cfg.hidden_size == 256
    r = np.random.default_rng(5)
    ids = jnp.asarray(r.integers(1, 512, (4, 16)), jnp.int32)
    mask = np.ones((4, 16), np.int32)
    mask[2, 9:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(encode_batch(
        loaded, ids, mask,
        cfg=BertConfig(**{**cfg.__dict__, "attn_impl": "xla",
                          "ffn_impl": "xla"})))
    for impl in ("layer", "layer_i8"):
        out = np.asarray(encode_batch(
            loaded, ids, mask,
            cfg=BertConfig(**{**cfg.__dict__, "layer_impl": impl})))
        cos = np.sum(out * ref, axis=-1)
        assert np.all(cos > 0.999), (impl, cos.min())
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=0.01)


def test_bert_prefixed_checkpoint_also_loads(model_dir, tmp_path):
    # some exports carry a "bert." prefix on every tensor
    from safetensors import safe_open

    from dawnsearch_tpu.models.weights import load_params
    with safe_open(model_dir + "/model.safetensors", framework="np") as f:
        tensors = {"bert." + k: f.get_tensor(k) for k in f.keys()}
    d = tmp_path / "prefixed"
    d.mkdir()
    save_file(tensors, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(MINILM_CONFIG, f)
    params, pretrained, _ = load_params(str(d))
    assert pretrained is True
