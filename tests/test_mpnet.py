"""MPNet family parity vs HF transformers (the numerics oracle) and
the model_dir drop path.

The reference serves only all-MiniLM-L6-v2 (embedding_service.rs:60-92);
this rebuild adds the other canonical sentence-transformers family
(all-mpnet-base-v2 shape, models/mpnet.py). Zero egress means no real
weights — parity runs on randomly initialized HF MPNetModel weights
exported through the same state-dict layout a real checkpoint has.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dawnsearch_tpu.models.bert import BertConfig, encode_batch  # noqa: E402
from dawnsearch_tpu.models.mpnet import (_bucket_matrix,  # noqa: E402
                                         mpnet_forward, mpnet_position_ids)
from dawnsearch_tpu.models.weights import (from_hf_tensors,  # noqa: E402
                                           load_params, save_safetensors)

SMALL = BertConfig(vocab_size=200, hidden_size=128, num_layers=2,
                   num_heads=4, intermediate_size=256,
                   max_position_embeddings=68, type_vocab_size=0,
                   model_type="mpnet", pad_token_id=1)


def hf_model(cfg: BertConfig):
    hf_cfg = transformers.MPNetConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        layer_norm_eps=cfg.layer_norm_eps)
    torch.manual_seed(11)
    m = transformers.MPNetModel(hf_cfg)
    m.eval()
    return m


def params_from(m) -> dict:
    return from_hf_tensors(
        {k: v.numpy() for k, v in m.state_dict().items()}, SMALL)


def batch(cfg, S=24, B=4, seed=3):
    r = np.random.default_rng(seed)
    ids = r.integers(4, cfg.vocab_size, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[1, 15:] = 0
    mask[3, 7:] = 0
    ids[mask == 0] = cfg.pad_token_id  # HF derives positions from pad ids
    return ids, mask


def test_bucket_matrix_matches_hf():
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder
    for S in (8, 24, 129, 200):
        rel = torch.arange(S)[None, :] - torch.arange(S)[:, None]
        theirs = MPNetEncoder.relative_position_bucket(
            rel, num_buckets=32).numpy()
        np.testing.assert_array_equal(_bucket_matrix(S, 32), theirs)


def test_position_ids_match_hf():
    from transformers.models.mpnet.modeling_mpnet import (
        create_position_ids_from_input_ids)
    ids, _ = batch(SMALL)
    theirs = create_position_ids_from_input_ids(
        torch.from_numpy(ids), 1).numpy()
    ours = np.asarray(mpnet_position_ids(jnp.asarray(ids), 1))
    np.testing.assert_array_equal(ours, theirs)


def test_mpnet_forward_matches_hf():
    m = hf_model(SMALL)
    params = params_from(m)
    ids, mask = batch(SMALL)
    with torch.no_grad():
        theirs = m(input_ids=torch.from_numpy(ids),
                   attention_mask=torch.from_numpy(mask)
                   ).last_hidden_state.numpy()
    cfg = BertConfig(**{**SMALL.__dict__, "attn_impl": "xla",
                        "ffn_impl": "xla"})
    ours = np.asarray(mpnet_forward(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        cfg=cfg))
    # padded rows attend differently (HF leaves pad queries unmasked
    # garbage); compare real tokens only, like sentence-transformers
    for b in range(ids.shape[0]):
        n = int(mask[b].sum())
        np.testing.assert_allclose(ours[b, :n], theirs[b, :n], atol=2e-4)


def test_mpnet_whole_layer_kernels_match_xla():
    """The whole-layer kernel (and its W8A8 variant) carry MPNet's
    shared relative-position bias as a kernel operand (ops/layer.py
    rel_bias); interpret mode must match the einsum path."""
    m = hf_model(SMALL)
    params = params_from(m)
    ids, mask = batch(SMALL, S=32)
    idsj, maskj = jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    ref = np.asarray(encode_batch(
        params, idsj, maskj,
        cfg=BertConfig(**{**SMALL.__dict__, "attn_impl": "xla",
                          "ffn_impl": "xla"})))
    for impl, tol in (("layer", 5e-3), ("layer_i8", 5e-3)):
        out = np.asarray(encode_batch(
            params, idsj, maskj,
            cfg=BertConfig(**{**SMALL.__dict__, "layer_impl": impl})))
        cos = np.sum(out * ref, axis=-1)
        assert np.all(cos > 1 - tol), (impl, cos.min())


def test_mpnet_model_dir_drop(tmp_path):
    """An HF-layout MPNet checkpoint + config.json loads through
    load_params with model_type detection, and the sentence path
    (masked mean-pool + normalize) matches the HF recipe."""
    m = hf_model(SMALL)
    params = params_from(m)
    d = tmp_path / "mpnet"
    d.mkdir()
    save_safetensors(params, str(d / "model.safetensors"), SMALL)
    with open(d / "config.json", "w") as f:
        json.dump({"model_type": "mpnet", "hidden_act": "gelu",
                   "vocab_size": 200, "hidden_size": 128,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 256,
                   "max_position_embeddings": 68,
                   "relative_attention_num_buckets": 32,
                   "pad_token_id": 1, "layer_norm_eps": 1e-12}, f)
    loaded, pretrained, cfg = load_params(str(d))
    assert pretrained is True and cfg.model_type == "mpnet"
    assert cfg.pad_token_id == 1 and "rel_bias" in loaded

    ids, mask = batch(SMALL)
    emb = np.asarray(encode_batch(
        loaded, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        cfg=BertConfig(**{**cfg.__dict__, "attn_impl": "xla",
                          "ffn_impl": "xla"})))
    with torch.no_grad():
        h = m(input_ids=torch.from_numpy(ids),
              attention_mask=torch.from_numpy(mask)).last_hidden_state
    tm = torch.from_numpy(mask).unsqueeze(-1).float()
    pooled = (h * tm).sum(1) / tm.sum(1).clamp(min=1e-9)
    theirs = torch.nn.functional.normalize(pooled, dim=-1).numpy()
    np.testing.assert_allclose(emb, theirs, atol=2e-4)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=0.01)


def test_mpnet_vocab_special_aliases():
    """MPNet vocab.txt names the specials <s>/<pad>/</s>/<unk>; both
    tokenizers resolve them (all-mpnet-base-v2 layout)."""
    from dawnsearch_tpu.models.tokenizer import WordPieceTokenizer
    from dawnsearch_tpu.models.tokenizer_native import (best_tokenizer,
                                                        native_available)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for i, w in enumerate(["hello", "world", "##ing", "search"]):
        vocab[w] = 5 + i
    tok = WordPieceTokenizer(vocab)
    assert (tok.cls_id, tok.pad_id, tok.sep_id, tok.unk_id) == (0, 1, 2, 3)
    ids = tok.encode("hello searching")
    assert ids[0] == 0 and ids[-1] == 2 and 3 not in ids
    if native_available():
        ntok = best_tokenizer(vocab)
        assert ntok.encode("hello searching") == ids
