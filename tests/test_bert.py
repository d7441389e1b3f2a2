"""Encoder numerics: JAX forward vs HF transformers BertModel goldens.

No pretrained weights exist in this environment (zero egress), so we
randomly initialize an HF BertModel with the MiniLM-L6 config, import
its state dict into our stacked pytree, and require the outputs to
match. This validates exactly what a pretrained load would exercise
(same tensor names, same math), per SURVEY.md §4's test plan.
"""

import numpy as np
import pytest

from dawnsearch_tpu.models.bert import (
    BertConfig, bert_forward, encode_batch, mean_pool,
)
from dawnsearch_tpu.models import weights as W

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = BertConfig()


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.BertConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        type_vocab_size=CFG.type_vocab_size,
        layer_norm_eps=CFG.layer_norm_eps,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return W.from_hf_tensors(sd, CFG)


def _random_batch(rng, B=3, S=24, frac_pad=0.3):
    ids = rng.integers(4, CFG.vocab_size, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), dtype=np.int32)
    for b in range(B):
        pad_from = S - rng.integers(0, int(S * frac_pad) + 1)
        mask[b, pad_from:] = 0
        ids[b, pad_from:] = 0
    return ids, mask


def test_forward_matches_hf_exact_f64(hf_model, params, rng):
    """Bit-level architecture check: f64 vs torch double, atol 1e-5.

    Runs under a scoped x64 context so the rest of the suite stays f32.
    """
    import jax
    import jax.numpy as jnp

    ids, mask = _random_batch(rng)
    cfg64 = BertConfig(dtype=jnp.float64)
    with jax.enable_x64():
        p64 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float64),
                           params)
        ours = np.asarray(bert_forward(p64, jnp.asarray(ids), jnp.asarray(mask),
                                       cfg=cfg64))
    hf64 = hf_model.double()
    with torch.no_grad():
        theirs = hf64(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    hf_model.float()
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], theirs[m], atol=1e-5, rtol=1e-5)


def test_forward_matches_hf_f32(hf_model, params, rng):
    """f32 path: XLA-vs-oneDNN accumulation order differs; through 6
    post-LN layers the elementwise gap reaches ~1e-2, so assert on the
    quantity search cares about (cosine of pooled embeddings) plus a
    loose elementwise bound."""
    ids, mask = _random_batch(rng)
    ours = np.asarray(bert_forward(params, ids, mask))
    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], theirs[m], atol=3e-2, rtol=1e-2)
    a, b = ours[m], theirs[m]
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert np.all(cos > 0.99999), cos.min()


def test_encode_batch_masked_pool(params, rng):
    ids, mask = _random_batch(rng)
    vecs = np.asarray(encode_batch(params, ids, mask))
    assert vecs.shape == (ids.shape[0], CFG.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-5)
    # Masked mean must equal manual pool of valid positions.
    hidden = np.asarray(bert_forward(params, ids, mask))
    manual = np.stack([
        hidden[b][mask[b].astype(bool)].mean(0) for b in range(ids.shape[0])
    ])
    manual /= np.linalg.norm(manual, axis=-1, keepdims=True)
    np.testing.assert_allclose(vecs, manual, atol=1e-4)


def test_reference_parity_mode(params, rng):
    """mask_padding=False + include_padding=True reproduces the reference's
    no-mask, pool-over-padding behavior (model.rs:325-347,
    embedding_service.rs:126-128)."""
    ids, mask = _random_batch(rng)
    hidden_unmasked = np.asarray(
        bert_forward(params, ids, mask, mask_padding=False))
    pooled = hidden_unmasked.mean(axis=1)
    pooled /= np.linalg.norm(pooled, axis=-1, keepdims=True)
    vecs = np.asarray(encode_batch(params, ids, mask,
                                   mask_padding=False, include_padding=True))
    np.testing.assert_allclose(vecs, pooled, atol=1e-4)


def test_mean_pool_include_padding():
    hidden = np.arange(24, dtype=np.float32).reshape(1, 4, 6)
    mask = np.array([[1, 1, 0, 0]], dtype=np.int32)
    inc = np.asarray(mean_pool(hidden, mask, include_padding=True))
    np.testing.assert_allclose(inc, hidden.mean(1))
    exc = np.asarray(mean_pool(hidden, mask, include_padding=False))
    np.testing.assert_allclose(exc, hidden[:, :2].mean(1))


def test_bf16_compute_close(params, rng):
    import jax.numpy as jnp
    ids, mask = _random_batch(rng)
    f32 = np.asarray(encode_batch(params, ids, mask))
    cfg_bf16 = BertConfig(dtype=jnp.bfloat16)
    bf16 = np.asarray(encode_batch(params, ids, mask, cfg=cfg_bf16))
    # cosine similarity of the two embeddings must be ~1
    cos = (f32 * bf16).sum(-1)
    assert np.all(cos > 0.995), cos


def test_param_roundtrip_count(params):
    # all-MiniLM-L6-v2 encoder (no pooler): 22.7M params
    n = W.param_count(params)
    assert 22_000_000 < n < 23_500_000


def test_safetensors_export_roundtrip(params, tmp_path):
    """save_safetensors -> load_safetensors reproduces the pytree."""
    import jax
    import numpy as np
    from dawnsearch_tpu.models import weights as W

    path = str(tmp_path / "model.safetensors")
    W.save_safetensors(params, path)
    reloaded = W.load_safetensors(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(reloaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_from_hf_and_load(tmp_path):
    """model_dir/config.json drives the architecture (any BERT-family
    sentence encoder, not just MiniLM-L6)."""
    import json
    import jax.numpy as jnp
    from dawnsearch_tpu.models import weights as W
    from dawnsearch_tpu.models.bert import BertConfig, encode_batch

    cfg_json = {"vocab_size": 1000, "hidden_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "intermediate_size": 128, "max_position_embeddings": 128}
    (tmp_path / "config.json").write_text(json.dumps(cfg_json))
    params, pretrained, cfg = W.load_params(
        str(tmp_path), cfg=BertConfig(dtype=jnp.bfloat16))
    assert not pretrained  # no safetensors present
    assert cfg.hidden_size == 64 and cfg.num_layers == 2
    assert cfg.dtype == jnp.bfloat16  # compute prefs survive the merge
    import numpy as np
    ids = jnp.asarray(np.ones((2, 8), np.int32))
    mask = jnp.asarray(np.ones((2, 8), np.int32))
    out = encode_batch(params, ids, mask, cfg=cfg)
    assert out.shape == (2, 64)

    # exported checkpoint reloads against the same config.json
    W.save_safetensors(params, str(tmp_path / "model.safetensors"), cfg)
    params2, pretrained2, cfg2 = W.load_params(str(tmp_path))
    assert pretrained2 and cfg2.hidden_size == 64


@pytest.mark.parametrize("shape", [
    dict(hidden_size=768, num_layers=2, num_heads=12,
         intermediate_size=3072),          # bert-base family (head_dim 64)
    dict(hidden_size=384, num_layers=3, num_heads=12,
         intermediate_size=1536),          # paraphrase-MiniLM-L3 family
    dict(hidden_size=512, num_layers=2, num_heads=8,
         intermediate_size=2048),          # distiluse-ish (head_dim 64)
])
def test_bert_family_shapes(shape, rng):
    """The encoder generalizes across BERT-family checkpoint shapes
    (config.json-driven, models/weights.py config_from_hf): the
    whole-layer kernel must agree with the XLA path at every shape
    whose head_dim divides 128."""
    import jax
    import jax.numpy as jnp

    from dawnsearch_tpu.models.bert import BertConfig, encode_batch
    from dawnsearch_tpu.models.weights import init_params

    cfg_xla = BertConfig(vocab_size=1000, max_position_embeddings=64,
                         attn_impl="xla", ffn_impl="xla",
                         layer_impl="ops", **shape)
    cfg_krn = BertConfig(vocab_size=1000, max_position_embeddings=64,
                         **shape)  # defaults: layer kernel
    params = init_params(jax.random.key(1), cfg_xla)
    ids = jnp.asarray(rng.integers(10, 1000, (4, 32)), jnp.int32)
    mask = np.ones((4, 32), np.int32)
    mask[2, 9:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(encode_batch(params, ids, mask, cfg=cfg_xla))
    out = np.asarray(encode_batch(params, ids, mask, cfg=cfg_krn))
    assert ref.shape == (4, shape["hidden_size"])
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_deeper_checkpoint_refused(hf_model):
    """A checkpoint with MORE layers than the config must fail loudly:
    silently loading a prefix serves semantically broken embeddings
    with pretrained=True (round-3 review — e.g. an L12 safetensors
    against the L6 default when config.json is omitted)."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    # clone layer 0's tensors as a phantom extra layer
    extra = {k.replace("encoder.layer.0.", f"encoder.layer.{CFG.num_layers}.")
             : v for k, v in sd.items() if k.startswith("encoder.layer.0.")}
    with pytest.raises(ValueError, match="beyond the configured"):
        W.from_hf_tensors({**sd, **extra}, CFG)
