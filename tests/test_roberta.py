"""RoBERTa family parity vs HF transformers and the model_dir drop path.

Third canonical sentence-transformers family (all-distilroberta-v1
shape): BERT's layer stack verbatim with RoBERTa-offset position ids
(models/bert.py model_type="roberta") and a byte-level BPE vocab
(models/tokenizer_bpe.py). The reference hardcodes one model
(embedding_service.rs:60-92); here the family comes from config.json.
Zero egress: parity runs on randomly initialized HF RobertaModel
weights exported through the exact state-dict layout a real checkpoint
has, and the tokenizer files come from the module's own trainer.
"""

import dataclasses
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from safetensors.numpy import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dawnsearch_tpu.config import Config  # noqa: E402
from dawnsearch_tpu.models.bert import BertConfig, encode_batch  # noqa: E402
from dawnsearch_tpu.models.tokenizer_bpe import train_bpe  # noqa: E402
from dawnsearch_tpu.models.weights import (config_from_hf,  # noqa: E402
                                           from_hf_tensors, load_params)
from dawnsearch_tpu.node import make_encoder  # noqa: E402
from tests.test_bpe_tokenizer import CORPUS  # noqa: E402

SMALL = BertConfig(vocab_size=200, hidden_size=128, num_layers=2,
                   num_heads=4, intermediate_size=256,
                   max_position_embeddings=68, type_vocab_size=1,
                   model_type="roberta", pad_token_id=1)


def hf_model(cfg: BertConfig):
    hf_cfg = transformers.RobertaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        pad_token_id=cfg.pad_token_id,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu")
    torch.manual_seed(17)
    m = transformers.RobertaModel(hf_cfg, add_pooling_layer=False)
    m.eval()
    return m


def batch(cfg, S=24, B=4, seed=5):
    r = np.random.default_rng(seed)
    ids = r.integers(4, cfg.vocab_size, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[1, 15:] = 0
    mask[3, 7:] = 0
    ids[mask == 0] = cfg.pad_token_id  # HF derives positions from pad ids
    return ids, mask


def test_roberta_forward_matches_hf():
    m = hf_model(SMALL)
    params = from_hf_tensors(
        {k: v.numpy() for k, v in m.state_dict().items()}, SMALL)
    ids, mask = batch(SMALL)
    with torch.no_grad():
        theirs = m(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask)
                   ).last_hidden_state.numpy()
    cfg = dataclasses.replace(SMALL, attn_impl="xla", ffn_impl="xla",
                              layer_impl="ops")
    from dawnsearch_tpu.models.bert import bert_forward
    ours = np.asarray(bert_forward(params, jnp.asarray(ids),
                                   jnp.asarray(mask), cfg=cfg))
    # padded positions attend nothing and are pooled out; compare real
    # tokens only
    err = np.abs(ours - theirs)[mask.astype(bool)]
    assert float(err.max()) < 2e-4


def test_roberta_whole_layer_kernel_matches_xla():
    """The Pallas whole-layer kernel must see the SAME hidden states for
    roberta as the per-op XLA path (position ids ride outside the
    kernel, so this is the same layer math as bert — but the route
    through encode_batch is family-keyed and must not diverge)."""
    m = hf_model(SMALL)
    params = from_hf_tensors(
        {k: v.numpy() for k, v in m.state_dict().items()}, SMALL)
    ids, mask = batch(SMALL, S=32)
    outs = {}
    for impl in ("ops", "layer"):
        cfg = dataclasses.replace(
            SMALL, layer_impl=impl,
            attn_impl="xla" if impl == "ops" else "fused",
            ffn_impl="xla" if impl == "ops" else "fused")
        outs[impl] = np.asarray(encode_batch(
            params, jnp.asarray(ids), jnp.asarray(mask), cfg=cfg))
    cos = np.sum(outs["ops"] * outs["layer"], axis=1)
    assert float(np.min(cos)) > 1 - 1e-5


# --- the all-distilroberta-v1 weights-drop surface ---

# the real sentence-transformers/all-distilroberta-v1 config.json
ROBERTA_CONFIG = {
    "architectures": ["RobertaModel"],
    "attention_probs_dropout_prob": 0.1,
    "bos_token_id": 0,
    "eos_token_id": 2,
    "gradient_checkpointing": False,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "hidden_size": 768,
    "initializer_range": 0.02,
    "intermediate_size": 3072,
    "layer_norm_eps": 1e-05,
    "max_position_embeddings": 514,
    "model_type": "roberta",
    "num_attention_heads": 12,
    "num_hidden_layers": 6,
    "pad_token_id": 1,
    "position_embedding_type": "absolute",
    "type_vocab_size": 1,
    "vocab_size": 50265,
}


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("all-distilroberta-v1")
    with open(d / "config.json", "w") as f:
        json.dump(ROBERTA_CONFIG, f)
    # tokenizer files: the trained mini-BPE (ids stay far below the
    # real 50265 table) saved in the HF vocab.json/merges.txt layout
    train_bpe(CORPUS, size=600).save(str(d))
    hf_cfg = transformers.RobertaConfig(**{
        k: v for k, v in ROBERTA_CONFIG.items()
        if k not in ("architectures",)})
    torch.manual_seed(23)
    m = transformers.RobertaModel(hf_cfg)  # incl. pooler, like the hub file
    m.eval()
    tensors = {k: np.ascontiguousarray(v.numpy().astype(np.float32))
               if v.dtype is torch.float32 else v.numpy()
               for k, v in m.state_dict().items()}
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "a distributed semantic web search engine",
    "lighthouse keeper storms the winding stairs",
    "don't stop me now",
]


def hf_sentence_embeddings(model_dir, texts):
    tok = transformers.AutoTokenizer.from_pretrained(model_dir,
                                                     use_fast=False)
    model = transformers.AutoModel.from_pretrained(model_dir)
    model.eval()
    enc = tok(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        out = model(input_ids=enc["input_ids"],
                    attention_mask=enc["attention_mask"])
    h = out.last_hidden_state
    mask = enc["attention_mask"].unsqueeze(-1).float()
    pooled = (h * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
    pooled = torch.nn.functional.normalize(pooled, dim=-1)
    return pooled.numpy()


def test_config_from_hf_roberta(model_dir):
    cfg = config_from_hf(model_dir)
    assert cfg.model_type == "roberta" and cfg.pad_token_id == 1
    assert cfg.hidden_size == 768 and cfg.num_layers == 6
    assert cfg.max_position_embeddings == 514


def test_make_encoder_reproduces_hf_pipeline(model_dir):
    enc = make_encoder(Config(model_dir=model_dir))
    assert enc.cfg.model_type == "roberta" and enc.cfg.pad_token_id == 1
    assert enc.tokenizer.pad_id == 1 and enc.tokenizer.cls_id == 0
    assert enc.tokenizer.sep_id == 2
    ours = np.asarray(enc.encode(TEXTS), np.float32)
    theirs = hf_sentence_embeddings(model_dir, TEXTS)
    assert 1.0 - float(np.min(np.sum(ours * theirs, axis=1))) <= 1e-3
    np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, atol=0.01)


def test_pad_id_mismatch_refused(model_dir, tmp_path):
    """A vocab.json whose <pad> id disagrees with config.json's
    pad_token_id silently corrupts RoBERTa position ids — make_encoder
    must refuse the checkpoint (node.py pad-consistency guard)."""
    import shutil
    d = tmp_path / "bad"
    shutil.copytree(model_dir, d)
    vocab = json.loads((d / "vocab.json").read_text(encoding="utf-8"))
    vocab["<pad>"], vocab["<s>"] = vocab["<s>"], vocab["<pad>"]
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    with pytest.raises(ValueError, match="pad"):
        make_encoder(Config(model_dir=str(d)))


def test_eval_quality_harness_on_roberta(model_dir, capsys):
    """The weights-drop harness runs unchanged on the RoBERTa family."""
    from tests.test_eval_quality import run_eval
    rc, stages = run_eval(model_dir, capsys, "--allow-random")
    assert rc == 0
    assert stages["parity"]["status"] == "ok", stages["parity"]
    assert stages["summary"]["semantic_gates"] == "skipped"
