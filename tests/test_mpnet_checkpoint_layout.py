"""A real sentence-transformers/all-mpnet-base-v2 checkpoint *layout*
must load through make_encoder and reproduce the HF pipeline — the
MPNet twin of tests/test_real_checkpoint_layout.py.

The reference serves only all-MiniLM-L6-v2 (embedding_service.rs:60-92);
this rebuild's model_dir is config.json-driven, and this test pins the
second family's full weights-drop surface: the exact MPNet safetensors
key set (separate q/k/v/o linears fused on import, the encoder-level
relative_attention_bias table, `embeddings.position_ids` and `pooler.*`
ignored), the real config.json (pad_token_id=1, layer_norm_eps=1e-5,
max_position_embeddings=514), a 30527-line vocab.txt with the
RoBERTa-style specials at 0-3, and make_encoder() -> SentenceEncoder
vs HF AutoModel + masked mean-pool + L2 normalize. Plus the
eval_quality harness (examples/eval_quality.py) over the same dir —
one command from "MPNet weights arrived" to "quality verified".
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from safetensors.numpy import save_file  # noqa: E402

from dawnsearch_tpu.config import Config  # noqa: E402
from dawnsearch_tpu.node import make_encoder  # noqa: E402
from tests.test_real_checkpoint_layout import WORDS  # noqa: E402

# the real all-mpnet-base-v2 config.json (HF hub)
MPNET_CONFIG = {
    "architectures": ["MPNetForMaskedLM"],
    "attention_probs_dropout_prob": 0.1,
    "bos_token_id": 0,
    "eos_token_id": 2,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "hidden_size": 768,
    "initializer_range": 0.02,
    "layer_norm_eps": 1e-05,
    "max_position_embeddings": 514,
    "model_type": "mpnet",
    "num_attention_heads": 12,
    "num_hidden_layers": 12,
    "pad_token_id": 1,
    "relative_attention_num_buckets": 32,
    "vocab_size": 30527,
}

H, I, V, P, L = 768, 3072, 30527, 514, 12


def mpnet_key_set() -> list[str]:
    """The exact tensor names in the real model.safetensors."""
    keys = [
        "embeddings.position_ids",        # int64 buffer, must be ignored
        "embeddings.word_embeddings.weight",
        "embeddings.position_embeddings.weight",
        "embeddings.LayerNorm.weight",
        "embeddings.LayerNorm.bias",
        "encoder.relative_attention_bias.weight",
    ]
    for i in range(L):
        p = f"encoder.layer.{i}."
        keys += [
            p + "attention.attn.q.weight", p + "attention.attn.q.bias",
            p + "attention.attn.k.weight", p + "attention.attn.k.bias",
            p + "attention.attn.v.weight", p + "attention.attn.v.bias",
            p + "attention.attn.o.weight", p + "attention.attn.o.bias",
            p + "attention.LayerNorm.weight", p + "attention.LayerNorm.bias",
            p + "intermediate.dense.weight", p + "intermediate.dense.bias",
            p + "output.dense.weight", p + "output.dense.bias",
            p + "output.LayerNorm.weight", p + "output.LayerNorm.bias",
        ]
    keys += ["pooler.dense.weight", "pooler.dense.bias"]  # present, unused
    return keys


def synth_tensor(name: str, rng: np.random.Generator) -> np.ndarray:
    if name == "embeddings.position_ids":
        return np.arange(P, dtype=np.int64)[None, :]
    shapes = {
        "embeddings.word_embeddings.weight": (V, H),
        "embeddings.position_embeddings.weight": (P, H),
        "encoder.relative_attention_bias.weight": (32, L),
        "attention.attn.q.weight": (H, H),
        "attention.attn.k.weight": (H, H),
        "attention.attn.v.weight": (H, H),
        "attention.attn.o.weight": (H, H),
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


def write_vocab(path, pad_line: int = 1) -> None:
    # real layout: <s>=0 <pad>=1 </s>=2 <unk>=3, <mask> last (30526);
    # the body inherits BERT's FULL vocab — including the literal
    # strings "[PAD]"/"[UNK]"/"[CLS]"/"[SEP]"/"[MASK]" — so special
    # resolution must prefer the prepended <...> names for pad/cls/sep
    # (a BERT-first lookup resolved pad to the body's "[PAD]" and
    # refused the real checkpoint) while unk stays "[UNK]" (HF
    # MPNetTokenizer's unk_token default is "[UNK]", not <unk>)
    vocab = (["<s>", "<pad>", "</s>", "<unk>",
              "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list(WORDS))
    vocab += [f"tok{i}" for i in range(V - 1 - len(vocab))] + ["<mask>"]
    assert len(vocab) == V and vocab[pad_line] == "<pad>"
    path.write_text("\n".join(vocab) + "\n", encoding="utf-8")


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("all-mpnet-base-v2")
    with open(d / "config.json", "w") as f:
        json.dump(MPNET_CONFIG, f)
    write_vocab(d / "vocab.txt")
    rng = np.random.default_rng(13)
    tensors = {k: np.ascontiguousarray(synth_tensor(k, rng))
               for k in mpnet_key_set()}
    # the rel-bias table is (num_buckets, nh); nh == L here by
    # coincidence of the real shape (12 heads, 12 layers)
    assert tensors["encoder.relative_attention_bias.weight"].shape == (32, 12)
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "semantic web search engine",
    "a distributed network index",
    "hello world",
]


def hf_sentence_embeddings(model_dir, texts):
    tok = transformers.AutoTokenizer.from_pretrained(model_dir)
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


def test_make_encoder_reproduces_hf_pipeline(model_dir):
    enc = make_encoder(Config(model_dir=model_dir))
    assert enc.cfg.model_type == "mpnet" and enc.cfg.pad_token_id == 1
    assert enc.cfg.layer_norm_eps == 1e-05
    assert enc.tokenizer.pad_id == 1 and enc.tokenizer.cls_id == 0
    assert enc.tokenizer.sep_id == 2       # </s>, not the body's [SEP]
    assert enc.tokenizer.unk_id == 5       # the body's [UNK] (HF default)
    ours = np.asarray(enc.encode(TEXTS), np.float32)
    theirs = hf_sentence_embeddings(model_dir, TEXTS)
    assert 1.0 - float(np.min(np.sum(ours * theirs, axis=1))) <= 1e-3
    np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, atol=0.01)


def test_pad_id_mismatch_refused(model_dir, tmp_path):
    """A vocab.txt whose <pad> line disagrees with config.json's
    pad_token_id silently corrupts MPNet position ids — make_encoder
    must refuse the checkpoint (node.py pad-consistency guard)."""
    import shutil
    d = tmp_path / "bad"
    shutil.copytree(model_dir, d)
    # swap <s> and <pad>: pad lands at line 0, config says 1
    lines = (d / "vocab.txt").read_text(encoding="utf-8").splitlines()
    lines[0], lines[1] = lines[1], lines[0]
    (d / "vocab.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")
    with pytest.raises(ValueError, match="pad"):
        make_encoder(Config(model_dir=str(d)))


def test_eval_quality_harness_on_mpnet(model_dir, capsys):
    """The weights-drop harness runs unchanged on the MPNet family
    (AutoModel dispatch); random weights -> --allow-random mechanics,
    with parity for real."""
    from tests.test_eval_quality import run_eval
    rc, stages = run_eval(model_dir, capsys, "--allow-random")
    assert rc == 0
    assert stages["parity"]["status"] == "ok", stages["parity"]
    assert stages["summary"]["semantic_gates"] == "skipped"
