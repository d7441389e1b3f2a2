"""bench.py stays runnable (tiny shapes, CPU mesh) — it is the driver's
round-end artifact; import or logic rot would lose the round's numbers."""

import json

import bench


def test_bench_search_smoke(capsys):
    qps = bench.bench_search(n_rows=4096, batch=8, k=5, reps=2)
    assert qps > 0
    err = capsys.readouterr().err
    metrics = [json.loads(l) for l in err.splitlines() if '"metric"' in l]
    names = {m["metric"] for m in metrics}
    assert "search_qps_1m_i8" in names
    rec = next(m for m in metrics if m["metric"] == "recall_at_10_1m_i8")
    assert rec["value"] >= 0.9  # tiny corpus: re-rank ~exact


def test_bench_embed_smoke(capsys):
    sps = bench.bench_embed(reps=1, n_chunks=2, batch=4, seq=16)
    assert sps > 0


def test_headline_json_contract(capsys):
    bench.log({"metric": "x", "value": 1})
    line = capsys.readouterr().err.strip()
    parsed = json.loads(line)
    assert parsed["metric"] == "x"


def test_bench_i4_smoke(capsys):
    qps = bench.bench_i4(n_rows=4096, batch=8, k=5, reps=2)
    assert qps > 0
    err = capsys.readouterr().err
    metrics = [json.loads(l) for l in err.splitlines() if '"metric"' in l]
    m = next(m for m in metrics if m["metric"] == "i4_qps_2m")
    assert m["recall_rerank_at_10"] >= 0.9  # tiny corpus: re-rank ~exact
    assert m["k_fetch"] >= 5
