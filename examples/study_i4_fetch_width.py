"""i4 fetch-width study: how wide must the exact re-rank window be?

Measures raw and f32-re-ranked recall@10 of i4 (and i8, as the
control) quantized ordering over random 384-d unit vectors at several
candidate fetch widths. Pure numpy full-sort — no device, no fused
selector — so the numbers isolate QUANTIZATION geometry from kernel
windowing; the on-chip i4 bench (examples/bench_16m.py with
BENCH_16M_DTYPE=i4) is the acceptance gate that includes the window
fold. Results feed ops/quant.i4_fetch_width's ladder and
doc/performance.md "i4 capacity tier".

Reference frame: USearch's smallest scalar mode is f8
(examples_old/search_usearch.rs:39); i4 goes below it for capacity,
with overfetch + exact re-rank restoring accuracy.

Run: PYTHONPATH=/root/repo python examples/study_i4_fetch_width.py [N] [B]
(defaults N=400k B=256, ~4 min on host; the doc's 2M row is the same
measurement at N=2M B=128 — ~8 GB host RAM and ~15 min).
"""
import sys

import numpy as np

from dawnsearch_tpu.ops.quant import quantize_i4_vals_np

D, K = 384, 10
WIDTHS = (40, 64, 128, 256, 512)


def recall_study(X, qs, exact, approx, label):
    """Full-sort raw recall + re-ranked recall at each fetch width."""
    B = qs.shape[0]
    order = np.argsort(-(qs @ approx.T), axis=1)[:, : max(WIDTHS)]
    raw = np.mean([len(set(order[b, :K]) & set(exact[b]))
                   for b in range(B)]) / K
    out = {"label": label, "raw@10": round(float(raw), 4)}
    for kf in WIDTHS:
        rr = 0.0
        for b in range(B):
            cand = order[b, :kf]
            top = cand[np.argsort(-(qs[b] @ X[cand].T))[:K]]
            rr += len(set(top) & set(exact[b]))
        out[f"rr@10 kf={kf}"] = round(rr / (B * K), 4)
    print(out, flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, D)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    qs = rng.standard_normal((b, D)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    exact = np.argsort(-(qs @ X.T), axis=1)[:, :K]

    # i8 control (numpy twin of ops/quant.quantize_i8)
    s8 = np.maximum(np.abs(X).max(axis=1), 1e-12) / 127.0
    c8 = np.clip(np.rint(X / s8[:, None]), -127, 127).astype(np.int8)
    recall_study(X, qs, exact, c8.astype(np.float32) * s8[:, None], "i8")

    v4, s4 = quantize_i4_vals_np(X)
    u4 = (v4.astype(np.float32) - 8.0) * s4[:, None]
    recall_study(X, qs, exact, u4, "i4")


if __name__ == "__main__":
    main()
