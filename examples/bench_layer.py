"""Whole-layer kernel A/B: layer_impl="layer" vs the per-op kernels.

Run on the real TPU: python examples/bench_layer.py [--encoder]
Timing rules per CLAUDE.md: reps inside one dispatch via lax.scan with
a carried data dependency, host readback at the end. Probes a tiny
shape first (a compile-time VMEM OOM can wedge the tunneled backend).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from dawnsearch_tpu.models.bert import BertConfig, encode_batch
from dawnsearch_tpu.models.weights import init_params


def time_encoder(layer_impl: str, B: int, S: int, n_chunks: int = 8,
                 reps: int = 2) -> float:
    cfg = BertConfig(dtype=jnp.bfloat16, layer_impl=layer_impl)
    params = init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 30000, (n_chunks, B, S)), jnp.int32)
    mask = jnp.ones((n_chunks, B, S), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def encode_many(params, ids_chunks, mask_chunks, cfg):
        def body(_, inp):
            return None, encode_batch(params, inp[0], inp[1], cfg=cfg)
        return jax.lax.scan(body, None, (ids_chunks, mask_chunks))[1]

    np.asarray(encode_many(params, ids, mask, cfg))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            float(encode_many(params, ids, mask, cfg)[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return n_chunks * B / best  # sentences/s


def main() -> None:
    # pass --i8 to add the W8A8 projection kernel to the A/B
    # (doc/performance.md "i8 projections": a loss at MiniLM shapes,
    # +21%/+28% at BERT-base/large)
    impls = ("ops", "layer", "layer_i8") if "--i8" in sys.argv \
        else ("ops", "layer")
    # tiny probe first (wedge safety for a brand-new kernel)
    for impl in impls:
        sps = time_encoder(impl, 8, 128, n_chunks=1, reps=1)
        print(f"probe  B=8 S=128 {impl:8s}: ok ({sps:,.0f}/s)", flush=True)
    for B, S in ((2048, 128), (512, 128), (128, 512), (256, 256)):
        row = []
        for impl in impls:
            sps = time_encoder(impl, B, S)
            row.append(f"{impl} {sps:10,.1f}/s")
        print(f"B={B:5d} S={S:4d}: " + "   ".join(row), flush=True)


if __name__ == "__main__":
    main()
