"""A/B the whole-layer kernel's activation-budget knob (tile rows tb).

_tile_rows picks sequences-per-grid-step under a VMEM budget of 2^22
f32-equivalent elements (tb=4 at the headline B=2048 S=128 shape,
i.e. 512-token matmul M). The dense projections measured ~3x off the
MXU roofline in the round-2 profile; if per-step M is the limiter, a
bigger tile should show it. Probes each candidate at B=16 first (a
compile-time VMEM OOM can wedge the tunneled backend).

Run on the chip in the background; one JSON line per config to stdout.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dawnsearch_tpu.models.bert import BertConfig, encode_batch
from dawnsearch_tpu.models.weights import init_params
from dawnsearch_tpu.ops import layer as layer_mod


def time_encoder(B: int, S: int, n_chunks: int = 8, reps: int = 2) -> float:
    cfg = BertConfig(dtype=jnp.bfloat16, layer_impl="layer")
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
    orig = layer_mod._tile_rows
    for budget_log2 in (21, 22, 23):
        def tile_rows(B, S, H, I, hd, _b=budget_log2):
            g = 128 // hd
            per_seq = S * (3 * H + g * S + I + 3 * H)
            budget = 1 << _b
            tb = 1
            while (tb * 2 * per_seq <= budget and B % (tb * 2) == 0
                   and tb < 128):
                tb *= 2
            return tb
        layer_mod._tile_rows = tile_rows
        jax.clear_caches()  # fused_bert_layer is jitted; force a re-trace
        tb = tile_rows(2048, 128, 384, 1536, 32)
        # wedge-safety probe: same tb at a tiny batch
        probe_b = max(16, tb * 2)
        sps = time_encoder(probe_b, 128, n_chunks=1, reps=1)
        print(f"probe budget=2^{budget_log2} tb={tb} ok ({sps:,.0f}/s)",
              file=sys.stderr, flush=True)
        sps = time_encoder(2048, 128)
        print(json.dumps({"budget_log2": budget_log2, "tb": tb,
                          "sentences_per_sec": round(sps, 1)}), flush=True)
    layer_mod._tile_rows = orig


if __name__ == "__main__":
    main()
