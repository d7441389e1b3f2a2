"""Attention micro-benchmark: Pallas fused kernel vs the XLA path.

Run on the real TPU (axon tunnel):  python examples/bench_attention.py
Timing rules per CLAUDE.md: many reps inside one dispatch via lax.scan
with a CARRIED data dependency, then a host readback.

Probes small shapes first (a VMEM-OOM at compile time can wedge the
tunneled backend) and prints one line per (B, S, impl).
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
from dawnsearch_tpu.ops.attention import (_tile_plan, fused_attention,
                                          fused_attention_packed)

NH, HD = 12, 32


def attn_xla(q, k, v, bias):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(HD))
    if bias is not None:
        scores = scores + bias[:, None, None, :]
    s16 = scores.astype(jnp.bfloat16)
    m = jnp.max(s16, axis=-1, keepdims=True)
    e = jnp.exp((s16 - m).astype(jnp.float32))
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def time_attn(impl: str, B: int, S: int, reps: int = 30) -> float:
    rng = np.random.default_rng(0)
    if impl == "packed":
        shape = (B, S, NH * HD)
        fn = functools.partial(fused_attention_packed, nh=NH)
        index = (0, 0, 0)
    else:
        shape = (B, NH, S, HD)
        fn = (functools.partial(fused_attention, nh=NH) if impl == "fused"
              else attn_xla)
        index = (0, 0, 0, 0)
    q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    bias = jnp.zeros((B, S), jnp.float32)

    @jax.jit
    def many(q, k, v, bias):
        def body(c, _):
            o = fn(c, k, v, bias)
            return o.astype(jnp.bfloat16), None  # carried dependency
        out, _ = jax.lax.scan(body, q, None, length=reps)
        return out

    float(jnp.asarray(many(q, k, v, bias))[index])  # compile+sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.asarray(many(q, k, v, bias))[index])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1000  # ms per call


def time_encoder(attn_impl: str, pool_impl: str, B: int = 2048,
                 S: int = 128, n_chunks: int = 8, reps: int = 2) -> float:
    cfg = BertConfig(dtype=jnp.bfloat16, attn_impl=attn_impl,
                     pool_impl=pool_impl)
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
    shapes = [(8, 128)]  # tiny probe first — wedge safety
    if "--probe-only" not in sys.argv:
        shapes += [(512, 128), (2048, 128), (128, 512), (256, 256)]
    for B, S in shapes:
        tb, g = _tile_plan(B, NH, S)
        fused = time_attn("fused", B, S)
        packed = time_attn("packed", B, S)
        xla = time_attn("xla", B, S)
        print(f"B={B:5d} S={S:4d} tile=({tb},{g}): "
              f"fused {fused:7.3f} ms  packed {packed:7.3f} ms  "
              f"xla {xla:7.3f} ms  (xla/packed {xla / packed:.2f}x)",
              flush=True)
    if "--encoder" in sys.argv:
        for attn, pool in (("xla", "xla"), ("fused", "xla"),
                           ("fused", "fused")):
            sps = time_encoder(attn, pool)
            print(f"encoder attn={attn:5s} pool={pool:5s}: "
                  f"{sps:9.1f} sentences/s", flush=True)


if __name__ == "__main__":
    main()
