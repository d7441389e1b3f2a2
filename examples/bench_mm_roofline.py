"""Empirical MXU roofline: what matmul throughput does THIS chip
actually sustain, and therefore how close is the whole-layer kernel
(ops/layer.py) to its speed of light?

Round 3 found doc/performance.md's "~69k sentences/s bf16 roofline"
was derived from the v5e NOMINAL peak (197 TFLOPS bf16), which the
chip does not deliver even on ideal shapes. This harness measures the
sustained rate directly so the encoder's efficiency claim rests on a
measurement, not a spec sheet (the repo's measured-claims convention,
CLAUDE.md).

Methodology per the tunnel rules (doc/performance.md "Methodology"):
each timing is a lax.scan chain of `reps` matmuls with a CARRIED data
dependency (the output, rescaled, feeds the next input — XLA cannot
hoist the body), one dispatch, wall-clock ends on a host readback.
The carry rescale adds one VPU pass per step (<2% at the big shapes).

Measured on the bench chip (TPU v5 lite, 2026-08-17):

    (4096,4096)x(4096,4096) x64 :  114.2 TFLOPS
    (8192,8192)x(8192,8192) x16 :  132.8 TFLOPS   <- sustained ceiling
    (512,384)x(384,1152)   x512 :    7.5 TFLOPS   (layer-kernel step, chained)
    (512,384)x(384,1536)   x512 :    9.9 TFLOPS
    (512,1536)x(1536,384)  x512 :    9.9 TFLOPS
    (262144,384)x(384,1152)  x8 :   45.6 TFLOPS   (unfused whole-batch shape)
    (262144,384)x(384,1536)  x8 :   61.5 TFLOPS

Reading: MiniLM-L6 at (B=2048, S=128) is 6 layers x ~1.13 TFLOP of
matmul each (0.93 useful + the packed attention's deliberate 4x FLOP
trade) = 6.8 TFLOP/batch. bench.py measures 63.5 ms/batch (32.2k
sentences/s) = ~107 TFLOPS effective — 80-94% of the 114-133 TFLOPS
this chip sustains on IDEAL square bf16 shapes, and ~2x the 45-61
TFLOPS XLA gets on the model's own thin-K unfused shapes. The bf16
kernel is at its practical roofline; the remaining 2x lever is the
i8 MXU rate (394 TOPS nominal), not better bf16 scheduling.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("reps",))
def _chain(a, b, reps):
    def body(x, _):
        y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        k = x.shape[1]
        if y.shape[1] < k:  # keep the carry shape when N < K
            y = jnp.concatenate([y] * (k // y.shape[1]), axis=1)
        return (y[:, :k] * 1e-6).astype(x.dtype), ()
    out, _ = jax.lax.scan(body, a, None, length=reps)
    return out


def bench(m: int, k: int, n: int, reps: int = 64,
          dtype=jnp.bfloat16) -> float:
    a = jnp.asarray(np.random.default_rng(0).standard_normal((m, k)), dtype)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((k, n)), dtype)
    float(_chain(a, b, reps)[0, 0])  # compile + sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(_chain(a, b, reps)[0, 0])
        best = min(best, time.perf_counter() - t0)
    tflops = 2.0 * m * k * n * reps / best / 1e12
    print(f"({m},{k})x({k},{n}) x{reps} {jnp.dtype(dtype).name}: "
          f"{best * 1e3:.2f} ms total, {tflops:.1f} TFLOPS")
    return tflops


def main() -> None:
    print("backend:", jax.default_backend(), jax.devices())
    bench(4096, 4096, 4096)
    bench(8192, 8192, 8192, reps=16)
    # the whole-layer kernel's per-grid-step projection shapes (tb=4)
    bench(512, 384, 1152, reps=512)
    bench(512, 384, 1536, reps=512)
    bench(512, 1536, 384, reps=512)
    # whole-batch thin-K shapes (what unfused XLA would run)
    bench(262144, 384, 1152, reps=8)
    bench(262144, 384, 1536, reps=8)


if __name__ == "__main__":
    main()
