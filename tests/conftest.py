"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-native analog of the reference's "multi-node without a cluster"
simulation (examples_old/sim.rs): XLA's forced host platform device
count lets sharding/collective tests run anywhere. Must be set before
jax initializes a backend, hence top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env pins JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def unit_vectors(rng):
    def make(n: int, dim: int = 384) -> np.ndarray:
        v = rng.standard_normal((n, dim)).astype(np.float32)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    return make
