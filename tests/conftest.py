"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-native analog of the reference's "multi-node without a cluster"
simulation (examples_old/sim.rs): XLA's forced host platform device
count lets sharding/collective tests run anywhere. Must be set before
jax initializes a backend, hence top of conftest.
"""

import os

# The environment pins JAX_PLATFORMS=axon and a sitecustomize imports jax
# at interpreter startup, so env vars are too late — use jax.config, which
# takes effect because backends initialize lazily.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def unit_vectors(rng):
    def make(n: int, dim: int = 384) -> np.ndarray:
        v = rng.standard_normal((n, dim)).astype(np.float32)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    return make


def load_example(module_name: str):
    """Import a module from examples/ (experiments demoted out of the
    product tree stay tested here so they don't rot)."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "examples", module_name + ".py")
    spec = importlib.util.spec_from_file_location(module_name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
