"""Driver-contract tests for __graft_entry__.

Round 1 shipped a dryrun_multichip that assumed the caller had already
configured an 8-device platform; the driver doesn't (it runs a fresh
process where a sitecustomize pins the single-chip axon backend), and
the multichip gate failed (MULTICHIP_r01.json rc=1). These tests invoke
the entry points exactly the way the driver does — a fresh subprocess
with the ambient environment — so the gate can never silently regress
again.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides=None, timeout=300):
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    if env_overrides:
        env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout)


def test_dryrun_multichip_driver_invocation():
    # The driver runs: fresh python, ambient env (JAX_PLATFORMS may be
    # pinned to a 1-device platform), then dryrun_multichip(8). The
    # entry point must self-configure the 8-device CPU mesh.
    proc = _run("from __graft_entry__ import dryrun_multichip; "
                "dryrun_multichip(8)")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout


def test_dryrun_multichip_after_backend_init():
    # If a backend already initialized in-process (e.g. entry() ran
    # first), the config flip is impossible and the entry point must
    # recover via a clean subprocess rather than die.
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 2)\n"
        "assert len(jax.devices()) == 2\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n")
    proc = _run(code)
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_entry_compiles_single_device():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from __graft_entry__ import entry\n"
        "fn, args = entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (8, 384), out.shape\n")
    proc = _run(code)
    assert proc.returncode == 0, proc.stderr[-2000:]
