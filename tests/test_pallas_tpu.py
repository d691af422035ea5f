"""Real-hardware Pallas kernel parity (marked `tpu`; default tier skips it).

Runs exp/tpu_kernel_check.py in a clean subprocess because conftest.py pins
this process to the CPU backend, and because only one process may hold the
chip — the subprocess probes health first and we skip (not fail) when the
TPU is busy, tunnel-dead, or absent.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
def test_pallas_kernel_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "assert any(d.platform=='tpu' for d in jax.devices());"
             "x=jnp.ones((512,512));print(float((x@x).sum()))"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU probe timed out (chip busy or tunnel dead)")
    if probe.returncode != 0:
        pytest.skip(f"TPU unavailable: {probe.stderr[-300:]}")

    run = subprocess.run(
        [sys.executable, "exp/tpu_kernel_check.py"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    if "NO-TPU" in run.stdout:
        pytest.skip("no TPU device in subprocess")
    assert run.returncode == 0 and "PALLAS-TPU-OK" in run.stdout, (
        run.stdout[-500:], run.stderr[-500:])
