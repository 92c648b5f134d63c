"""Env-gated real-TPU smoke test: the fused Pallas kernel's forward AND
backward through the real Mosaic compile vs the XLA path, on hardware, at
M=200 (asymmetric forward padding) and M=512 (lane-boundary backward tile).

The suite's conftest forces the CPU backend process-wide, so the check runs
in a subprocess with a clean JAX config (tpu_smoke_runner.py). Opt in with
GPARML_TPU_TESTS=1 — it needs the real chip and a cold Mosaic compile.
"""

import os
import subprocess
import sys

import pytest

_RUNNER = os.path.join(os.path.dirname(__file__), "tpu_smoke_runner.py")


@pytest.mark.tpu
@pytest.mark.skipif(
    os.environ.get("GPARML_TPU_TESTS") != "1",
    reason="real-TPU smoke test; set GPARML_TPU_TESTS=1 to run",
)
def test_pallas_matches_xla_on_hardware():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, _RUNNER],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=os.path.dirname(os.path.dirname(_RUNNER)),
    )
    if proc.returncode == 3:
        pytest.skip("no TPU backend available in subprocess")
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-2000:]}"
