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


_REPO = os.path.dirname(os.path.dirname(_RUNNER))


def test_smoke_runner_uninitializable_backend_is_rc3():
    """Round-3 postmortem regression: a backend whose plugin RAISES at init
    (e.g. the TPU tunnel is down) must be 'no hardware' (rc 3), never
    'parity failed' (rc 1). GPARML_SMOKE_FORCE_PLATFORMS=cuda makes
    jax.default_backend() raise RuntimeError on this host."""
    env = dict(os.environ, GPARML_SMOKE_FORCE_PLATFORMS="cuda")
    proc = subprocess.run(
        [sys.executable, _RUNNER], capture_output=True, text=True,
        timeout=300, env=env, cwd=_REPO,
    )
    assert proc.returncode == 3, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "no usable backend" in proc.stderr


def test_smoke_runner_cpu_backend_is_rc3():
    env = dict(os.environ, GPARML_SMOKE_FORCE_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, _RUNNER], capture_output=True, text=True,
        timeout=300, env=env, cwd=_REPO,
    )
    assert proc.returncode == 3, proc.stderr[-2000:]


def test_bench_no_tpu_emits_null_record_and_exits_zero():
    """bench.py on a no-TPU host must emit the one-line JSON contract with
    value=null and exit 0 — not abort (rc 1 destroyed BENCH_r03) and not
    attempt the N=1e6 run on CPU (a near-hang)."""
    import json

    env = dict(os.environ, GPARML_SMOKE_FORCE_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "no TPU" in rec["note"]


def test_smoke_runner_mid_run_crash_is_rc4():
    """A crash AFTER the backend initialized (tunnel drop, worker death) is
    'could not check' (rc 4), never 'parity failed' (rc 1). The
    GPARML_SMOKE_FORCE_CRASH hook raises at the top of the parity checks."""
    env = dict(os.environ, GPARML_SMOKE_FORCE_CRASH="1",
               GPARML_SMOKE_FORCE_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, _RUNNER], capture_output=True, text=True,
        timeout=300, env=env, cwd=_REPO,
    )
    assert proc.returncode == 4, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "smoke crashed mid-run" in proc.stderr


def test_bench_smoke_crash_emits_null_record_and_exits_zero():
    """bench.py maps smoke rc 4 to the one-line JSON contract (value=null,
    the crash message in the note) and exits 0 — the artifact survives an
    infra outage mid-smoke."""
    import json

    env = dict(os.environ, GPARML_SMOKE_FORCE_CRASH="1",
               GPARML_SMOKE_FORCE_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "rc 4" in rec["note"]


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
