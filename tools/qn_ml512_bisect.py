"""Hardware bisect for the quarantined ml=512 (Q, N)-native kernels.

The transposed flat kernels at ml=512 compiled but crashed the TPU worker
at N=1e7/M=500 (round 3; docs/DESIGN.md §5 "Hardware quarantine"). This
script walks the suspect axes at SMALL N on a real chip so a crash is
cheap and attributable:

  1. fwd-only, ml=384 then ml=512, N=4096   (sub-tile ladder st=40/32)
  2. fwd+bwd (value_and_grad), same shapes  (fori trips 8, vmem bump)
  3. N scale-up at ml=512: 1e5 -> 1e6 -> 4e6 (grid length)

Run:  python tools/qn_ml512_bisect.py [--max-stage 3]
Each stage prints PASS/value before moving on; a worker crash identifies
the failing (ml, direction, N) combination. If all stages pass, raise
psi_pallas._FLAT_ML_HW_LIMIT to 512 and re-run tests/tpu_smoke_runner.py
(which then re-enables the M=512 qn parity case automatically).

OUTCOME (v5e, 2026-08-19): all stages PASS — ml in {384, 512} fwd+bwd are
sound up to N=4e6 per call — but the follow-up N=1e7/M=500 run crashed the
worker AGAIN (same jax UNAVAILABLE "kernel fault" as round 3).

ROUND-5 ROOT CAUSE (tools/flat_n_boundary.py): the crashes were never the
kernel. vg_once below closes its jitted loss over the N-sized y_t/w —
embedding ~520 MB of HLO CONSTANTS at N=1e7, which the axon tunnel's
/remote_compile endpoint could not survive (today it rejects >~300 MB
with a clean HTTP 413). With all N-sized arrays passed as jit ARGUMENTS
(the production calling convention), ml=512 fwd+bwd passes at N=1e7 per
call. This script is kept as the historical record of the bisect; use
flat_n_boundary.py (args version) for any future per-call probing.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-stage", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("no TPU backend; nothing to bisect", file=sys.stderr)
        return 3
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

    from gparml_tpu.ops import psi_pallas

    F = jnp.float32
    q, d = 10, 12

    def make(n, m, seed=0):
        rng = np.random.default_rng(seed)
        mu_t = jnp.asarray(rng.standard_normal((q, n)), F)
        s_t = jnp.asarray(0.3 + 0.5 * rng.random((q, n)), F)
        y_t = jnp.asarray(rng.standard_normal((d, n)), F)
        z = jnp.asarray(rng.standard_normal((m, q)), F)
        alpha = jnp.asarray(0.5 + rng.random(q), F)
        w = jnp.ones((n,), F)
        return mu_t, s_t, y_t, z, alpha, w

    def fwd_once(n, m):
        mu_t, s_t, y_t, z, alpha, w = make(n, m)
        f = jax.jit(lambda a, b, c: psi_pallas.psi_fused_t(
            a, b, z, c, alpha, y_t, w, 32, False))
        t0 = time.time()
        p1y, p2 = f(mu_t, s_t, jnp.float32(1.3))
        v = float(p1y[0, 0]) + float(p2[0, 0])  # host read = sync
        print(f"  fwd n={n} m={m}: OK ({time.time()-t0:.1f}s) v={v:.4e}",
              flush=True)

    def vg_once(n, m):
        mu_t, s_t, y_t, z, alpha, w = make(n, m)
        wy = jnp.asarray(np.random.default_rng(m).standard_normal(
            (m, d)), F)

        def loss(mu_t, s_t, sf2):
            p1y, p2 = psi_pallas.psi_fused_t(
                mu_t, s_t, z, sf2, alpha, y_t, w, 32, False)
            return jnp.sum(p1y * wy) * 1e-3 + jnp.sum(p2) * 1e-6

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        t0 = time.time()
        v, g = f(mu_t, s_t, jnp.float32(1.3))
        out = float(v) + float(g[0][0, 0])
        print(f"  fwd+bwd n={n} m={m}: OK ({time.time()-t0:.1f}s) "
              f"v={out:.4e}", flush=True)

    print("stage 1: forward, small N", flush=True)
    for m in (300, 500):
        fwd_once(4096, m)
    if a.max_stage < 2:
        return 0
    print("stage 2: fwd+bwd, small N", flush=True)
    for m in (300, 500):
        vg_once(4096, m)
    if a.max_stage < 3:
        return 0
    print("stage 3: N scale-up at m=500", flush=True)
    for n in (100_000, 1_000_000, 4_000_000):
        vg_once(n, 500)
    print("ALL STAGES PASS — lift _FLAT_ML_HW_LIMIT to 512 and re-run "
          "tests/tpu_smoke_runner.py", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
