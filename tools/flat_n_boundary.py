"""Boundary walk for the ml=512 N-scale TPU worker crash (VERDICT r4 item 2).

Round-3 and round-4 hardware sessions both saw the RAW (unchunked) flat
(Q, N)-native kernel at M=500 (ml=512) kill the TPU worker at N=1e7 per
call, while N=4e6 per call passes fwd+bwd (tools/qn_ml512_bisect.py). The
per-call caps in psi_pallas (_FLAT_N_PER_CALL_WIDE = 4e6) are therefore
empirical endpoints with an unmeasured 2.5x gap.

ROUND-5 FINDING (first run of this walk, v5e, 2026-08-19): the historic
crashes were a MEASUREMENT-HARNESS ARTIFACT, not a kernel limit. The
original version of this tool (and qn_ml512_bisect.py before it) closed
the jitted loss over the N-sized y_t/w arrays, embedding them as HLO
CONSTANTS — so every probe shipped an O(N) constant blob through the axon
tunnel's /remote_compile HTTP endpoint. The first walk run produced, at
N=6e6 (a ~312 MB constant):

    INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 413:
    Failed to buffer the request body: length limit exceeded

a clean CLIENT-side size error at exactly the axis the "crash boundary"
was being walked along — while stage G2 (500k grid steps at N=4e6, more
steps than the "crashing" shape's 312k) PASSED, refuting the grid-steps
hypothesis. The production path (suff_stats under fit/bench) passes all
N-sized arrays as jit ARGUMENTS and never embeds them; N=1e7/M=500
bound+grad runs fine through it (13.33 s/eval, DESIGN §5 round-5 capture).

This version therefore probes both variables separately:

  B/G/W/C stages: the RAW kernel with all N-sized arrays as jit ARGUMENTS
     (what production does) — walks the true per-call kernel limit.
  K stages: a tiny-N kernel (N=4096) with an unrelated embedded constant
     of growing size — reproduces the 413/crash against constant bytes,
     decoupled from kernel N.

Stage order is risk-ascending; every PASS is flushed before the next
dispatch so a failure identifies its exact trigger:

  B: N=4e6, tile 32, fwd+bwd, args     (proven baseline; calibrates wall)
  W: N in {6e6, 8e6}, tile 32, args    (the boundary walk proper)
  C: N=1e7, tile 32, args              (the historic "crash" point)
  K: N=4096 + embedded constant of {100, 300} MB (500 MB with --confirm)

Usage: python tools/flat_n_boundary.py [--confirm] [--m 500]
Exit: 0 = all dispatched stages passed. A worker crash surfaces as a jax
UNAVAILABLE error (and may take the chip down — run this LAST).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--confirm", action="store_true",
                    help="also run the riskiest points (500 MB constant)")
    ap.add_argument("--m", type=int, default=500)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("no TPU backend; nothing to walk", file=sys.stderr)
        return 3
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

    from gparml_tpu.ops import psi_pallas

    F = jnp.float32
    q, d = 10, 12
    m = a.m

    def vg_once(n, tile, tag):
        """RAW kernel fwd+bwd with EVERYTHING N-sized as a jit argument —
        the production calling convention (no O(N) HLO constants)."""
        rng = np.random.default_rng(0)
        mu_t = jnp.asarray(rng.standard_normal((q, n)), F)
        s_t = jnp.asarray(0.3 + 0.5 * rng.random((q, n)), F)
        y_t = jnp.asarray(rng.standard_normal((d, n)), F)
        z = jnp.asarray(rng.standard_normal((m, q)), F)
        alpha = jnp.asarray(0.5 + rng.random(q), F)
        w = jnp.ones((n,), F)
        wy = jnp.asarray(np.random.default_rng(m).standard_normal((m, d)), F)

        def loss(mu_t, s_t, y_t, w, sf2):
            p1y, p2 = psi_pallas.psi_fused_t(
                mu_t, s_t, z, sf2, alpha, y_t, w, tile, False)
            return jnp.sum(p1y * wy) * 1e-3 + jnp.sum(p2) * 1e-6

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 4)))
        print(f"[{tag}] DISPATCH fwd+bwd n={n} m={m} tile={tile}", flush=True)
        t0 = time.time()
        v, g = f(mu_t, s_t, y_t, w, jnp.float32(1.3))
        out = float(v) + float(g[0][0, 0])  # host read = sync
        wall = time.time() - t0
        # second rep: compile excluded, the per-call steady wall for the
        # wall-time hypothesis
        t1 = time.time()
        v, g = f(mu_t, s_t, y_t, w, jnp.float32(1.3 + 1e-3))
        float(v)
        print(f"[{tag}] PASS n={n} tile={tile}: first {wall:.1f}s "
              f"(incl compile), steady {time.time() - t1:.1f}s "
              f"v={out:.4e}", flush=True)

    def const_once(mbytes, tag):
        """Tiny-N kernel plus an UNRELATED embedded constant of the given
        size: isolates 'constant bytes through /remote_compile' as the
        failure variable (the original tools' accidental configuration)."""
        n = 4096
        rng = np.random.default_rng(0)
        mu_t = jnp.asarray(rng.standard_normal((q, n)), F)
        s_t = jnp.asarray(0.3 + 0.5 * rng.random((q, n)), F)
        y_t = jnp.asarray(rng.standard_normal((d, n)), F)
        z = jnp.asarray(rng.standard_normal((m, q)), F)
        alpha = jnp.asarray(0.5 + rng.random(q), F)
        w = jnp.ones((n,), F)
        # np array -> closure capture -> HLO constant of mbytes MB
        blob = np.ones((mbytes * 1024 * 1024 // 4,), np.float32)
        blob_c = jnp.asarray(blob)

        def loss(mu_t, s_t, sf2):
            p1y, p2 = psi_pallas.psi_fused_t(
                mu_t, s_t, z, sf2, alpha, y_t, w, 32, False)
            # touch one element so the constant cannot be DCE'd, with a
            # 0-weight so values are unchanged
            return jnp.sum(p1y) * 1e-3 + jnp.sum(p2) * 1e-6 + blob_c[0] * 0.0

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        print(f"[{tag}] DISPATCH const={mbytes}MB n={n}", flush=True)
        t0 = time.time()
        v, _ = f(mu_t, s_t, jnp.float32(1.3))
        print(f"[{tag}] PASS const={mbytes}MB: {time.time()-t0:.1f}s "
              f"v={float(v):.4e}", flush=True)

    print(f"flat-basis per-call boundary walk, m={m} "
          f"(ml={psi_pallas._m_dims(m)[1]}), args-not-constants", flush=True)

    vg_once(4_000_000, 32, "B: proven baseline")
    for n in (6_000_000, 8_000_000):
        vg_once(n, 32, f"W: walk {n:.0e}")
    vg_once(10_000_000, 32, "C: historic crash point, args")

    # constant-size control at tiny N (the artifact reproduction)
    const_once(100, "K1")
    const_once(300, "K2: the 413 region")
    if a.confirm:
        const_once(500, "K3: the historic worker-crash region")
    else:
        print("skipping the 500MB constant point (pass --confirm)",
              flush=True)
    print("ALL DISPATCHED STAGES PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
