"""Boundary walk for the ml=512 N-scale TPU worker crash (VERDICT r4 item 2).

Round-3 and round-4 hardware sessions both saw the RAW (unchunked) flat
(Q, N)-native kernel at M=500 (ml=512) kill the TPU worker at N=1e7 per
call, while N=4e6 per call passes fwd+bwd (tools/qn_ml512_bisect.py). The
per-call caps in psi_pallas (_FLAT_N_PER_CALL_WIDE = 4e6) are therefore
empirical endpoints with an unmeasured 2.5x gap. This walk measures the
boundary and tests the three open hypotheses from docs/DESIGN.md §5:

  (a) total rows per call (HBM input footprint ~ N),
  (b) total GRID STEPS per call (N / tile) — tested WITHIN the proven
      N=4e6 by shrinking the tile: tile=8 at N=4e6 is 500k steps, MORE
      than the crashing N=1e7 at tile 32 (312k). If the crash tracks grid
      steps, stage G crashes at a hardware-proven N — cheap and decisive.
  (c) wall-time per call (a tunnel/driver watchdog) — every stage prints
      its wall seconds so a time threshold separating PASS from CRASH
      would show in the log.

Stage order is risk-ascending; every PASS is flushed before the next
dispatch so a worker crash identifies its exact (N, tile) trigger:

  B: N=4e6, tile 32, fwd+bwd         (proven baseline; calibrates wall)
  G: N=4e6, tile {16, 8}, fwd+bwd    (grid-steps hypothesis)
  W: N in {5e6, 6e6, 8e6}, tile 32   (the boundary walk proper)
  C: N=1e7, tile 32                  (known crash; only with --confirm)

Deliberately calls the RAW psi_fused_t (interpret=False, no chunking) —
this probes the true per-call hardware limit the chunked production path
(_chunk_plan) exists to stay under.

Usage: python tools/flat_n_boundary.py [--confirm] [--m 500]
Exit: 0 = all dispatched stages passed. A worker crash surfaces as a jax
UNAVAILABLE error (and usually takes the chip down — run this LAST).
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
                    help="also re-run the known-crashing N=1e7 point")
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
        rng = np.random.default_rng(0)
        mu_t = jnp.asarray(rng.standard_normal((q, n)), F)
        s_t = jnp.asarray(0.3 + 0.5 * rng.random((q, n)), F)
        y_t = jnp.asarray(rng.standard_normal((d, n)), F)
        z = jnp.asarray(rng.standard_normal((m, q)), F)
        alpha = jnp.asarray(0.5 + rng.random(q), F)
        w = jnp.ones((n,), F)
        wy = jnp.asarray(np.random.default_rng(m).standard_normal((m, d)), F)

        def loss(mu_t, s_t, sf2):
            p1y, p2 = psi_pallas.psi_fused_t(
                mu_t, s_t, z, sf2, alpha, y_t, w, tile, False)
            return jnp.sum(p1y * wy) * 1e-3 + jnp.sum(p2) * 1e-6

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        print(f"[{tag}] DISPATCH fwd+bwd n={n} m={m} tile={tile}", flush=True)
        t0 = time.time()
        v, g = f(mu_t, s_t, jnp.float32(1.3))
        out = float(v) + float(g[0][0, 0])  # host read = sync
        wall = time.time() - t0
        # second rep: compile excluded, the per-call steady wall for the
        # wall-time hypothesis
        t1 = time.time()
        v, g = f(mu_t, s_t, jnp.float32(1.3 + 1e-3))
        float(v)
        print(f"[{tag}] PASS n={n} tile={tile}: first {wall:.1f}s "
              f"(incl compile), steady {time.time() - t1:.1f}s "
              f"v={out:.4e}", flush=True)

    print(f"flat-basis per-call boundary walk, m={m} "
          f"(ml={psi_pallas._m_dims(m)[1]})", flush=True)

    vg_once(4_000_000, 32, "B: proven baseline")

    # grid-steps hypothesis: more steps than the crashing shape, proven N
    vg_once(4_000_000, 16, "G1: 250k steps")
    vg_once(4_000_000, 8, "G2: 500k steps > crash shape's 312k")

    for n in (5_000_000, 6_000_000, 8_000_000):
        vg_once(n, 32, f"W: walk {n:.0e}")

    if a.confirm:
        vg_once(10_000_000, 32, "C: known crash point")
    else:
        print("skipping the known-crashing N=1e7 point (pass --confirm)",
              flush=True)
    print("ALL DISPATCHED STAGES PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
