"""Tile sweep for the PRODUCTION flat kernels (psi_pallas.psi_fused /
psi_fused_t) at the north-star shape: walks the N-tile for forward and
fwd+bwd in both layouts to check the default (tile=64 row-major, 32 qn)
against the calibrated budget ceiling (fwd allows up to 152 at ml=256).

The roofline (docs/DESIGN.md §3) puts the forward at 1.31x of its ALU
overlap floor; a too-small N-tile re-runs the per-tile basis build
(_tile_basis + per-slab _flat_lhs3 rounding) more often per cell, so the
tile is the cheapest lever to test before touching kernel math.

Usage: python tools/tile_sweep.py [N] [M]
Prints one line per (layout, direction, tile): steady min-of-3 seconds.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("no TPU backend", file=sys.stderr)
        return 3
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

    from gparml_tpu.ops import psi_pallas

    F = jnp.float32
    q, d = 10, 12
    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.standard_normal((n, q)), F)
    s = jnp.asarray(0.3 + 0.5 * rng.random((n, q)), F)
    y = jnp.asarray(rng.standard_normal((n, d)), F)
    z = jnp.asarray(rng.standard_normal((m, q)), F)
    alpha = jnp.asarray(0.5 + rng.random(q), F)
    w = jnp.ones((n,), F)
    wy = jnp.asarray(np.random.default_rng(m).standard_normal((m, d)), F)
    mu_t, s_t, y_t = mu.T, s.T, y.T
    mu_t, s_t, y_t = (jnp.asarray(np.asarray(a)) for a in (mu_t, s_t, y_t))

    def steady(f, args, perturb):
        v = f(*args)
        float(jax.tree.leaves(v)[0].ravel()[0])
        ts = []
        for i in range(3):
            a2 = perturb(args, i)
            t0 = time.perf_counter()
            v = f(*a2)
            float(jax.tree.leaves(v)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def row_args(i):
        return (mu, s, z, jnp.float32(1.3 + 1e-3 * i), alpha, y, w)

    def qn_args(i):
        return (mu_t, s_t, z, jnp.float32(1.3 + 1e-3 * i), alpha, y_t, w)

    for layout, fn, mk in (("nq", psi_pallas.psi_fused, row_args),
                           ("qn", psi_pallas.psi_fused_t, qn_args)):
        for tile in (16, 32, 64, 96, 128, 152):
            try:
                fwd = jax.jit(lambda *a: fn(*a[:7], tile, False))
                dt = steady(fwd, mk(0), lambda a, i: mk(i + 1))
                print(f"{layout} fwd tile={tile}: {dt:.4f}s", flush=True)
            except Exception as e:
                msg = (str(e).splitlines() or ["<no message>"])[0][:90]
                print(f"{layout} fwd tile={tile}: FAIL "
                      f"{type(e).__name__}: {msg}", flush=True)

        for tile in (8, 16, 32, 64):
            try:
                def mkloss(t):
                    # every N-sized array (y AND w) rides as a jit argument —
                    # never a closure constant (the round-5 /remote_compile
                    # root cause; psi_pallas calibration block)
                    def loss(mu_a, s_a, sf2, ya, wa):
                        p1y, p2 = fn(mu_a, s_a, z, sf2, alpha, ya, wa, t, False)
                        return jnp.sum(p1y * wy) * 1e-3 + jnp.sum(p2) * 1e-6
                    return loss
                g = jax.jit(jax.value_and_grad(mkloss(tile), argnums=(0, 1, 2)))
                if layout == "nq":
                    pert = lambda a, i: (mu, s, jnp.float32(1.3 + 1e-3 * (i + 1)), y, w)
                else:
                    pert = lambda a, i: (mu_t, s_t, jnp.float32(1.3 + 1e-3 * (i + 1)), y_t, w)
                dt = steady(g, pert(None, -1), pert)
                print(f"{layout} fwd+bwd tile={tile}: {dt:.4f}s", flush=True)
            except Exception as e:
                msg = (str(e).splitlines() or ["<no message>"])[0][:90]
                print(f"{layout} fwd+bwd tile={tile}: FAIL "
                      f"{type(e).__name__}: {msg}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
