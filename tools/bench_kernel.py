"""Micro-benchmark for the fused psi-statistics Pallas kernel (fwd and bwd
timed separately) on the real TPU. Not part of the public bench contract
(see bench.py); used to drive kernel optimization.

Usage: python tools/bench_kernel.py [N] [M] [Q] [D]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

    from gparml_tpu.ops import psi_pallas

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    d = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    tile = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((n, d)), dtype=dtype)
    mu = jnp.asarray(rng.standard_normal((n, q)), dtype=dtype)
    s = jnp.full((n, q), 0.5, dtype=dtype)
    z = jnp.asarray(rng.standard_normal((m, q)), dtype=dtype)
    sf2 = jnp.float32(1.0)
    alpha = jnp.ones((q,), dtype)
    w = jnp.ones((n,), dtype)

    @jax.jit
    def fwd(mu, s, z, sf2, alpha, y, w):
        p1y, p2 = psi_pallas.psi_fused(mu, s, z, sf2, alpha, y, w, tile, False)
        return jnp.sum(p1y) + jnp.sum(p2)

    @jax.jit
    def fwdbwd(mu, s, z, sf2, alpha, y, w):
        def f(mu, s, z, sf2, alpha, y):
            p1y, p2 = psi_pallas.psi_fused(mu, s, z, sf2, alpha, y, w, tile, False)
            return jnp.sum(p1y) + jnp.sum(p2 * (1.0 + 0.01 * p2))
        val, g = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            mu, s, z, sf2, alpha, y
        )
        return val + sum(jnp.sum(x) for x in g)

    def timeit(fn, reps=4):
        out = fn(mu, s, z, sf2, alpha, y, w)
        float(out)  # sync
        times = []
        for i in range(reps):
            # perturb to defeat tunnel dedup of identical dispatches
            zi = z + np.float32((i + 1) * 1e-6)
            t0 = time.perf_counter()
            out = fn(mu, s, zi, sf2, alpha, y, w)
            float(out)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_f = timeit(fwd)
    t_fb = timeit(fwdbwd)
    # Cell model matching the kernel's actual tiling: the forward pads
    # asymmetrically (Ms x Ml) and, at Ml >= 256, computes only the
    # upper-triangle 128-blocks; the backward is symmetric (Ml x Ml).
    ml = ((max(m, 128) + 127) // 128) * 128
    ms = min(((m + 7) // 8) * 8, ml)
    if ml >= 256:
        bl = 128
        fwd_cells_per_n = sum(
            (min(ms, (bi + 1) * bl) - bi * bl) * bl * (ml // bl - bi)
            for bi in range(ml // bl)
            if min(ms, (bi + 1) * bl) > bi * bl
        )
    else:
        fwd_cells_per_n = ms * ml
    exps = n * fwd_cells_per_n
    bwd_exps = n * ml * ml
    print(f"shape N={n} M={m} (Ms={ms}, Ml={ml}) Q={q} D={d} tile={tile}")
    print(f"fwd      : {t_f*1e3:8.1f} ms   ({exps/t_f/1e9:.1f} Gexp/s)")
    print(f"fwd+bwd  : {t_fb*1e3:8.1f} ms")
    print(f"bwd est  : {(t_fb-t_f)*1e3:8.1f} ms   ({bwd_exps/(t_fb-t_f)/1e9:.1f} Gexp/s)")


if __name__ == "__main__":
    main()
