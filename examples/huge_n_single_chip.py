"""GPLVM training at N far beyond one chip's row-major HBM ceiling
(BASELINE config 5 scale: N=10^7, M=500 on ONE TPU v5e) — the user-facing
recipe behind docs/DESIGN.md §5's round-5 capture:

  * ``layout='qn'`` stores every N-sized array transposed ((Q, N)/(D, N)),
    so nothing pays the (N, small-lane) 12.8x HBM tiling expansion;
  * ``scg_mode='auto'`` switches to the host-stepped SCG driver above 2e6
    rows: one device program per iteration instead of one whole-fit
    while_loop program (which exceeds what a worker survives at this
    scale), with the optimizer state donated between programs.

Defaults are CI-sized; the hardware-measured shape is

    python examples/huge_n_single_chip.py --n 10000000 --m 500 --iters 3

(13.3 s per bound+grad eval, monotone SCG, on one v5e — 2026-08-19).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--d", type=int, default=12)
    ap.add_argument("--q", type=int, default=10)
    ap.add_argument("--m", type=int, default=50)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tpu"))
    import jax.numpy as jnp
    from gparml_tpu.models import gplvm
    from gparml_tpu.models import params as P

    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    F = jnp.float32

    # Generate DIRECTLY in the transposed layout — (D, N)/(Q, N) — so the
    # compact form is what uploads to the chip.
    y_t = jnp.asarray(rng.standard_normal((args.d, args.n)), F)
    mu_t = jnp.asarray(rng.standard_normal((args.q, args.n)), F)
    us_t = jnp.full((args.q, args.n), float(np.log(0.5)), F)
    z = jnp.asarray(rng.standard_normal((args.m, args.q)), F)
    glob = jax.tree.map(lambda a: a.astype(F),
                        P.make_global(z, 1.0, np.ones(args.q), 10.0))
    params = P.GPLVMParams(glob=glob, lat=P.LatentParams(mu=mu_t, u_s=us_t))

    cfg = gplvm.GPLVMConfig(
        q=args.q, num_inducing=args.m,
        layout="qn", y_layout="dn",   # the single-chip large-N affordance
        stats_impl="auto",            # pallas on TPU, XLA scan elsewhere
        scg_mode="auto",              # stepped driver above 2e6 rows
    )

    t0 = time.perf_counter()
    res = gplvm.fit(params, y_t, cfg, iters=args.iters)
    bound = float(res.bound)
    wall = time.perf_counter() - t0
    hist = np.asarray(res.history)
    hist = hist[np.isfinite(hist)]
    print(f"N={args.n}: {len(hist)} SCG iterations in {wall:.1f} s "
          f"(incl. compile), bound {hist[0]:.1f} -> {bound:.1f}, "
          f"monotone={bool(np.all(np.diff(hist) >= -1e-3 * np.abs(hist[:-1])))}")


if __name__ == "__main__":
    main()
