"""Large-scale GPLVM bound+gradient benchmark (BASELINE config 4 shape:
N=1e6, Q=10, M=200 — scaled by --n) on all available devices, exercising the
data-parallel mesh and both psi-statistics engines.

    python examples/large_scale_gplvm.py --n 100000 --m 200
"""

import argparse
import sys
import os
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=12)
    ap.add_argument("--q", type=int, default=10)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--block", type=int, default=4000)
    args = ap.parse_args()

    import jax
    # Persistent compile cache: a cold XLA compile of the N-scaled blocked
    # scan costs minutes (especially through the remote-TPU tunnel); every
    # tool and the bench set this, examples must too.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tpu"))
    import jax.numpy as jnp
    from gparml_tpu.models import gplvm
    from gparml_tpu.models import params as P
    from gparml_tpu.parallel import mesh as mesh_lib

    devs = jax.devices()
    print(f"{len(devs)} device(s): {devs[0].device_kind}")
    rng = np.random.default_rng(0)
    F = jnp.float32
    y = rng.standard_normal((args.n, args.d)).astype(np.float32)
    mu = rng.standard_normal((args.n, args.q)).astype(np.float32)
    s = np.full((args.n, args.q), 0.5, np.float32)
    z = jnp.asarray(rng.standard_normal((args.m, args.q)), F)
    glob = jax.tree.map(lambda a: a.astype(F), P.make_global(z, 1.0, np.ones(args.q), 10.0))

    mesh = mesh_lib.make_mesh(len(devs)) if len(devs) > 1 else None
    weights = None
    if mesh is not None:
        y_s, mu_s, us_s, weights = mesh_lib.shard_data(mesh, y, mu, np.log(s))
        y_j, params = y_s, P.GPLVMParams(glob=glob, lat=P.LatentParams(mu=mu_s, u_s=us_s))
    else:
        y_j = jnp.asarray(y)
        params = P.GPLVMParams(glob=glob, lat=P.make_latents(jnp.asarray(mu), jnp.asarray(s)))

    for impl in ("xla", "pallas"):
        cfg = gplvm.GPLVMConfig(q=args.q, num_inducing=args.m,
                                block=min(args.block, args.n), stats_impl=impl)
        f = jax.jit(lambda p, y: gplvm.neg_bound_value_and_grad(p, y, cfg, mesh=mesh, weights=weights))
        try:
            out = f(params, y_j)
            float(out[0])
            ts = []
            for i in range(3):
                g2 = params.glob._replace(u_beta=params.glob.u_beta + np.float32(1e-3 * (i + 1)))
                t0 = time.perf_counter()
                out = f(params._replace(glob=g2), y_j)
                float(out[0])
                ts.append(time.perf_counter() - t0)
            flops = 2 * args.n * args.m * args.m * (args.q + 2) * 3  # fwd+bwd psi2-ish
            print(f"{impl:7s}: {min(ts)*1e3:8.1f} ms / bound+grad eval "
                  f"(~{flops/min(ts)/1e12:.2f} TFLOP/s effective)")
        except Exception as e:
            # Pallas requires a real TPU; report the actual failure so users
            # can tell a missing backend from a genuine kernel bug.
            print(f"{impl:7s}: failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
