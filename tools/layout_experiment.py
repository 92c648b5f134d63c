"""Measure the (Q, N) transposed-latent layout experiment (VERDICT r2 item
6 / docs/DESIGN.md §5): XLA:TPU pads f32 arrays to (8, 128) tiles, so an
(N, Q=10) latent array is physically (N, 128) in HBM — 12.8x its logical
size. Storing latents transposed as (Q, N) removes the padding (N is
lane-aligned) at the cost of a relayout (transpose) at the kernel boundary.

This script measures, on the real chip:
  1. HBM bytes actually allocated for (N, Q) vs (Q, N) at N=4e6, Q=10;
  2. the relayout cost: one (Q, N) -> (N, Q) transpose at N=4e6;
  3. a full bound+grad eval at N=4e6/M=200 with (N, Q) resident vs with
     (Q, N) resident + in-jit transpose (what a transposed SCG state would
     pay per objective evaluation, twice: params in, cotangents out).

Usage: python tools/layout_experiment.py [N]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")


def hbm_used():
    stats = jax.local_devices()[0].memory_stats()
    return None if stats is None else stats.get("bytes_in_use")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    q, m, d = 10, 200, 12
    dev = jax.local_devices()[0]
    out = {"n": n, "q": q}

    # --- 1. physical HBM footprint (memory_stats unavailable through the
    # axon tunnel -> fall back to the documented (8,128)-tiling model,
    # measured directly in round 2: docs/DESIGN.md §5) ---
    if hbm_used() is not None:
        base = hbm_used()
        a_nq = jax.device_put(np.zeros((n, q), np.float32), dev)
        a_nq.block_until_ready()
        out["bytes_nq"] = hbm_used() - base
        base = hbm_used()
        a_qn = jax.device_put(np.zeros((q, n), np.float32), dev)
        a_qn.block_until_ready()
        out["bytes_qn"] = hbm_used() - base
        del a_nq, a_qn
    else:
        out["bytes_nq"] = 4 * n * 128          # (N, 10) tiles to (N, 128)
        out["bytes_qn"] = 4 * 16 * n           # (10, N) tiles to (16, N)
        out["bytes_note"] = "tiling model; memory_stats=None under tunnel"
    out["logical_bytes"] = 4 * n * q

    # --- 2. relayout cost: (Q, N) -> (N, Q) transpose ---
    rng = np.random.default_rng(0)
    x_qn = jnp.asarray(rng.standard_normal((q, n)), jnp.float32)
    tr = jax.jit(lambda a: jnp.sum(a.T * 1.000001))
    float(tr(x_qn))
    times = []
    for i in range(3):
        xi = x_qn + np.float32((i + 1) * 1e-6)
        t0 = time.perf_counter()
        float(tr(xi))
        times.append(time.perf_counter() - t0)
    out["transpose_qn_to_nq_ms"] = round(min(times) * 1e3, 1)

    # --- 3. eval cost with each residency ---
    from gparml_tpu.models import gplvm
    from gparml_tpu.models import params as P

    y = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((m, q)), jnp.float32)
    glob = P.make_global(z, 1.0, np.ones(q), 10.0)
    glob = jax.tree.map(lambda a: a.astype(jnp.float32), glob)
    cfg = gplvm.GPLVMConfig(q=q, num_inducing=m, stats_impl="pallas",
                            pallas_tile=64)

    mu_qn = jnp.asarray(rng.standard_normal((q, n)), jnp.float32)
    us_qn = jnp.zeros((q, n), jnp.float32)

    @jax.jit
    def eval_nq(glob, mu, us, y):
        p = P.GPLVMParams(glob=glob, lat=P.LatentParams(mu=mu, u_s=us))
        return gplvm.neg_bound_value_and_grad(p, y, cfg)[0]

    @jax.jit
    def eval_qn(glob, mu_qn, us_qn, y):
        # transposed residency: params transpose IN, grads would transpose
        # OUT in a real SCG state - measure the in-side (the out-side is the
        # same relayout cost again, reported separately above).
        p = P.GPLVMParams(
            glob=glob, lat=P.LatentParams(mu=mu_qn.T, u_s=us_qn.T)
        )
        return gplvm.neg_bound_value_and_grad(p, y, cfg)[0]

    def timeit(fn, *args):
        o = fn(*args)
        float(o)
        ts = []
        for i in range(3):
            g2 = glob._replace(u_beta=glob.u_beta + np.float32((i + 1) * 1e-3))
            t0 = time.perf_counter()
            o = fn(g2, *args[1:])
            float(o)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    try:
        mu_nq = mu_qn.T.block_until_ready()
        us_nq = us_qn.T.block_until_ready()
        out["eval_nq_s"] = round(timeit(eval_nq, glob, mu_nq, us_nq, y), 3)
        del mu_nq, us_nq
    except Exception as e:
        out["eval_nq_s"] = f"OOM/fail: {type(e).__name__}"
    try:
        out["eval_qn_s"] = round(timeit(eval_qn, glob, mu_qn, us_qn, y), 3)
    except Exception as e:
        out["eval_qn_s"] = f"OOM/fail: {type(e).__name__}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
