"""Single-chip large-N demonstration (docs/DESIGN.md §5): BASELINE config-5
scale N=1e7 GPLVM on ONE v5e, enabled by layout='qn' (transposed (Q, N)
latent storage removes the 12.8x lane-padding HBM expansion that previously
capped one chip at N~4e6).

Runs a fused bound+grad eval and a short SCG fit; prints one JSON line.

Usage: python tools/large_n_singlechip.py [N] [M] [iters]
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

from gparml_tpu.models import gplvm
from gparml_tpu.models import params as P
from gparml_tpu.opt import scg


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    q, d = 10, 12
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    # EVERYTHING N-sized ships transposed — (D, N)/(Q, N) — so no array ever
    # pays the (N, small-lane) 12.8x HBM tiling expansion on the chip.
    y = jnp.asarray(rng.standard_normal((d, n), dtype=np.float32))
    mu_qn = jnp.asarray(rng.standard_normal((q, n), dtype=np.float32))
    us_qn = jnp.full((q, n), float(np.log(0.5)), dtype)
    z = jnp.asarray(rng.standard_normal((m, q), dtype=np.float32))
    glob = P.make_global(z, 1.0, np.ones(q), 10.0)
    glob = jax.tree.map(lambda a: a.astype(dtype), glob)
    params = P.GPLVMParams(glob=glob, lat=P.LatentParams(mu=mu_qn, u_s=us_qn))
    cfg = gplvm.GPLVMConfig(q=q, num_inducing=m, layout="qn", y_layout="dn",
                            stats_impl="pallas", pallas_tile=64)

    @jax.jit
    def eval_once(p, y):
        return gplvm.neg_bound_value_and_grad(p, y, cfg)

    out = eval_once(params, y)
    float(out[0])
    times = []
    for i in range(2):
        g2 = glob._replace(u_beta=glob.u_beta + np.float32((i + 1) * 1e-3))
        p_i = params._replace(glob=g2)
        t0 = time.perf_counter()
        o = eval_once(p_i, y)
        float(o[0])
        times.append(time.perf_counter() - t0)
    eval_s = min(times)

    t0 = time.perf_counter()
    res = gplvm.fit(params, y, cfg, iters=iters,
                    scg_options=scg.SCGOptions(max_iters=iters))
    bound = float(res.bound)
    fit_s = time.perf_counter() - t0
    hist = np.asarray(res.history)
    hist = hist[np.isfinite(hist)]
    print(json.dumps({
        "n": n, "m": m, "q": q, "d": d, "layout": "qn",
        "eval_s": round(eval_s, 3),
        "scg_iters": int(len(hist)),
        "bound_history": [round(float(b), 1) for b in hist],
        "monotone": bool(np.all(np.diff(hist) >= -1e-3 * np.abs(hist[:-1]))),
        "fit_wall_s": round(fit_s, 1),
        "final_bound": round(bound, 1),
    }))


if __name__ == "__main__":
    main()
