"""SVGP steps/sec on the current backend (VERDICT r3 item 7).

The round-3 data-parallel SVGP (models/svgp.py elbo_sharded) is CPU-mesh
tested; this measures training steps/sec on real hardware at a
production-ish shape, comparing the plain single-device path with the
mesh=1 sharded path (they should be ~identical — the shard_map wrapper adds
one psum of scalars). Prints one JSON line.

Run: python tools/svgp_bench.py [--n 200000 --m 128 --batch 4096 --steps 200]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=200)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    from gparml_tpu.models import svgp
    from gparml_tpu.parallel import mesh as mesh_lib

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    q, d = 4, 3
    x_np = rng.uniform(-2, 2, (a.n, q)).astype(np.float32)
    w_np = rng.standard_normal((q, d)).astype(np.float32)
    y_np = (np.tanh(x_np @ w_np) + 0.1 * rng.standard_normal(
        (a.n, d))).astype(np.float32)

    cfg = svgp.SVGPConfig(num_inducing=a.m, batch_size=a.batch)
    p0 = svgp.init_params(jax.random.key(0), jnp.asarray(x_np),
                          jnp.asarray(y_np), cfg)

    def run(mesh, xs, ys, weights, tag):
        # warm (compile) with the SAME step count: the scan length is baked
        # into the compiled program, so a steps=2 warm-up leaves the timed
        # steps=N call paying the full TPU compile (measured: that skew made
        # the mesh=1 sharded path look 9x slower than plain in round 4's
        # first capture).
        r = svgp.fit(p0, xs, ys, cfg, steps=a.steps, learning_rate=1e-2,
                     mesh=mesh, weights=weights, key=jax.random.key(1))
        float(r.elbo)
        t0 = time.perf_counter()
        r = svgp.fit(p0, xs, ys, cfg, steps=a.steps, learning_rate=1e-2,
                     mesh=mesh, weights=weights, key=jax.random.key(2))
        float(r.elbo)  # host read = the only reliable sync under the tunnel
        dt = time.perf_counter() - t0
        return a.steps / dt, float(r.elbo)

    sps_plain, elbo_plain = run(None, jnp.asarray(x_np), jnp.asarray(y_np),
                                None, "plain")
    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev)
    ys, xs, w = mesh_lib.shard_data(mesh, y_np, x_np)
    sps_shard, elbo_shard = run(mesh, xs, ys, w, "sharded")

    print(json.dumps({
        "metric": f"SVGP steps/sec (N={a.n}, M={a.m}, batch={a.batch}, "
                  f"{n_dev}x {backend})",
        "plain_steps_per_sec": round(sps_plain, 2),
        "sharded_steps_per_sec": round(sps_shard, 2),
        "elbo_plain": round(elbo_plain, 2),
        "elbo_sharded": round(elbo_shard, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
