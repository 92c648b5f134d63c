"""Probe Mosaic lowering + cost of candidate ops for the staircase backward:
(a) minor-2D transpose of (TN,128,128) f32 / bf16, (b) free-dim dot_general
contracting the sublane dim. Timing via a repeated-op kernel over a grid.

Usage: python tools/probe_ops.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

TN, R, C = 32, 128, 256
GRID = 2000


def run(name, body, out_shape):
    def kernel(x_ref, z_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += body(x_ref[:], z_ref[:])

    x = jnp.asarray(np.random.default_rng(0).standard_normal((TN * R, C)),
                    jnp.float32)
    z = jnp.asarray(np.random.default_rng(1).standard_normal((R, 16)),
                    jnp.float32)

    @jax.jit
    def go(x, z):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((TN * R, C), lambda i: (0, 0)),
                      pl.BlockSpec((R, 16), lambda i: (0, 0))],
            out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(x, z)

    try:
        out = go(x, z)
        float(jnp.sum(out))
        times = []
        for i in range(3):
            xi = x + np.float32((i + 1) * 1e-6)
            t0 = time.perf_counter()
            out = go(xi, z)
            float(jnp.sum(out))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        per_cell = dt / GRID / (TN * R * C) * 1e12
        print(f"{name:28s}: {dt*1e3:7.1f} ms  ({per_cell:.2f} ps/cell)",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:28s}: FAILED {type(e).__name__}: {msg}", flush=True)


def main():
    # baseline: one elementwise pass
    run("mul2 (baseline pass)",
        lambda x, z: x * 2.0, (TN * R, C))
    # minor-2 transpose f32: (TN,R,C) -> (TN,C,R) -> flat
    run("transpose f32 minor2",
        lambda x, z: jnp.swapaxes(x.reshape(TN, R, C), 1, 2)
        .reshape(TN * C, R) @ jnp.ones((R, 1), jnp.float32)
        * jnp.ones((1, C), jnp.float32),
        (TN * C, C))
    # transpose bf16 minor2 (half traffic?)
    run("transpose bf16 minor2",
        lambda x, z: (jnp.swapaxes(x.astype(jnp.bfloat16).reshape(TN, R, C),
                                   1, 2).astype(jnp.float32))
        .reshape(TN * C, R) @ jnp.ones((R, 1), jnp.float32)
        * jnp.ones((1, C), jnp.float32),
        (TN * C, C))
    # free-dim dot_general: contract sublane dim of (TN,R,C) with (R,16)
    run("dot free-dims (TN,R,C)x(R,16)",
        lambda x, z: jax.lax.dot_general(
            x.reshape(TN, R, C), z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TN * C, 16) @ jnp.ones((16, C), jnp.float32),
        (TN * C, C))


if __name__ == "__main__":
    main()
