"""Roofline + per-stage timing for the north-star bound+grad evaluation
(VERDICT r4 item 3): report fwd / bwd / bound-assembly wall times AND a
computed distance-to-floor, with the floor built from THIS chip's measured
primitive rates rather than datasheet guesses.

NOT part of the package — a measurement harness. Prints one JSON object.

Method
------
1. Micro-measure on the real chip:
     * exp2 element rate  — a Pallas kernel timing `acc += exp2(x + i)`
       minus the `acc += (x + i)` baseline (isolates the transcendental),
     * VPU elementwise rate — the baseline loop itself (mul/add class),
     * MXU rate at the kernel's actual contraction depth (K = 3*(3Q+2)
       bf16 rungs -> one partially-filled 128-K tile).
2. Count the flat-basis kernel's ops exactly from its structure
   (ops/psi_pallas.py): per data point the staircase covers
   cells = 128*S, S = sum_b (Ml - 128 b); forward does one exp2 per cell
   (+ Ml for Psi1) and 2*(3K) flops/cell of MXU; backward recomputes the
   forward slab, then pays the G-split (Veltkamp, ~4 VPU ops/cell) and the
   H/mirror contractions (2*(2K'+K') flops/cell + mirror).
3. Time the stages: psi forward alone, psi fwd+bwd (value_and_grad of a
   scalarized loss over the kernel outputs), and the full bound+grad eval;
   assembly = full - kernel vjp.

Floor semantics: per stage, floor_vpu = exp2/VPU work at measured rates,
floor_mxu = flops at the measured K-limited MXU rate; the optimistic floor
is max(floor_vpu, floor_mxu) (perfect overlap), the pessimistic is the sum.

Usage: python tools/roofline.py [N] [M] [--layout qn|nq]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")


def _sync(x):
    """Host read of ONE scalar. Under the axon tunnel, np.asarray of a big
    output pays its full transfer — every timed function below must reduce
    to a scalar in-graph so this fetch is O(1) bytes."""
    leaf = jax.tree.leaves(x)[0]
    return float(leaf if getattr(leaf, "ndim", 0) == 0
                 else leaf[(0,) * leaf.ndim])


def _time_best(fn, args, reps=4, overhead=0.0):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return max(best - overhead, 1e-9)


def measure_dispatch_overhead():
    """Round-trip cost of one jit dispatch + scalar host read (the axon
    tunnel's per-call latency) — subtracted from every microbench so the
    rates measure compute, not transport."""
    f = jax.jit(lambda s: s + 1.0)
    return _time_best(f, (jnp.float32(1.0),), reps=8)


# --------------------------------------------------------------------------
# 1. primitive rates, measured in place
# --------------------------------------------------------------------------

def measure_vpu_rates(overhead: float):
    """(exp2_elems_per_s, vpu_elementwise_ops_per_s). The loop bodies differ
    by exactly one exp2; both carry the same add+iota-scalar overhead, so the
    time difference divided by the element count is the marginal exp2 cost.
    The pallas output reduces to one scalar in-graph (see _sync)."""
    from jax.experimental import pallas as pl

    rows, cols, reps, grid = 512, 1024, 512, 32

    def kern(x_ref, o_ref, *, use_exp2):
        x = x_ref[...]

        def body(i, acc):
            t = x + i.astype(jnp.float32)
            if use_exp2:
                t = jnp.exp2(-t)
            return acc + t

        o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

    x = jnp.linspace(0.0, 1.0, rows * cols, dtype=jnp.float32).reshape(rows, cols)

    def run(use_exp2):
        f = pl.pallas_call(
            functools.partial(kern, use_exp2=use_exp2),
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, cols), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((rows, cols), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )
        g = jax.jit(lambda x: jnp.sum(f(x)))
        return _time_best(g, (x,), reps=6, overhead=overhead)

    elems = grid * rows * cols * reps
    t_exp = run(True)
    t_base = run(False)
    # baseline body = add + add (2 ops/elem); exp2 marginal = t_exp - t_base
    vpu_rate = 2 * elems / t_base
    exp2_rate = elems / max(t_exp - t_base, 1e-9)
    return exp2_rate, vpu_rate


def measure_mxu_rate(k: int, overhead: float):
    """Achievable bf16->f32 MXU rate at contraction depth k with
    VMEM-resident accumulation — the flat kernel's actual matmul shape
    ((tile, k) bf16 against (k, 256) bf16 rungs, f32 accumulator that never
    leaves VMEM). A one-shot XLA matmul would measure HBM output bandwidth
    instead (skinny-K matmuls are traffic-bound when the product is
    written out)."""
    from jax.experimental import pallas as pl

    rows, cols, reps, grid = 256, 256, 512, 64

    def kern(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]

        def body(i, acc):
            aa = a + i.astype(jnp.bfloat16)   # defeat loop-invariant hoisting
            return acc + jax.lax.dot_general(
                aa, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        o_ref[...] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((rows, cols), jnp.float32))

    a = jnp.ones((rows, k), jnp.bfloat16)
    b = jnp.ones((k, cols), jnp.bfloat16)
    f = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, cols), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rows, cols), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
    )
    g = jax.jit(lambda a, b: jnp.sum(f(a, b)))
    t = _time_best(g, (a, b), reps=6, overhead=overhead)
    return 2.0 * grid * reps * rows * cols * k / t


# --------------------------------------------------------------------------
# 2. op counts from the flat-kernel structure
# --------------------------------------------------------------------------

def op_counts(n: int, m: int, q: int, d: int):
    from gparml_tpu.ops import psi_pallas as pp

    _, ml = pp._m_dims(m)
    nb = ml // 128
    s_cols = nb * ml - 128 * (nb * (nb - 1)) // 2     # staircase column area
    cells = 128 * s_cols                              # slab cells per point
    kx = 3 * q + 2
    k3 = 3 * kx                                       # bf16 rung depth

    fwd = {
        "exp2": n * (cells + ml),                     # slab + Psi1 row
        "vpu": n * (2 * cells + 8 * ml),              # accum add + basis prep
        "mxu_flops": 2 * k3 * n * cells + 2 * n * ml * d,
    }
    # backward: recompute fwd slab (+ exp2), G mult, Veltkamp split (~4 ops),
    # H contractions at depth 128 against (2kx | kx) rungs + mirror blocks.
    mirror_cells = 128 * (s_cols - ml)                # off-diagonal cells
    bwd = {
        "exp2": n * (cells + ml),
        "vpu": n * (7 * cells + 16 * ml),
        "mxu_flops": (
            2 * k3 * n * cells                        # slab recompute
            + 2 * (3 * kx) * n * cells                # hx2 (2kx) + hx1 (kx)
            + 2 * (3 * kx) * n * mirror_cells         # mirror contractions
            + 6 * n * ml * d                          # dyw/dlq matmuls
        ),
    }
    return fwd, bwd, {"ml": ml, "cells_per_n": cells, "k3": k3}


def floors(counts, exp2_rate, vpu_rate, mxu_rate):
    t_vpu = counts["exp2"] / exp2_rate + counts["vpu"] / vpu_rate
    t_mxu = counts["mxu_flops"] / mxu_rate
    return {
        "vpu_s": round(t_vpu, 4),
        "mxu_s": round(t_mxu, 4),
        "floor_overlap_s": round(max(t_vpu, t_mxu), 4),
        "floor_serial_s": round(t_vpu + t_mxu, 4),
    }


# --------------------------------------------------------------------------
# 3. stage timings
# --------------------------------------------------------------------------

def stage_times(n, m, q, d, layout):
    from gparml_tpu.models import gplvm
    from gparml_tpu.models import params as P
    from gparml_tpu.ops import psi_pallas
    from gparml_tpu.utils import transforms

    rng = np.random.default_rng(0)
    F = jnp.float32
    if layout == "qn":
        mu = jnp.asarray(rng.standard_normal((q, n)), F)
        s = jnp.asarray(0.3 + 0.5 * rng.random((q, n)), F)
        y = jnp.asarray(rng.standard_normal((d, n)), F)
    else:
        mu = jnp.asarray(rng.standard_normal((n, q)), F)
        s = jnp.asarray(0.3 + 0.5 * rng.random((n, q)), F)
        y = jnp.asarray(rng.standard_normal((n, d)), F)
    z = jnp.asarray(rng.standard_normal((m, q)), F)
    alpha = jnp.asarray(0.5 + rng.random(q), F)
    w = jnp.ones((n,), F)
    wy = jnp.asarray(rng.standard_normal((m, d)), F)
    kernel = psi_pallas.psi_fused_t if layout == "qn" else psi_pallas.psi_fused

    @jax.jit
    def fwd(mu, s, sf2):
        return kernel(mu, s, z, sf2, alpha, y, w, 64, False)

    def loss(mu, s, sf2):
        p1y, p2 = kernel(mu, s, z, sf2, alpha, y, w, 64, False)
        return jnp.sum(p1y * wy) * 1e-3 + jnp.sum(p2) * 1e-6

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    t_fwd = _time_best(fwd, (mu, s, jnp.float32(1.3)), reps=4)
    t_vg = _time_best(vg, (mu, s, jnp.float32(1.3)), reps=4)

    # full bound+grad through the model layer
    bij = transforms.get("exp")
    glob = P.make_global(z, 1.0, np.asarray(alpha), 10.0)
    glob = jax.tree.map(lambda a: a.astype(F), glob)
    lat = P.LatentParams(mu=mu, u_s=bij.inverse(s))
    params = P.GPLVMParams(glob=glob, lat=lat)
    cfg = gplvm.GPLVMConfig(
        q=q, num_inducing=m, stats_impl="pallas", pallas_tile=64,
        layout=layout, y_layout="dn" if layout == "qn" else "nd",
    )

    @jax.jit
    def full(p, y):
        return gplvm.neg_bound_value_and_grad(p, y, cfg)

    t_full = _time_best(full, (params, y), reps=4)
    return t_fwd, t_vg, t_full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=1_000_000)
    ap.add_argument("m", nargs="?", type=int, default=200)
    ap.add_argument("--layout", default="qn", choices=["qn", "nq"])
    ap.add_argument("--q", type=int, default=10)
    ap.add_argument("--d", type=int, default=12)
    a = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(json.dumps({"note": "no TPU backend; roofline needs hardware"}))
        return 3

    overhead = measure_dispatch_overhead()
    exp2_rate, vpu_rate = measure_vpu_rates(overhead)
    fwd_c, bwd_c, meta = op_counts(a.n, a.m, a.q, a.d)
    mxu_rate = measure_mxu_rate(meta["k3"], overhead)
    mxu_rate_bwd = measure_mxu_rate(128, overhead)  # H contractions run at K=128

    t_fwd, t_vg, t_full = stage_times(a.n, a.m, a.q, a.d, a.layout)
    t_bwd = t_vg - t_fwd
    t_asm = t_full - t_vg

    f_fwd = floors(fwd_c, exp2_rate, vpu_rate, mxu_rate)
    # backward's H flops run at full K; weight the two matmul classes
    slab_flops = 2 * meta["k3"] * a.n * meta["cells_per_n"]
    h_flops = bwd_c["mxu_flops"] - slab_flops
    t_mxu_bwd = slab_flops / mxu_rate + h_flops / mxu_rate_bwd
    t_vpu_bwd = bwd_c["exp2"] / exp2_rate + bwd_c["vpu"] / vpu_rate
    f_bwd = {
        "vpu_s": round(t_vpu_bwd, 4),
        "mxu_s": round(t_mxu_bwd, 4),
        "floor_overlap_s": round(max(t_vpu_bwd, t_mxu_bwd), 4),
        "floor_serial_s": round(t_vpu_bwd + t_mxu_bwd, 4),
    }

    dev = jax.devices()[0]
    print(json.dumps({
        "shape": {"n": a.n, "m": a.m, "q": a.q, "d": a.d,
                  "layout": a.layout, **meta},
        "device": dev.device_kind,
        "rates": {
            "exp2_per_s": f"{exp2_rate:.3e}",
            "vpu_elementwise_per_s": f"{vpu_rate:.3e}",
            f"mxu_flops_per_s_k{meta['k3']}": f"{mxu_rate:.3e}",
            "mxu_flops_per_s_k128": f"{mxu_rate_bwd:.3e}",
        },
        "measured_s": {
            "psi_fwd": round(t_fwd, 4),
            "psi_bwd": round(t_bwd, 4),
            "psi_fwd_bwd": round(t_vg, 4),
            "bound_assembly": round(t_asm, 4),
            "full_bound_grad": round(t_full, 4),
        },
        "floor_fwd": f_fwd,
        "floor_bwd": f_bwd,
        "ratio_to_overlap_floor": {
            "fwd": round(t_fwd / max(f_fwd["floor_overlap_s"], 1e-9), 2),
            "bwd": round(t_bwd / max(f_bwd["floor_overlap_s"], 1e-9), 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
