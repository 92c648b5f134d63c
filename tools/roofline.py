"""Roofline + per-stage timing for the north-star bound+grad evaluation
(VERDICT r4 item 3): report fwd / bwd / bound-assembly wall times AND a
computed distance-to-floor, with the floor built from THIS chip's measured
primitive rates rather than datasheet guesses (MXU excepted — see below).

NOT part of the package — a measurement harness. Prints one JSON object.

Measurement methodology (hard-won; round-5 session)
----------------------------------------------------
* The axon tunnel's dispatch round trip is ~30 ms AND it dedupes a dispatch
  identical to the immediately preceding one. Consequences: (a) every rep
  must perturb its inputs, (b) any microbench whose kernel time is not >>
  30 ms measures the tunnel, not the chip. All primitive rates below are
  therefore LINEARITY SLOPES between two grid sizes (256 vs 1024 grid
  steps, ~100 ms vs ~400 ms wall) — the intercept absorbs RTT + fixed
  overhead exactly.
* Measured this way on the v5e (2026-08-19):
    - VPU ALU pipe: ~7.4-7.9e11 f32 vector instr/s (~0.8/lane/cycle,
      single-issue; an 8-deep FMA chain and a 2-op streaming body give the
      same INSTRUCTION rate, so it is issue-limited, not FLOP-limited).
    - exp2 pipe: SEPARATE from the ALU pipe. One exp2 per >=2 ALU ops is
      FREE (0->1 exp2 in a 2-op body: identical wall). Marginal rate for
      additional exp2s: ~1.7e12/s.
    - MXU: a fori-loop of small dots measures Mosaic issue overhead
      (~1e12 flops/s at ANY K — 0.5% of peak — with bit-correct outputs),
      and a one-shot XLA matmul at skinny K measures HBM writeback. Neither
      is the rate the real kernel's pipelined slab dots achieve, so the MXU
      floor uses the DATASHEET bf16 peak derated by K-tile fill
      (min(k,128)/128) — an optimistic bound, which is the correct
      direction for a floor.
* Stage times subtract the measured RTT once (fwd); bwd and assembly are
  differences of two dispatches, where RTT cancels.

Floor semantics: per stage, time on each pipe (ALU, exp2-marginal, MXU,
HBM) from structural op counts (hand-counted from ops/psi_pallas.py,
+-30%); floor_overlap = max over pipes (perfect overlap), floor_serial =
sum. Real distance-to-floor lies between the two ratios.

Usage: python tools/roofline.py [N] [M] [--layout qn|nq]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache_tpu"))

# Single source for per-chip datasheet peaks (bench.py owns the table).
from bench import _PEAK_BF16_TFLOPS

_HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "TPU v5p": 2765.0,
             "TPU v5": 2765.0, "TPU v6 lite": 1640.0, "TPU v6e": 1640.0}


def _sync(x):
    """Host read of ONE scalar. Under the axon tunnel, np.asarray of a big
    output pays its full transfer — every timed function below must reduce
    to a scalar in-graph so this fetch is O(1) bytes."""
    leaf = jax.tree.leaves(x)[0]
    return float(leaf if getattr(leaf, "ndim", 0) == 0
                 else leaf[(0,) * leaf.ndim])


def _time_best(fn, args, reps=4, perturb=None):
    """perturb(args, i) -> fresh args for rep i (tunnel dedupe — see module
    docstring). Perturbation cost stays untimed."""
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for i in range(reps):
        a_i = perturb(args, i) if perturb is not None else args
        jax.block_until_ready(a_i)
        t0 = time.perf_counter()
        out = fn(*a_i)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_rtt():
    """Tunnel round trip: one trivial jit dispatch + scalar host read."""
    f = jax.jit(lambda s: s + 1.0)
    return _time_best(f, (jnp.float32(1.0),), reps=8,
                      perturb=lambda a, i: (jnp.float32(1.0 + i),))


# --------------------------------------------------------------------------
# 1. primitive rates: linearity slopes between two grid sizes
# --------------------------------------------------------------------------

_ROWS, _COLS, _REPS = 512, 1024, 256
_G1, _G2 = 256, 1024


def _grid_kernel(body_fn, grid):
    """Streaming pallas kernel: same input block, distinct (mod 8) output
    blocks per grid step, `_REPS` fori iterations of `body_fn` per step."""
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jax.lax.fori_loop(
            0, _REPS, lambda i, acc: body_fn(i, acc, x),
            jnp.zeros((_ROWS, _COLS), jnp.float32))

    f = pl.pallas_call(
        kern, grid=(grid,),
        in_specs=[pl.BlockSpec((_ROWS, _COLS), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((_ROWS, _COLS), lambda i: (i % 8, 0)),
        out_shape=jax.ShapeDtypeStruct((8 * _ROWS, _COLS), jnp.float32))
    return jax.jit(lambda x: jnp.sum(f(x)))


def _slope_time(body_fn, x0):
    """Per-grid-step seconds from the (G1, G2) linearity slope."""
    pert = lambda a, i: (a[0] + np.float32(1e-4 * (i + 1)),)
    t1 = _time_best(_grid_kernel(body_fn, _G1), (x0,), reps=3, perturb=pert)
    t2 = _time_best(_grid_kernel(body_fn, _G2), (x0,), reps=3, perturb=pert)
    return (t2 - t1) / (_G2 - _G1)


def measure_vpu_rates():
    """(alu_instr_per_s, exp2_marginal_per_s). ALU: a 2-op streaming body
    (add + accumulate). exp2 marginal: slope between 1 and 3 exp2s per elem
    (the FIRST exp2 rides free on the separate transcendental pipe)."""
    x0 = jnp.linspace(0.0, 1.0, _ROWS * _COLS,
                      dtype=jnp.float32).reshape(_ROWS, _COLS)

    def base(i, acc, x):
        return acc + (x + i.astype(jnp.float32))

    def exp_n(n):
        def body(i, acc, x):
            t = x + i.astype(jnp.float32)
            for _ in range(n):
                t = jnp.exp2(-t)
            return acc + t
        return body

    elems_per_step = _ROWS * _COLS * _REPS
    t_base = _slope_time(base, x0)
    t_e1 = _slope_time(exp_n(1), x0)
    t_e3 = _slope_time(exp_n(3), x0)
    alu_rate = 2 * elems_per_step / t_base
    exp2_rate = 2 * elems_per_step / max(t_e3 - t_e1, 1e-12)
    free_first = (t_e1 - t_base) / t_base  # ~0: first exp2 overlaps
    return alu_rate, exp2_rate, free_first


def mxu_rate(device_kind: str, k: int) -> float:
    """Datasheet bf16 peak derated by K-tile fill — optimistic floor rate
    (see module docstring for why this is not measured)."""
    peak = _PEAK_BF16_TFLOPS.get(device_kind, 197.0) * 1e12
    return peak * min(k, 128) / 128.0


# --------------------------------------------------------------------------
# 2. op counts from the flat-kernel structure (ops/psi_pallas.py, +-30%)
# --------------------------------------------------------------------------

def op_counts(n: int, m: int, q: int, d: int):
    """Structural per-cell counts for the flat-basis kernels. A 'cell' is
    one (data point, staircase slab element): cells/point = 128 * S,
    S = sum_b (Ml - 128 b). Hand-counted from _fwd_flat_body /
    _bwd_flat_body; bf16 ops weighted 0.5 (packed 2/cycle).

    fwd per cell: exp2(lp) [exp2 pipe]; ALU: tn-reduction add (1) + lhs3
    build amortized over slab columns (~4*kx/w_avg ~ 0.7); MXU: basis dot
    2*(3kx) + psi2 N-contraction 2.
    bwd per cell: exp2 (recompute); ALU: g mult (1) + G-split round (1) +
    sub (1) + two bf16 casts (1) + mirror transpose ~1 on off-diag cells +
    fuse/epilogue ~0.5; MXU: slab recompute 2*(3kx) + H dots 2*(2kx+kx) +
    mirror H dots 2*(2kx+kx) on off-diag cells."""
    from gparml_tpu.ops import psi_pallas as pp

    _, ml = pp._m_dims(m)
    nb = ml // 128
    s_cols = nb * ml - 128 * (nb * (nb - 1)) // 2     # staircase column area
    cells = 128 * s_cols                              # slab cells per point
    kx = 3 * q + 2
    k3 = 3 * kx                                       # bf16 rung depth
    mirror_cells = cells - 128 * ml                   # off-diagonal cells

    fwd = {
        "exp2": n * (cells + ml),                     # slab + Psi1 row
        "alu": n * (1.7 * cells + 8 * ml),
        "mxu_flops": (2 * k3 + 2) * n * cells + 2 * n * ml * d,
        # qn layout: mu,s (Q,N) + y (D,N) f32 read once
        "hbm_bytes": 4 * n * (2 * q + d),
    }
    bwd = {
        "exp2": n * (cells + ml),
        "alu": n * (4.0 * cells + 1.0 * mirror_cells + 16 * ml),
        "mxu_flops": (
            2 * k3 * n * cells                        # slab recompute
            + 2 * (3 * kx) * n * cells                # hx2 (2kx) + hx1 (kx)
            + 2 * (3 * kx) * n * mirror_cells         # mirror contractions
            + 6 * n * ml * d                          # dyw/dlq matmuls
        ),
        # reads again + writes dmu, ds, dyw
        "hbm_bytes": 4 * n * (2 * q + d) * 2,
    }
    return fwd, bwd, {"ml": ml, "cells_per_n": cells, "kx": kx, "k3": k3}


def floors(counts, alu_rate, exp2_rate, mxu, hbm_bps):
    pipes = {
        "alu_s": counts["alu"] / alu_rate,
        "exp2_s": counts["exp2"] / exp2_rate,
        "mxu_s": counts["mxu_flops"] / mxu,
        "hbm_s": counts["hbm_bytes"] / hbm_bps,
    }
    out = {k: round(v, 4) for k, v in pipes.items()}
    out["floor_overlap_s"] = round(max(pipes.values()), 4)
    out["floor_serial_s"] = round(sum(pipes.values()), 4)
    return out


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

    # y and w ride as jit ARGUMENTS, never closure constants: an O(N)
    # constant would ship inside the compile payload and hit the tunnel's
    # /remote_compile size limit at large N (the round-5 root cause —
    # psi_pallas calibration block; 480 MB at n=1e7/d=12).
    @jax.jit
    def fwd(mu, s, y, w, sf2):
        return kernel(mu, s, z, sf2, alpha, y, w, 64, False)

    def loss(mu, s, y, w, sf2):
        p1y, p2 = kernel(mu, s, z, sf2, alpha, y, w, 64, False)
        return jnp.sum(p1y * wy) * 1e-3 + jnp.sum(p2) * 1e-6

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 4)))

    # sf2 perturbed per rep: the tunnel dedupes identical dispatches
    psf2 = lambda a, i: a[:4] + (jnp.float32(1.3 + 1e-3 * (i + 1)),)
    t_fwd = _time_best(fwd, (mu, s, y, w, jnp.float32(1.3)), reps=4,
                       perturb=psf2)
    t_vg = _time_best(vg, (mu, s, y, w, jnp.float32(1.3)), reps=4,
                      perturb=psf2)

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

    def pbeta(a, i):
        p, yy = a
        g2 = p.glob._replace(u_beta=p.glob.u_beta + np.float32((i + 1) * 1e-3))
        return (p._replace(glob=g2), yy)

    t_full = _time_best(full, (params, y), reps=4, perturb=pbeta)
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

    dev = jax.devices()[0]
    rtt = measure_rtt()
    alu_rate, exp2_rate, free_first = measure_vpu_rates()
    fwd_c, bwd_c, meta = op_counts(a.n, a.m, a.q, a.d)
    mxu = mxu_rate(dev.device_kind, meta["k3"])
    hbm_bps = _HBM_GBPS.get(dev.device_kind, 819.0) * 1e9

    t_fwd_raw, t_vg_raw, t_full_raw = stage_times(a.n, a.m, a.q, a.d, a.layout)
    t_fwd = max(t_fwd_raw - rtt, 1e-9)   # one dispatch: subtract RTT once
    t_bwd = t_vg_raw - t_fwd_raw         # difference of dispatches: RTT cancels
    t_asm = t_full_raw - t_vg_raw

    f_fwd = floors(fwd_c, alu_rate, exp2_rate, mxu, hbm_bps)
    # backward's H/mirror dots contract at K=w_cols>=128 (full fill); only
    # the slab recompute runs at k3 fill. Weight the two matmul classes.
    slab_flops = 2 * meta["k3"] * a.n * meta["cells_per_n"]
    h_flops = bwd_c["mxu_flops"] - slab_flops
    mxu_full = mxu_rate(dev.device_kind, 128)
    t_mxu_bwd = slab_flops / mxu + h_flops / mxu_full
    f_bwd = floors(bwd_c, alu_rate, exp2_rate, mxu, hbm_bps)
    f_bwd["mxu_s"] = round(t_mxu_bwd, 4)
    f_bwd["floor_overlap_s"] = round(
        max(t_mxu_bwd, bwd_c["alu"] / alu_rate,
            bwd_c["exp2"] / exp2_rate, bwd_c["hbm_bytes"] / hbm_bps), 4)
    f_bwd["floor_serial_s"] = round(
        t_mxu_bwd + bwd_c["alu"] / alu_rate
        + bwd_c["exp2"] / exp2_rate + bwd_c["hbm_bytes"] / hbm_bps, 4)

    print(json.dumps({
        "shape": {"n": a.n, "m": a.m, "q": a.q, "d": a.d,
                  "layout": a.layout, **meta},
        "device": dev.device_kind,
        "rates": {
            "tunnel_rtt_ms": round(rtt * 1e3, 1),
            "alu_instr_per_s": f"{alu_rate:.3e}",
            "exp2_marginal_per_s": f"{exp2_rate:.3e}",
            "first_exp2_extra_frac": round(free_first, 3),
            f"mxu_flops_per_s_k{meta['k3']}_datasheet": f"{mxu:.3e}",
            "hbm_bytes_per_s_datasheet": f"{hbm_bps:.3e}",
        },
        "measured_s": {
            "psi_fwd": round(t_fwd, 4),
            "psi_bwd": round(t_bwd, 4),
            "psi_fwd_bwd": round(t_fwd + t_bwd, 4),
            "bound_assembly": round(t_asm, 4),
            "full_bound_grad": round(t_full_raw - rtt, 4),
        },
        "floor_fwd": f_fwd,
        "floor_bwd": f_bwd,
        "ratio_to_floor": {
            "fwd_vs_overlap": round(t_fwd / f_fwd["floor_overlap_s"], 2),
            "fwd_vs_serial": round(t_fwd / f_fwd["floor_serial_s"], 2),
            "bwd_vs_overlap": round(t_bwd / f_bwd["floor_overlap_s"], 2),
            "bwd_vs_serial": round(t_bwd / f_bwd["floor_serial_s"], 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
