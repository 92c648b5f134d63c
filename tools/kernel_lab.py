"""Kernel experiment lab: time variant psi backward/forward kernel bodies on
the real TPU by monkeypatching psi_pallas internals. NOT part of the package;
numerics of most variants are intentionally wrong (timing only).

Usage: python tools/kernel_lab.py [variant ...]
Variants: base fwd_square bwd_noexp bwd_nomul bwd_default bwd_highest
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

from gparml_tpu.ops import psi_pallas as pp
from gparml_tpu.ops.precise import compensated_dot, _round_bf16

_LN2 = pp._LN2


def make_bwd_variant(mode: str):
    """A copy of _bwd_kernel with the chunk loop's heavy path altered."""

    def kernel(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
               alpha_ref, logsf2_ref, dp1y_ref, dp2s_ref, zhilo_ref,
               dmu_ref, ds_ref, dyw_ref, dz_ref, dzt_ref, dalpha_ref,
               dlogsf2_ref, *, m_real: int, ms: int, lc: int):
        f32 = jnp.float32
        tn, qp = mu_ref.shape
        ml = z_ref.shape[0]
        kk = qp + 1

        @pl.when(pl.program_id(0) == 0)
        def _():
            dz_ref[:] = jnp.zeros_like(dz_ref)
            dzt_ref[:] = jnp.zeros_like(dzt_ref)
            dalpha_ref[:] = jnp.zeros_like(dalpha_ref)
            dlogsf2_ref[:] = jnp.zeros_like(dlogsf2_ref)

        neg_pad, logw = pp._mask_and_logw(mu_ref[:], w_ref[:], ml, m_real)
        alphab = jnp.broadcast_to(alpha_ref[:], (tn, qp))

        def small_fn(mu, s, z, alphab, logsf2):
            return pp._tile_2d(mu, s, z, z * z, alphab, logsf2, logw, neg_pad)

        (lq, vpp, coef), vjp2 = jax.vjp(
            small_fn, mu_ref[:], s_ref[:], z_ref[:], alphab, logsf2_ref[:]
        )

        psi1 = jnp.exp2(lq)
        dpsi1 = pp._comp_dg(yw_ref[:], dp1y_ref[:], 1, 1)
        dlq = (_LN2 * dpsi1) * psi1
        dyw_ref[:] = pp._comp_dg(psi1, dp1y_ref[:], 1, 0)

        z = z_ref[:]
        zs = z[:ms]
        zc = (zs[None, :, :] * coef[:, None, :]).reshape(tn * ms, qp)
        vpp_s = jax.lax.slice_in_dim(vpp, 0, ms, axis=1)
        zl3 = zhilo_ref[:]
        zext_f32 = zl3[:kk].astype(f32) + zl3[kk:].astype(f32)  # (kk, Ml)
        dn = (((1,), (1,)), ((), ()))
        hxt = jnp.zeros((kk, tn * ms), f32)
        for c0 in range(0, ml, lc):
            zcl = jax.lax.slice_in_dim(z, c0, c0 + lc, axis=0)
            if mode == "nobt":
                pre = vpp_s[:, :, None] + vpp_cl_expand(vpp, c0, lc)
                pre = jnp.broadcast_to(pre, (tn, ms, lc))
            else:
                bt_c = compensated_dot(zc, zcl).reshape(tn, ms, lc)
                if mode == "noadds":
                    pre = bt_c
                else:
                    pre = bt_c + vpp_s[:, :, None] + vpp_cl_expand(vpp, c0, lc)
            if mode == "noexp":
                e_c = pre
            else:
                e_c = jnp.exp2(pre)
            dp2s_c = jax.lax.slice_in_dim(dp2s_ref[:], c0, c0 + lc, axis=1)
            if mode == "nomul":
                g2 = e_c.reshape(tn * ms, lc)
            else:
                g2 = (e_c * dp2s_c[None, :, :]).reshape(tn * ms, lc)
            if mode == "noh":
                hxt = hxt + jnp.broadcast_to(
                    jnp.sum(g2, axis=1).reshape(1, tn * ms), (kk, tn * ms)
                )
            elif mode in ("default", "noexp", "nomul", "nobt", "noadds"):
                hx = jax.lax.dot_general(
                    jax.lax.slice_in_dim(zext_f32, c0, c0 + lc, axis=1), g2,
                    dn, preferred_element_type=f32,
                )
                hxt = hxt + hx
            elif mode == "highest":
                hx = jax.lax.dot_general(
                    jax.lax.slice_in_dim(zext_f32, c0, c0 + lc, axis=1), g2,
                    dn, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                hxt = hxt + hx
            else:  # split (matches base)
                g_hi = g2.astype(jnp.bfloat16)
                g_lo = (g2 - _round_bf16(g2)).astype(jnp.bfloat16)
                zl3_c = jax.lax.slice_in_dim(zl3, c0, c0 + lc, axis=1)
                hx2 = jax.lax.dot_general(zl3_c, g_hi, dn,
                                          preferred_element_type=f32)
                hx1 = jax.lax.dot_general(zl3_c[:kk], g_lo, dn,
                                          preferred_element_type=f32)
                hxt = hxt + (hx2[:kk] + hx2[kk:]) + hx1
        h3 = (_LN2 * hxt).reshape(kk, tn, ms)

        dvpp = 2.0 * h3[qp]
        zst = (
            zl3[:qp, :ms].astype(f32) + zl3[kk:kk + qp, :ms].astype(f32)
        )
        hq = h3[:qp]
        dcoef = jnp.sum(hq * zst[:, None, :], axis=2).T
        dzt_ref[:] += 2.0 * jnp.sum(hq * coef.T[:, :, None], axis=1)

        dmu, ds, dz2d, dalphab, dlogsf2 = vjp2((dlq, dvpp, dcoef))
        dmu_ref[:] = dmu
        ds_ref[:] = ds
        dz_ref[:] += dz2d
        dalpha_ref[:] += jnp.sum(dalphab, axis=0, keepdims=True)
        dlogsf2_ref[:] += dlogsf2

    return kernel


def vpp_cl_expand(vpp, c0, lc):
    return jax.lax.slice_in_dim(vpp, c0, c0 + lc, axis=1)[:, None, :]


def run_shape(n=1_000_000, m=200, q=10, d=12, tile=32, reps=3):
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
        p1y, p2 = pp.psi_fused(mu, s, z, sf2, alpha, y, w, tile, False)
        return jnp.sum(p1y) + jnp.sum(p2)

    @jax.jit
    def fwdbwd(mu, s, z, sf2, alpha, y, w):
        def f(mu, s, z, sf2, alpha, y):
            p1y, p2 = pp.psi_fused(mu, s, z, sf2, alpha, y, w, tile, False)
            return jnp.sum(p1y) + jnp.sum(p2 * (1.0 + 0.01 * p2))
        val, g = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            mu, s, z, sf2, alpha, y
        )
        return val + sum(jnp.sum(x) for x in g)

    def timeit(fn):
        out = fn(mu, s, z, sf2, alpha, y, w)
        float(out)
        times = []
        for i in range(reps):
            zi = z + np.float32((i + 1) * 1e-6)
            t0 = time.perf_counter()
            out = fn(mu, s, zi, sf2, alpha, y, w)
            float(out)
            times.append(time.perf_counter() - t0)
        return min(times)

    return timeit(fwd), timeit(fwdbwd)


def main():
    variants = sys.argv[1:] or ["base"]
    n = int(os.environ.get("LAB_N", 1_000_000))
    m = int(os.environ.get("LAB_M", 200))
    tile = int(os.environ.get("LAB_TILE", 32))
    orig_bwd = pp._bwd_kernel
    orig_bwd_budget = pp._BWD_BUDGET
    orig_fwd_budget = pp._FWD_BUDGET
    orig_tri_bl = pp._TRI_BL
    for v in variants:
        pp._bwd_kernel = orig_bwd
        pp._BWD_BUDGET = orig_bwd_budget
        pp._FWD_BUDGET = orig_fwd_budget
        pp._TRI_BL = orig_tri_bl
        run_tile = tile
        if v == "base":
            pass
        elif v == "bwd_t64":
            pp._BWD_BUDGET = 64 * 256 * 256
            run_tile = 64
        elif v == "bwd_t16":
            run_tile = 16
        elif v == "bwd_t64_lc128":
            pp._BWD_BUDGET = 64 * 256 * 128
            run_tile = 64
        elif v == "fwd_sq":
            pp._TRI_BL = 1 << 30
        elif v == "fwd_sq_t64":
            pp._TRI_BL = 1 << 30
            run_tile = 64
        elif v == "fwd_t64":
            run_tile = 64
        elif v.startswith("bwd_"):
            pp._bwd_kernel = make_bwd_variant(v[4:])
        else:
            print(f"unknown variant {v}")
            continue
        try:
            t_f, t_fb = run_shape(n=n, m=m, tile=run_tile)
            print(f"{v:14s}: fwd {t_f*1e3:7.1f} ms   fwd+bwd {t_fb*1e3:7.1f} ms"
                  f"   bwd {(t_fb-t_f)*1e3:7.1f} ms", flush=True)
        except Exception as e:
            print(f"{v:14s}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            pp._bwd_kernel = orig_bwd
            pp._BWD_BUDGET = orig_bwd_budget
            pp._FWD_BUDGET = orig_fwd_budget
            pp._TRI_BL = orig_tri_bl


if __name__ == "__main__":
    main()
