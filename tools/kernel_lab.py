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
                elif mode == "novr":
                    pre = bt_c + vpp_cl_expand(vpp, c0, lc)
                elif mode == "novc":
                    pre = bt_c + vpp_s[:, :, None]
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
            elif mode in ("default", "noexp", "nomul", "nobt", "noadds",
                          "novr", "novc"):
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


def make_fwd_stair(fold_vr: bool = False):
    """Staircase forward: one op per 128-row slab covering columns from the
    diagonal onward (2 dispatches at Ml=256 vs 3 triangle blocks), same cell
    count as the triangle, accumulated into p2_ref row-slab slices.
    fold_vr: ride the row-side vpp through the MXU as an extra K-column
    (saves one broadcast-add pass over the big tensor)."""

    def kernel(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
               alpha_ref, logsf2_ref, p1y_ref, p2_ref, *, m_real: int,
               tri: bool):
        f32 = jnp.float32

        @pl.when(pl.program_id(0) == 0)
        def _():
            p1y_ref[:] = jnp.zeros_like(p1y_ref)
            p2_ref[:] = jnp.zeros_like(p2_ref)

        ms = p2_ref.shape[0]
        if not tri:
            p1y, p2 = pp._tile_stats(
                mu_ref[:], s_ref[:], yw_ref[:], w_ref[:], z_ref[:], z2_ref[:],
                alpha_ref[:], logsf2_ref[:], m_real, ms,
            )
            p1y_ref[:] += p1y
            p2_ref[:] += p2
            return

        tn, qp = mu_ref.shape
        ml = z_ref.shape[0]
        neg_pad, logw = pp._mask_and_logw(mu_ref[:], w_ref[:], ml, m_real)
        lq, vpp, coef = pp._tile_2d(
            mu_ref[:], s_ref[:], z_ref[:], z2_ref[:], alpha_ref[:],
            logsf2_ref[:], logw, neg_pad,
        )
        psi1 = jnp.exp2(lq)
        p1y_ref[:] += jax.lax.dot_general(
            psi1, yw_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

        z = z_ref[:]
        bl = 128
        for r0 in range(0, ms, bl):
            r1 = min(ms, r0 + bl)
            rb = r1 - r0
            w_cols = ml - r0
            zr = jax.lax.slice_in_dim(z, r0, r1, axis=0)
            zc3 = zr[None, :, :] * coef[:, None, :]            # (tn, rb, qp)
            zcols = jax.lax.slice_in_dim(z, r0, ml, axis=0)
            vpp_r = jax.lax.slice_in_dim(vpp, r0, r1, axis=1)
            vpp_c = jax.lax.slice_in_dim(vpp, r0, ml, axis=1)
            if fold_vr:
                zc_i = jnp.concatenate(
                    [zc3, vpp_r[:, :, None]], axis=2
                ).reshape(tn * rb, qp + 1)
                zcols_ext = jnp.concatenate(
                    [zcols, jnp.ones((w_cols, 1), f32)], axis=1
                )
                bt = compensated_dot(zc_i, zcols_ext).reshape(tn, rb, w_cols)
                lp = bt + vpp_c[:, None, :]
            else:
                zc_i = zc3.reshape(tn * rb, qp)
                bt = compensated_dot(zc_i, zcols).reshape(tn, rb, w_cols)
                lp = bt + vpp_r[:, :, None] + vpp_c[:, None, :]
            p2_ref[r0:r1, r0:ml] += jnp.sum(jnp.exp2(lp), axis=0)

    return kernel


def make_fwd_tri_acc():
    """Triangle forward, but block results accumulate into a VALUE-level
    (Ms, Ml) accumulator (dynamic_update_slice adds) with ONE p2_ref RMW at
    the end — isolates whether per-block ref-slice RMWs are the triangle
    forward's inefficiency."""

    def kernel(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
               alpha_ref, logsf2_ref, p1y_ref, p2_ref, *, m_real: int,
               tri: bool):
        f32 = jnp.float32

        @pl.when(pl.program_id(0) == 0)
        def _():
            p1y_ref[:] = jnp.zeros_like(p1y_ref)
            p2_ref[:] = jnp.zeros_like(p2_ref)

        ms = p2_ref.shape[0]
        if not tri:
            p1y, p2 = pp._tile_stats(
                mu_ref[:], s_ref[:], yw_ref[:], w_ref[:], z_ref[:], z2_ref[:],
                alpha_ref[:], logsf2_ref[:], m_real, ms,
            )
            p1y_ref[:] += p1y
            p2_ref[:] += p2
            return

        tn, qp = mu_ref.shape
        ml = z_ref.shape[0]
        neg_pad, logw = pp._mask_and_logw(mu_ref[:], w_ref[:], ml, m_real)
        lq, vpp, coef = pp._tile_2d(
            mu_ref[:], s_ref[:], z_ref[:], z2_ref[:], alpha_ref[:],
            logsf2_ref[:], logw, neg_pad,
        )
        psi1 = jnp.exp2(lq)
        p1y_ref[:] += jax.lax.dot_general(
            psi1, yw_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

        z = z_ref[:]
        acc = jnp.zeros((ms, ml), f32)
        last_r0 = -1
        zc_b = vpp_rs = None
        for r0, r1, c0 in pp._tri_blocks(ms, ml):
            rb = r1 - r0
            if r0 != last_r0:
                zr = jax.lax.slice_in_dim(z, r0, r1, axis=0)
                zc_b = (zr[None, :, :] * coef[:, None, :]).reshape(tn * rb, qp)
                vpp_rs = jax.lax.slice_in_dim(vpp, r0, r1, axis=1)
                last_r0 = r0
            zcl = jax.lax.slice_in_dim(z, c0, c0 + pp._TRI_BL, axis=0)
            bt_b = compensated_dot(zc_b, zcl).reshape(tn, rb, pp._TRI_BL)
            vpp_cl = jax.lax.slice_in_dim(vpp, c0, c0 + pp._TRI_BL, axis=1)
            lp_b = bt_b + vpp_rs[:, :, None] + vpp_cl[:, None, :]
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(acc, (r0, c0), (rb, pp._TRI_BL))
                + jnp.sum(jnp.exp2(lp_b), axis=0),
                (r0, c0),
            )
        p2_ref[:] += acc

    return kernel


def make_bwd_stair(tr_dtype: str, fold_vr: bool = False):
    """Staircase-triangle backward: per 128-row slab, compute G only for
    columns >= the slab start; the mirror contribution for the off-diagonal
    part comes from an in-kernel minor-2D transpose of the same G slab
    (G is symmetric: G[n,c,r] = G[n,r,c]). tr_dtype: 'f32' transposes the
    f32 slab then re-splits; 'bf16' transposes the bf16 hi/lo halves.
    fold_vr: row-side vpp rides the MXU as an extra K-column."""

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
        zl3 = zhilo_ref[:]                                 # (2kk, Ml) bf16
        dn = (((1,), (1,)), ((), ()))
        bl = 128
        hrows = []
        hmir = jnp.zeros((kk, tn, ms), f32)
        for r0 in range(0, ms, bl):
            r1 = r0 + bl
            w_cols = ml - r0
            zr = jax.lax.slice_in_dim(z, r0, r1, axis=0)
            zc3 = zr[None, :, :] * coef[:, None, :]
            zcols = jax.lax.slice_in_dim(z, r0, ml, axis=0)
            vpp_r = jax.lax.slice_in_dim(vpp, r0, r1, axis=1)
            vpp_c = jax.lax.slice_in_dim(vpp, r0, ml, axis=1)
            if fold_vr:
                zc_i = jnp.concatenate(
                    [zc3, vpp_r[:, :, None]], axis=2
                ).reshape(tn * bl, qp + 1)
                zcols_ext = jnp.concatenate(
                    [zcols, jnp.ones((w_cols, 1), f32)], axis=1
                )
                bt = compensated_dot(zc_i, zcols_ext).reshape(tn, bl, w_cols)
                e = jnp.exp2(bt + vpp_c[:, None, :])
            else:
                zc_i = zc3.reshape(tn * bl, qp)
                bt = compensated_dot(zc_i, zcols).reshape(tn, bl, w_cols)
                e = jnp.exp2(bt + vpp_r[:, :, None] + vpp_c[:, None, :])
            dp2s_b = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(dp2s_ref[:], r0, r1, axis=0),
                r0, ml, axis=1,
            )
            g = e * dp2s_b[None]
            g2 = g.reshape(tn * bl, w_cols)
            g_hi = g2.astype(jnp.bfloat16)
            g_lo = (g2 - _round_bf16(g2)).astype(jnp.bfloat16)
            zl3_c = jax.lax.slice_in_dim(zl3, r0, ml, axis=1)
            hx2 = jax.lax.dot_general(zl3_c, g_hi, dn,
                                      preferred_element_type=f32)
            hx1 = jax.lax.dot_general(zl3_c[:kk], g_lo, dn,
                                      preferred_element_type=f32)
            hrows.append(
                ((hx2[:kk] + hx2[kk:]) + hx1).reshape(kk, tn, bl)
            )
            if r1 < ml:
                wm = ml - r1
                zl3_r = jax.lax.slice_in_dim(zl3, r0, r1, axis=1)
                if tr_dtype == "f32":
                    gm = jax.lax.slice_in_dim(g, r1 - r0, w_cols, axis=2)
                    gmT = jnp.swapaxes(gm, 1, 2).reshape(tn * wm, bl)
                    m_hi = gmT.astype(jnp.bfloat16)
                    m_lo = (gmT - _round_bf16(gmT)).astype(jnp.bfloat16)
                else:  # transpose the bf16 halves directly
                    gh3 = g_hi.reshape(tn, bl, w_cols)
                    gl3 = g_lo.reshape(tn, bl, w_cols)
                    m_hi = jnp.swapaxes(
                        jax.lax.slice_in_dim(gh3, r1 - r0, w_cols, axis=2),
                        1, 2).reshape(tn * wm, bl)
                    m_lo = jnp.swapaxes(
                        jax.lax.slice_in_dim(gl3, r1 - r0, w_cols, axis=2),
                        1, 2).reshape(tn * wm, bl)
                hx2m = jax.lax.dot_general(zl3_r, m_hi, dn,
                                           preferred_element_type=f32)
                hx1m = jax.lax.dot_general(zl3_r[:kk], m_lo, dn,
                                           preferred_element_type=f32)
                hm = ((hx2m[:kk] + hx2m[kk:]) + hx1m).reshape(kk, tn, wm)
                hmir = hmir + jnp.concatenate(
                    [jnp.zeros((kk, tn, ml - wm), f32), hm], axis=2
                )
        h3 = _LN2 * (jnp.concatenate(hrows, axis=2) + hmir)

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


def check_variant(kernel_factory, *factory_args, m=200):
    """CPU interpret-mode gradient comparison: variant vs base kernel on a
    small problem (same ops, different order -> tolerance 1e-3)."""
    jax.config.update("jax_platforms", "cpu")
    n, q, d = 64, 4, 3
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((n, d)), dtype=dtype)
    mu = jnp.asarray(rng.standard_normal((n, q)), dtype=dtype)
    s = jnp.asarray(rng.uniform(0.2, 0.8, (n, q)), dtype=dtype)
    z = jnp.asarray(rng.standard_normal((m, q)), dtype=dtype)
    sf2 = jnp.float32(1.3)
    alpha = jnp.asarray(rng.uniform(0.5, 1.5, (q,)), dtype)
    w = jnp.ones((n,), dtype)

    def grads():
        def f(mu, s, z, sf2, alpha, y):
            p1y, p2 = pp.psi_fused(mu, s, z, sf2, alpha, y, w, 16, True)
            return jnp.sum(p1y * (1 + 0.01 * p1y)) + jnp.sum(p2 * (1.0 + 0.01 * p2))
        return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(mu, s, z, sf2, alpha, y)

    orig = pp._bwd_kernel
    g_ref = grads()
    pp._bwd_kernel = kernel_factory(*factory_args)
    try:
        g_var = grads()
    finally:
        pp._bwd_kernel = orig
    worst = 0.0
    for a, b in zip(g_var, g_ref):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-6)
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        worst = max(worst, float(err))
    return worst


def main():
    variants = sys.argv[1:] or ["base"]
    if variants[0] == "check":
        for name, args in (("stair_f32", ("f32",)), ("stair_bf16", ("bf16",)),
                           ("stair_fold", ("f32", True))):
            for m in (200, 300):
                try:
                    err = check_variant(make_bwd_stair, *args, m=m)
                    print(f"check {name} M={m}: max rel err {err:.2e}",
                          flush=True)
                except Exception as e:
                    print(f"check {name} M={m}: FAILED {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:120]}", flush=True)
        # forward value check for the fold/stair kernel
        jax.config.update("jax_platforms", "cpu")
        orig_fwd = pp._fwd_kernel
        rng = np.random.default_rng(1)
        for m in (200, 300):
            n, q, d = 48, 3, 2
            y = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
            mu = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
            s = jnp.asarray(rng.uniform(0.2, 0.8, (n, q)), jnp.float32)
            z = jnp.asarray(rng.standard_normal((m, q)), jnp.float32)
            alpha = jnp.ones((q,), jnp.float32)
            w = jnp.ones((n,), jnp.float32)
            ref = pp.psi_fused(mu, s, z, jnp.float32(1.0), alpha, y, w, 16, True)
            pp._fwd_kernel = make_fwd_stair(fold_vr=True)
            try:
                got = pp.psi_fused(mu, s, z, jnp.float32(1.0), alpha, y, w,
                                   16, True)
                errs = [float(jnp.max(jnp.abs(a - b))
                              / (jnp.max(jnp.abs(b)) + 1e-9))
                        for a, b in zip(got, ref)]
                print(f"check fwd_stair_fold M={m}: max rel err "
                      f"{max(errs):.2e}", flush=True)
            except Exception as e:
                print(f"check fwd_stair_fold M={m}: FAILED "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:120]}",
                      flush=True)
            finally:
                pp._fwd_kernel = orig_fwd
        return
    n = int(os.environ.get("LAB_N", 1_000_000))
    m = int(os.environ.get("LAB_M", 200))
    tile = int(os.environ.get("LAB_TILE", 32))
    orig_bwd = pp._bwd_kernel
    orig_fwd = pp._fwd_kernel
    orig_bwd_budget = pp._BWD_BUDGET
    orig_fwd_budget = pp._FWD_BUDGET
    orig_tri_bl = pp._TRI_BL
    orig_bucket = pp._bucket_mirror
    orig_fuse = pp._fuse_mirror
    for v in variants:
        pp._bwd_kernel = orig_bwd
        pp._fwd_kernel = orig_fwd
        pp._BWD_BUDGET = orig_bwd_budget
        pp._FWD_BUDGET = orig_fwd_budget
        pp._TRI_BL = orig_tri_bl
        pp._bucket_mirror = orig_bucket
        pp._fuse_mirror = orig_fuse
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
        elif v == "fwd_stair":
            pp._fwd_kernel = make_fwd_stair()
        elif v == "fwd_tri_acc":
            pp._fwd_kernel = make_fwd_tri_acc()
        elif v == "fwd_stair_fold":
            pp._fwd_kernel = make_fwd_stair(fold_vr=True)
        elif v == "bwd_stair_f32":
            pp._bwd_kernel = make_bwd_stair("f32")
        elif v == "bwd_stair_bf16":
            pp._bwd_kernel = make_bwd_stair("bf16")
        elif v == "bwd_stair_fold":
            pp._bwd_kernel = make_bwd_stair("f32", fold_vr=True)
        elif v == "bwd_stair48":
            pp._bwd_kernel = make_bwd_stair("bf16")
            pp._BWD_BUDGET = 48 * 256 * 256
            run_tile = 48
        elif v == "bwd_stair64":
            pp._bwd_kernel = make_bwd_stair("bf16")
            pp._BWD_BUDGET = 64 * 256 * 256
            run_tile = 64
        elif v == "both_stair_fold":
            pp._fwd_kernel = make_fwd_stair(fold_vr=True)
            pp._bwd_kernel = make_bwd_stair("f32", fold_vr=True)
        elif v == "bwd_mirror_padded":
            # round-3 mirror accumulation (A/B for the round-4 bucketing):
            # pad each slab's mirror contribution with zeros and add the
            # full (K, TN, Ml) tensor into one accumulator
            def _bucket_padded(mir, hm, r1, bl=128):
                mir[0].append((hm, r1))

            def _fuse_padded(hrows, mir):
                h = jnp.concatenate(hrows, axis=2)
                ml = h.shape[2]
                for hm, _r1 in mir[0]:
                    wm = hm.shape[2]
                    pad = jnp.zeros(hm.shape[:2] + (ml - wm,), hm.dtype)
                    h = h + jnp.concatenate([pad, hm], axis=2)
                return h

            pp._bucket_mirror = _bucket_padded
            pp._fuse_mirror = _fuse_padded
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
            pp._fwd_kernel = orig_fwd
            pp._BWD_BUDGET = orig_bwd_budget
            pp._FWD_BUDGET = orig_fwd_budget
            pp._TRI_BL = orig_tri_bl
            pp._bucket_mirror = orig_bucket
            pp._fuse_mirror = orig_fuse


if __name__ == "__main__":
    main()
