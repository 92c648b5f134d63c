"""Fused Pallas TPU kernel for the psi-statistic sufficient statistics.

THE hot loop of the whole framework (SURVEY.md §3.1: "psi-statistics inside
each mapper — O(n_p·M²·Q) for Psi2 dominates"; reference: GParML
``partial_terms.py`` psi code + its hand-coded derivatives). The pure-JAX
path (``psi.py``) materializes (block, M, M) Psi2 intermediates in HBM per
scan step; this kernel streams N-tiles through VMEM and keeps the (M, M) and
(M, D) accumulators on-chip, so HBM traffic is just the data itself:

  per grid step (one N-tile):
    * Psi1 tile      — (TN, Q) x (Q, M) matmuls on the MXU, fused exp on VPU
    * Psi1^T(w·Y)    — (M, TN) x (TN, D) MXU accumulation
    * Psi2 tile      — one (TN·M, Q) x (Q, M) MXU matmul builds the
                       n-dependent quadratic form B_n[m,m'] = sum_q c_nq
                       z_mq z_m'q; VPU exponentiates (TN, M, M) in VMEM and
                       reduces onto the (M, M) accumulator.

Backward: a second Pallas kernel whose body applies ``jax.vjp`` of the same
per-tile math (rematerialized in VMEM), producing exact cotangents for
(mu, s, z, sf2, alpha, yw) with zero hand-derived formulas — the TPU-native
replacement for the reference's several hundred lines of hand-written
derivative code.

Padding contract (all exact):
  * Q padded with alpha=0 columns  — a zero precision contributes nothing,
  * M padded with masked rows      — v is driven to -inf so exp() gives 0,
  * N padded with weight-0 rows    — every statistic is weighted by w.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gparml_tpu.ops.precise import _comp_dg, compensated_dot
from gparml_tpu.ops.psi import SufficientStats, kl_qp

_NEG_BIG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_2d(mu, s, z, z2, alpha, log_sf2, logw, neg_pad):
    """2-D per-tile pieces shared by forward and backward:
      lq   (TN, Mp): log Psi1 (incl. log w and the M-padding -inf mask)
      vpp  (TN, Mp): the per-side Psi2 exponent vector (see _tile_stats doc)
      coef (TN, Qp): the per-point quadratic-form coefficients (alpha - c2)/2
    ``alpha`` may be (1, Qp) (forward) or (TN, Qp) (backward: full-rank leaf
    so its cotangent avoids a transpose-of-broadcast Mosaic can't lower).
    """
    den1 = alpha * s + 1.0                                        # (TN, Qp)
    c1 = alpha / den1
    logn1 = (
        log_sf2
        - 0.5 * jnp.sum(jnp.log(den1), axis=1, keepdims=True)
        - 0.5 * jnp.sum(c1 * mu * mu, axis=1, keepdims=True)
        + logw
    )                                                             # (TN, 1)
    quad = compensated_dot(c1 * mu, z) - 0.5 * compensated_dot(c1, z2)
    lq = logn1 + quad + neg_pad                                   # (TN, Mp)

    den2 = 2.0 * alpha * s + 1.0
    c2 = alpha / den2                                             # (TN, Qp)
    log_const = (
        2.0 * log_sf2
        - 0.5 * jnp.sum(jnp.log(den2), axis=1, keepdims=True)
        - jnp.sum(c2 * mu * mu, axis=1, keepdims=True)
    )                                                             # (TN, 1)
    r = compensated_dot(alpha, z2)                                # sum_q a z^2
    vpp = (
        compensated_dot(c2 * mu, z)
        - 0.25 * compensated_dot(c2, z2)
        - 0.25 * r
        + 0.5 * log_const
        + 0.5 * logw
        + neg_pad
    )                                                             # (TN, Mp)
    coef = 0.5 * (alpha - c2)                                     # (TN, Qp) >= 0
    return lq, vpp, coef


def _mask_and_logw(mu, w, mp, m_real):
    neg_pad = (
        jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1) >= m_real
    ).astype(mu.dtype) * _NEG_BIG                                 # (1, Mp)
    logw = jnp.log(w)                                             # (TN, 1); -inf at w=0
    return neg_pad, logw


def _tile_stats(mu, s, yw, w, z, z2, alpha, log_sf2, m_real: int):
    """Pure-jnp per-tile statistics. Shapes:
      mu, s: (TN, Qp); yw: (TN, D); w: (TN, 1); z, z2: (Mp, Qp);
      alpha: (1, Qp); log_sf2: (1, 1).
    Returns (psi1y (Mp, D), psi2 (Mp, Mp)).

    The Psi2 exponent is fully folded so the (TN, Mp, Mp) elementwise chain is
    just two broadcast adds + exp + reduce:

      log Psi2[n,m,m'] = Bt_n[m,m'] + vpp_n[m] + vpp_n[m']
      Bt_n[m,m'] = sum_q coef_nq z_mq z_m'q,   coef = (alpha - c2)/2
                   (the E0 cross term merged into the per-n MXU matmul)
      vpp_n[m]   = -1/4 sum_q c2 z^2 + sum_q c2 mu z     (v)
                   - 1/4 sum_q alpha z^2                  (E0 row term r_m)
                   + 1/2 log_const_n + 1/2 log w_n        (split across sides)
                   + (-inf beyond m_real)                 (M-padding mask)

    log(w) also zeroes weight-0 (N-padding) rows exactly, and makes the whole
    Psi1/Psi2 masking free — no separate mask multiplies.
    """
    f32 = jnp.float32
    tn, qp = mu.shape
    mp = z.shape[0]
    neg_pad, logw = _mask_and_logw(mu, w, mp, m_real)
    lq, vpp, coef = _tile_2d(mu, s, z, z2, alpha, log_sf2, logw, neg_pad)

    psi1 = jnp.exp(lq)                                            # (TN, Mp)
    psi1y = jax.lax.dot_general(
        psi1, yw, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                             # (Mp, D)

    zc = (z[None, :, :] * coef[:, None, :]).reshape(tn * mp, qp)  # (TN*Mp, Qp)
    bt = compensated_dot(zc, z).reshape(tn, mp, mp)
    lp = bt + vpp[:, :, None] + vpp[:, None, :]
    psi2 = jnp.sum(jnp.exp(lp), axis=0)                           # (Mp, Mp)
    return psi1y, psi2


def _fwd_kernel(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                alpha_ref, logsf2_ref, p1y_ref, p2_ref, *, m_real: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        p1y_ref[:] = jnp.zeros_like(p1y_ref)
        p2_ref[:] = jnp.zeros_like(p2_ref)

    p1y, p2 = _tile_stats(
        mu_ref[:], s_ref[:], yw_ref[:], w_ref[:], z_ref[:], z2_ref[:],
        alpha_ref[:], logsf2_ref[:], m_real,
    )
    p1y_ref[:] += p1y
    p2_ref[:] += p2


def _bwd_kernel(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                alpha_ref, logsf2_ref, dp1y_ref, dp2s_ref, zhiT_ref, zloT_ref,
                dmu_ref, ds_ref, dyw_ref, dz_ref, dzt_ref, dalpha_ref,
                dlogsf2_ref, *, m_real: int, split_h: bool = True):
    """Hand-fused backward: one pass over the (TN, Mp, Mp) tensor.

    With E_n = exp(lp_n) (symmetric) and dp2s the SYMMETRIZED Psi2 cotangent
    (valid: Psi2 is symmetric, so only the symmetric part of its cotangent
    contributes), let G_n = E_n * dp2s (symmetric). Exactly:

      d vpp_n[m]  = 2 sum_m' G_n[m, m']              (ones column of H)
      d coef_nq   = sum_{m,m'} G_n[m,m'] z_mq z_m'q  = sum_m z[m,q] H_n[m,q]
      d z[m,q]   += 2 sum_n coef_nq H_n[m,q]         (direct bt path)
      with H_n = G_n @ [z, 1].

    H uses a 2-term compensated product ([G_hi|G_lo] against [zext_hi block;
    zext_lo block]) — only the G_lo*z_lo term (~4e-6 relative) is dropped, at
    one-third the MXU passes of HIGHEST. All 2-D chains (lq, vpp, coef and
    their dependence on mu, s, z, alpha, log sf2) go through jax.vjp of
    _tile_2d — no hand-derived chain rules beyond the identities above.
    """
    f32 = jnp.float32
    tn, qp = mu_ref.shape
    mp = z_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dz_ref[:] = jnp.zeros_like(dz_ref)
        dzt_ref[:] = jnp.zeros_like(dzt_ref)
        dalpha_ref[:] = jnp.zeros_like(dalpha_ref)
        dlogsf2_ref[:] = jnp.zeros_like(dlogsf2_ref)

    neg_pad, logw = _mask_and_logw(mu_ref[:], w_ref[:], mp, m_real)
    alphab = jnp.broadcast_to(alpha_ref[:], (tn, qp))

    def small_fn(mu, s, z, alphab, logsf2):
        return _tile_2d(mu, s, z, z * z, alphab, logsf2, logw, neg_pad)

    (lq, vpp, coef), vjp2 = jax.vjp(
        small_fn, mu_ref[:], s_ref[:], z_ref[:], alphab, logsf2_ref[:]
    )

    # ---- Psi1 path ----
    psi1 = jnp.exp(lq)
    dpsi1 = _comp_dg(yw_ref[:], dp1y_ref[:], 1, 1)       # (TN, Mp)
    dlq = dpsi1 * psi1
    dyw_ref[:] = _comp_dg(psi1, dp1y_ref[:], 1, 0)       # (TN, D)

    # ---- Psi2 3-D path ----
    z = z_ref[:]
    zc = (z[None, :, :] * coef[:, None, :]).reshape(tn * mp, qp)
    bt = compensated_dot(zc, z).reshape(tn, mp, mp)
    e = jnp.exp(bt + vpp[:, :, None] + vpp[:, None, :])
    g2 = (e * dp2s_ref[:][None, :, :]).reshape(tn * mp, mp)

    # H^T[k, n*m] = sum_m' zext[m',k] G[n*m, m'], in the lane-friendly
    # transposed orientation (output rows = Q+1, lanes = TN*Mp; K = Mp fills
    # the MXU). 2-term compensation as three DEFAULT dots over EXPLICIT bf16
    # hi/lo splits (backend-independent): only z_lo@G_lo (~(0.4%)^2 of G) is
    # dropped — negligible in a gradient.
    kk = qp + 1
    if split_h:
        g_hi = g2.astype(jnp.bfloat16).astype(f32)
        g_lo = g2 - g_hi
        hxt = (
            jax.lax.dot_general(zhiT_ref[:], g_hi, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
            + jax.lax.dot_general(zloT_ref[:], g_hi, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
            + jax.lax.dot_general(zhiT_ref[:], g_lo, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        )                                                         # (Qp+1, TN*Mp)
    else:
        # low-VMEM variant for large M: no g_hi/g_lo buffers, one HIGHEST dot
        zext_t = zhiT_ref[:] + zloT_ref[:]
        hxt = jax.lax.dot_general(
            zext_t, g2, (((1,), (1,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
    h3 = hxt.reshape(kk, tn, mp)

    dvpp = 2.0 * h3[qp]                                           # (TN, Mp)
    dcoef = jnp.concatenate(
        [
            jax.lax.dot_general(h3[qi], z[:, qi : qi + 1], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST)
            for qi in range(qp)
        ],
        axis=1,
    )                                                             # (TN, Qp)
    dzt_ref[:] += jnp.concatenate(
        [
            2.0 * jnp.sum(coef[:, qi : qi + 1] * h3[qi], axis=0, keepdims=True)
            for qi in range(qp)
        ],
        axis=0,
    )                                                             # (Qp, Mp)

    # ---- 2-D chains ----
    dmu, ds, dz2d, dalphab, dlogsf2 = vjp2((dlq, dvpp, dcoef))
    dmu_ref[:] = dmu
    ds_ref[:] = ds
    dz_ref[:] += dz2d
    dalpha_ref[:] += jnp.sum(dalphab, axis=0, keepdims=True)
    dlogsf2_ref[:] += dlogsf2


def _pad_inputs(mu, s, yw, w, z, tile):
    """Apply the exact padding contract; returns padded arrays + dims."""
    n, q = mu.shape
    m = z.shape[0]
    npad = _round_up(n, tile)
    # Qp: lane-dim efficiency is irrelevant for (TN, Q) ops; pad to >= 1 only.
    qp = q
    mp = _round_up(max(m, 128), 128)

    if npad != n:
        ones = jnp.ones((npad - n, q), mu.dtype)
        mu = jnp.concatenate([mu, ones], 0)
        s = jnp.concatenate([s, ones], 0)
        yw = jnp.concatenate([yw, jnp.zeros((npad - n, yw.shape[1]), yw.dtype)], 0)
        w = jnp.concatenate([w, jnp.zeros((npad - n,), w.dtype)], 0)
    if mp != m:
        z = jnp.concatenate([z, jnp.zeros((mp - m, z.shape[1]), z.dtype)], 0)
    return mu, s, yw, w, z, npad, qp, mp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def psi_fused(mu, s, z, sf2, alpha, yw, w_arr, tile: int = 16,
              interpret: bool = False):
    """Fused (Psi1^T(w·Y), sum_n w_n Psi2_n) via the Pallas kernel.

    Args mirror psi.py; ``yw`` is Y (weights are applied in-kernel via
    ``w_arr``). Returns (psi1y (M, D), psi2 (M, M)). Differentiable wrt
    (mu, s, z, sf2, alpha, yw) through a Pallas backward kernel.
    """
    out, _ = _psi_fused_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret)
    return out


def _fit_tile(tile: int, mp: int, budget_elems: int) -> int:
    """Cap the N-tile so the (TN, Mp, Mp) VMEM working set stays on-chip for
    any M (the 16MB VMEM that fits TN=32 at Mp=256 only fits TN=8 at 512)."""
    return max(2, min(tile, budget_elems // (mp * mp)))


def _call_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret):
    d = yw.shape[1]
    m = z.shape[0]
    dtype = mu.dtype
    mp_probe = _round_up(max(m, 128), 128)
    tile = _fit_tile(tile, mp_probe, 32 * 256 * 256)
    mu_p, s_p, yw_p, w_p, z_p, npad, qp, mp = _pad_inputs(mu, s, yw, w_arr, z, tile)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    grid = npad // tile

    kernel = functools.partial(_fwd_kernel, m_real=m)
    p1y, p2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # mu
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # s
            pl.BlockSpec((tile, d), lambda i: (i, 0)),         # yw
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),         # w
            pl.BlockSpec((mp, qp), lambda i: (0, 0)),          # z
            pl.BlockSpec((mp, qp), lambda i: (0, 0)),          # z2
            pl.BlockSpec((1, qp), lambda i: (0, 0)),           # alpha
            pl.BlockSpec((1, 1), lambda i: (0, 0)),            # log sf2
        ],
        out_specs=[
            pl.BlockSpec((mp, d), lambda i: (0, 0)),
            pl.BlockSpec((mp, mp), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), dtype),
            jax.ShapeDtypeStruct((mp, mp), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(-1, 1), z_p, z2_p, alpha_row, logsf2)
    return p1y[:m], p2[:m, :m]


def _psi_fused_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret):
    out = _call_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret)
    return out, (mu, s, z, sf2, alpha, yw, w_arr)


def _psi_fused_bwd(tile, interpret, res, cots):
    mu, s, z, sf2, alpha, yw, w_arr = res
    dp1y, dp2 = cots
    d = yw.shape[1]
    m = z.shape[0]
    dtype = mu.dtype
    n = mu.shape[0]
    q = mu.shape[1]

    # The hand-fused backward keeps ~3 (TN, Mp, Mp) buffers live (bt, E, G);
    # tile 8 fits the 16MB VMEM at Mp=256 with headroom.
    tile = 8

    mu_p, s_p, yw_p, w_p, z_p, npad, qp, mp = _pad_inputs(mu, s, yw, w_arr, z, tile)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    dp1y_p = jnp.zeros((mp, d), dtype).at[:m].set(dp1y)
    # Psi2 is symmetric, so only the symmetric part of its cotangent acts;
    # the fused backward exploits G = E * dp2s being symmetric.
    dp2s = 0.5 * (dp2 + dp2.T)
    dp2_p = jnp.zeros((mp, mp), dtype).at[:m, :m].set(dp2s)
    grid = npad // tile

    kk = qp + 1
    zext = jnp.concatenate([z_p, jnp.ones((mp, 1), dtype)], axis=1)
    zext_hi = zext.astype(jnp.bfloat16).astype(dtype)
    zhi_t = zext_hi.T                                     # (Qp+1, Mp)
    zlo_t = (zext - zext_hi).T

    kernel = functools.partial(_bwd_kernel, m_real=m, split_h=(mp <= 256))
    dmu, ds, dyw, dz, dzt, dalpha, dlogsf2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((mp, qp), lambda i: (0, 0)),
            pl.BlockSpec((mp, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((mp, d), lambda i: (0, 0)),           # dp1y
            pl.BlockSpec((mp, mp), lambda i: (0, 0)),          # dp2s
            pl.BlockSpec((kk, mp), lambda i: (0, 0)),          # zext_hi^T
            pl.BlockSpec((kk, mp), lambda i: (0, 0)),          # zext_lo^T
        ],
        out_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # dmu
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # ds
            pl.BlockSpec((tile, d), lambda i: (i, 0)),         # dyw
            pl.BlockSpec((mp, qp), lambda i: (0, 0)),          # dz (2-D chains) acc
            pl.BlockSpec((qp, mp), lambda i: (0, 0)),          # dz (direct, transposed) acc
            pl.BlockSpec((1, qp), lambda i: (0, 0)),           # dalpha acc
            pl.BlockSpec((1, 1), lambda i: (0, 0)),            # dlogsf2 acc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, qp), dtype),
            jax.ShapeDtypeStruct((npad, qp), dtype),
            jax.ShapeDtypeStruct((npad, d), dtype),
            jax.ShapeDtypeStruct((mp, qp), dtype),
            jax.ShapeDtypeStruct((qp, mp), dtype),
            jax.ShapeDtypeStruct((1, qp), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(-1, 1), z_p, z2_p, alpha_row, logsf2,
      dp1y_p, dp2_p, zhi_t, zlo_t)

    # sf2 entered the kernel as log(sf2); chain that scalar transform here.
    dmu = dmu[:n]
    ds = ds[:n]
    dyw = dyw[:n]
    dz_total = dz[:m] + dzt.T[:m]
    dalpha_total = dalpha.reshape(qp).astype(alpha.dtype)
    dsf2 = (dlogsf2[0, 0] / sf2).astype(jnp.asarray(sf2).dtype)
    dw = jnp.zeros_like(w_arr)  # weights treated as non-differentiable data
    return dmu, ds, dz_total, dsf2, dalpha_total, dyw, dw


psi_fused.defvjp(_psi_fused_fwd, _psi_fused_bwd)


def suff_stats(
    y, mu, s, z, sf2, alpha,
    weights=None, tile: int = 16, interpret: bool = None,
) -> SufficientStats:
    """Drop-in replacement for psi.suff_stats (GPLVM path) using the fused
    Pallas kernel for the two heavy statistics; psi0/yy/KL are cheap
    elementwise sums left to XLA."""
    if s is None:
        raise ValueError(
            "SGPR (s=None) statistics are plain MXU matmuls; use psi.suff_stats"
        )
    if interpret is None:
        # Mosaic kernels only compile for TPU; interpret elsewhere (CPU tests).
        interpret = jax.default_backend() != "tpu"
    n = y.shape[0]
    w = jnp.ones((n,), y.dtype) if weights is None else weights
    n_f = jnp.sum(w)
    yy = jnp.sum((y * y) * w[:, None])
    psi0 = n_f * sf2
    kl = kl_qp(mu, s, weights)
    p1y, p2 = psi_fused(mu, s, z, sf2, alpha, y, w, tile, interpret)
    return SufficientStats(psi0, p1y, p2, yy, kl, n_f)
