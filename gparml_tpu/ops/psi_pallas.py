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
    * Psi2 tile      — one (TN·Ms, Q) x (Q, Ml) MXU matmul builds the
                       n-dependent quadratic form B_n[m,m'] = sum_q c_nq
                       z_mq z_m'q; VPU exponentiates (TN, Ms, Ml) in VMEM and
                       reduces onto the (Ms, Ml) accumulator.

The big per-tile tensor is ASYMMETRICALLY padded: the lane (last) dim needs
a multiple of 128 (Ml), but the sublane (second-to-last) dim only needs a
multiple of 8 (Ms) — at M=200 that is (200, 256) instead of (256, 256),
cutting ~22% of all VPU work on padding that exp() would just zero out.

All exponentials run in base 2 (`exp2`): the log-space quantities are
scaled by log2(e) once in the cheap 2-D stage, so the (TN, Ms, Ml) tensor
never pays the exp(x) = exp2(x·log2e) range-conversion multiply.

Backward: a second Pallas kernel whose body applies ``jax.vjp`` of the same
per-tile 2-D math (rematerialized in VMEM), producing exact cotangents for
(mu, s, z, sf2, alpha, yw) with zero hand-derived formulas beyond the three
Psi2 contraction identities — the TPU-native replacement for the
reference's several hundred lines of hand-written derivative code.

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
from jax.experimental.pallas import tpu as pltpu

from gparml_tpu.ops.precise import _comp_dg, _round_bf16, compensated_dot
from gparml_tpu.ops.psi import SufficientStats, kl_qp

_NEG_BIG = -1e30
_LOG2E = 1.4426950408889634  # log2(e): folded into the 2-D stage for exp2
_LN2 = 0.6931471805599453


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _m_dims(m: int) -> tuple[int, int]:
    """(Ms, Ml): sublane-side and lane-side padded M for the big tensors."""
    ml = _round_up(max(m, 128), 128)
    ms = min(_round_up(m, 8), ml)
    return ms, ml


def _tile_2d(mu, s, z, z2, alpha, log_sf2, logw, neg_pad,
             dot=compensated_dot):
    """2-D per-tile pieces shared by forward and backward, in BASE-2 LOG
    UNITS (pre-scaled by log2 e so the big (TN, Ms, Ml) tensors use exp2):
      lq   (TN, Ml): log2 Psi1 (incl. log2 w and the M-padding -inf mask)
      vpp  (TN, Ml): the per-side Psi2 exponent vector (see _tile_stats doc)
      coef (TN, Qp): the per-point quadratic-form coefficients
                     log2e·(alpha - c2)/2 — bt inherits the scale via the MXU
    ``alpha`` may be (1, Qp) (forward) or (TN, Qp) (backward: full-rank leaf
    so its cotangent avoids a transpose-of-broadcast Mosaic can't lower).
    ``log_sf2`` and ``logw`` are natural logs; scaling happens here.
    """
    den1 = alpha * s + 1.0                                        # (TN, Qp)
    c1 = alpha / den1
    logn1 = (
        log_sf2
        - 0.5 * jnp.sum(jnp.log(den1), axis=1, keepdims=True)
        - 0.5 * jnp.sum(c1 * mu * mu, axis=1, keepdims=True)
        + logw
    )                                                             # (TN, 1)
    quad = dot(c1 * mu, z) - 0.5 * dot(c1, z2)
    lq = _LOG2E * (logn1 + quad) + neg_pad                        # (TN, Ml)

    den2 = 2.0 * alpha * s + 1.0
    c2 = alpha / den2                                             # (TN, Qp)
    log_const = (
        2.0 * log_sf2
        - 0.5 * jnp.sum(jnp.log(den2), axis=1, keepdims=True)
        - jnp.sum(c2 * mu * mu, axis=1, keepdims=True)
    )                                                             # (TN, 1)
    r = dot(alpha, z2)                                            # sum_q a z^2
    vpp = (
        _LOG2E
        * (
            dot(c2 * mu, z)
            - 0.25 * dot(c2, z2)
            - 0.25 * r
            + 0.5 * log_const
            + 0.5 * logw
        )
        + neg_pad
    )                                                             # (TN, Ml)
    coef = (0.5 * _LOG2E) * (alpha - c2)                          # (TN, Qp) >= 0
    return lq, vpp, coef


def _mask_and_logw(mu, w, ml, m_real):
    neg_pad = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ml), 1) >= m_real
    ).astype(mu.dtype) * _NEG_BIG                                 # (1, Ml)
    # Clamp log(0) -> -1e30 instead of -inf: vpp rides through a hi/lo-split
    # matmul (the folded bt column), and -inf minus its bf16 half is NaN.
    # w*0 + NEG keeps the clamp constant device-varying like w itself —
    # a bare literal trips shard_map's varying-manual-axes check in the
    # interpret path.
    logw = jnp.maximum(jnp.log(w), w * 0.0 + _NEG_BIG)            # (TN, 1)
    return neg_pad, logw


def _tile_stats(mu, s, yw, w, z, z2, alpha, log_sf2, m_real: int, ms: int):
    """Pure-jnp per-tile statistics. Shapes:
      mu, s: (TN, Qp); yw: (TN, D); w: (TN, 1); z, z2: (Ml, Qp);
      alpha: (1, Qp); log_sf2: (1, 1).
    Returns (psi1y (Ml, D), psi2 (Ms, Ml)).

    The Psi2 exponent is fully folded so the (TN, Ms, Ml) elementwise chain
    is just two broadcast adds + exp2 + reduce:

      log2 Psi2[n,m,m'] = Bt_n[m,m'] + vpp_n[m] + vpp_n[m']
      Bt_n[m,m'] = sum_q coef_nq z_mq z_m'q,   coef = log2e·(alpha - c2)/2
                   (the E0 cross term merged into the per-n MXU matmul)
      vpp_n[m]   = log2e·[ -1/4 sum_q c2 z^2 + sum_q c2 mu z     (v)
                   - 1/4 sum_q alpha z^2                  (E0 row term r_m)
                   + 1/2 log_const_n + 1/2 log w_n ]      (split across sides)
                   + (-inf beyond m_real)                 (M-padding mask)

    log(w) also zeroes weight-0 (N-padding) rows exactly, and makes the whole
    Psi1/Psi2 masking free — no separate mask multiplies.
    """
    f32 = jnp.float32
    tn, qp = mu.shape
    ml = z.shape[0]
    neg_pad, logw = _mask_and_logw(mu, w, ml, m_real)
    lq, vpp, coef = _tile_2d(mu, s, z, z2, alpha, log_sf2, logw, neg_pad)

    psi1 = jnp.exp2(lq)                                           # (TN, Ml)
    psi1y = jax.lax.dot_general(
        psi1, yw, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                             # (Ml, D)

    zs = z[:ms]                                                   # (Ms, Qp)
    zc = (zs[None, :, :] * coef[:, None, :]).reshape(tn * ms, qp)
    bt = compensated_dot(zc, z).reshape(tn, ms, ml)
    # NB: slice and newaxis must stay separate ops — fusing them into one
    # indexing expression routes through a gather Mosaic can't lower.
    # (Folding the sublane-side add into the matmul as an extra K-column was
    # tried and is SLOWER: the (TN, Ms) lane->sublane relayout of vpp costs
    # more than the saved VPU add pass.)
    vpp_s = jax.lax.slice_in_dim(vpp, 0, ms, axis=1)              # (TN, Ms)
    lp = bt + vpp_s[:, :, None] + vpp[:, None, :]
    psi2 = jnp.sum(jnp.exp2(lp), axis=0)                          # (Ms, Ml)
    return psi1y, psi2


_TRI_BL = 128  # lane-block width for the upper-triangle Psi2 forward


def _tri_blocks(ms: int, ml: int):
    """Static (r0, r1, c0) upper-triangle block list: Psi2 is symmetric, so
    only blocks with c0 >= r0 are computed; the caller mirrors the rest on
    the small (Ms, Ml) accumulator. Row blocks clip at Ms."""
    nb = ml // _TRI_BL
    out = []
    for bi in range(nb):
        r0 = bi * _TRI_BL
        r1 = min(ms, (bi + 1) * _TRI_BL)
        if r1 <= r0:
            break
        for bj in range(bi, nb):
            out.append((r0, r1, bj * _TRI_BL))
    return out


def _tile_stats_tri(mu, s, yw, w, z, z2, alpha, log_sf2, m_real: int,
                    ms: int, p2_ref):
    """Triangle-tiled forward body: like _tile_stats but exponentiates only
    the upper-triangle 128-blocks of the symmetric Psi2 (37% less VPU work
    at M=500, 18% at M=200), accumulating straight into ``p2_ref`` slices.
    Returns psi1y only."""
    f32 = jnp.float32
    tn, qp = mu.shape
    ml = z.shape[0]
    neg_pad, logw = _mask_and_logw(mu, w, ml, m_real)
    lq, vpp, coef = _tile_2d(mu, s, z, z2, alpha, log_sf2, logw, neg_pad)

    psi1 = jnp.exp2(lq)
    psi1y = jax.lax.dot_general(
        psi1, yw, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )

    last_r0 = -1
    zc_b = vpp_rs = None
    for r0, r1, c0 in _tri_blocks(ms, ml):
        rb = r1 - r0
        if r0 != last_r0:
            zr = jax.lax.slice_in_dim(z, r0, r1, axis=0)          # (rb, Qp)
            zc_b = (zr[None, :, :] * coef[:, None, :]).reshape(tn * rb, qp)
            vpp_rs = jax.lax.slice_in_dim(vpp, r0, r1, axis=1)    # (TN, rb)
            last_r0 = r0
        zcl = jax.lax.slice_in_dim(z, c0, c0 + _TRI_BL, axis=0)   # (BL, Qp)
        bt_b = compensated_dot(zc_b, zcl).reshape(tn, rb, _TRI_BL)
        vpp_cl = jax.lax.slice_in_dim(vpp, c0, c0 + _TRI_BL, axis=1)
        lp_b = bt_b + vpp_rs[:, :, None] + vpp_cl[:, None, :]
        p2_ref[r0:r1, c0 : c0 + _TRI_BL] += jnp.sum(jnp.exp2(lp_b), axis=0)
    return psi1y


def _fwd_kernel(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                alpha_ref, logsf2_ref, p1y_ref, p2_ref, *, m_real: int,
                tri: bool):
    @pl.when(pl.program_id(0) == 0)
    def _():
        p1y_ref[:] = jnp.zeros_like(p1y_ref)
        p2_ref[:] = jnp.zeros_like(p2_ref)

    ms = p2_ref.shape[0]
    if tri:
        p1y = _tile_stats_tri(
            mu_ref[:], s_ref[:], yw_ref[:], w_ref[:], z_ref[:], z2_ref[:],
            alpha_ref[:], logsf2_ref[:], m_real, ms, p2_ref,
        )
        p1y_ref[:] += p1y
    else:
        p1y, p2 = _tile_stats(
            mu_ref[:], s_ref[:], yw_ref[:], w_ref[:], z_ref[:], z2_ref[:],
            alpha_ref[:], logsf2_ref[:], m_real, ms,
        )
        p1y_ref[:] += p1y
        p2_ref[:] += p2


def _bwd_kernel(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                alpha_ref, logsf2_ref, dp1y_ref, dp2s_ref, zhilo_ref,
                dmu_ref, ds_ref, dyw_ref, dz_ref, dzt_ref, dalpha_ref,
                dlogsf2_ref, *, m_real: int, ms: int, lc: int):
    """Hand-fused backward: one pass over the (TN, Ms, Ml) tensor.

    With E_n = exp(lp_n) (symmetric over the real M×M square) and dp2s the
    SYMMETRIZED Psi2 cotangent (valid: Psi2 is symmetric, so only the
    symmetric part of its cotangent contributes), let G_n = E_n * dp2s
    (symmetric). Exactly (in base-2 log units, hence the ln2 factors):

      d vpp_n[m]  = 2·ln2 sum_m' G_n[m, m']          (ones column of H)
      d coef_nq   = sum_{m,m'} G_n[m,m'] z_mq z_m'q  = sum_m z[m,q] H_n[m,q]
      d z[m,q]   += 2 sum_n coef_nq H_n[m,q]         (direct bt path)
      with H_n = ln2 · G_n @ [z, 1].

    H uses a 2-term compensated product: G is split into bf16 hi/lo halves
    (kept in bf16 — half the MXU read bandwidth), the pre-split bf16
    [z_hi;z_lo] rows contract against G_hi in ONE stacked MXU pass and z_hi
    against G_lo in a second. Only z_lo·G_lo (~(0.4%)² relative) and the
    bf16 rounding of G_lo (same order) are dropped — negligible in a
    gradient. All 2-D chains (lq, vpp, coef and their dependence on mu, s,
    z, alpha, log sf2) go through jax.vjp of _tile_2d — no hand-derived
    chain rules beyond the identities above.
    """
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

    vpp, coef, vjp2, dlq, dyw = _bwd_2d_common(
        mu_ref, s_ref, yw_ref, w_ref, z_ref, alpha_ref, logsf2_ref,
        dp1y_ref, m_real,
    )
    dyw_ref[:] = dyw

    # ---- Psi2 3-D path ----
    # Lane-chunked (lc lanes at a time, lc a 128-multiple dividing Ml) so
    # the (TN, Ms, lc) working set fits VMEM at any M: every contraction
    # below sums over lanes, so per-chunk results simply accumulate. At
    # M<=512 a single chunk (lc=Ml) reproduces the unchunked kernel.
    z = z_ref[:]
    zs = z[:ms]
    zc = (zs[None, :, :] * coef[:, None, :]).reshape(tn * ms, qp)
    vpp_s = jax.lax.slice_in_dim(vpp, 0, ms, axis=1)              # (TN, Ms)
    # H^T[k, n·m] = sum_m' zext[m',k] G[n·m, m'], in the lane-friendly
    # transposed orientation (output rows = Q+1, lanes = TN·Ms; K = Ml fills
    # the MXU). 2-way bf16 splits on both sides (~2^-16/product): both z
    # rungs ride ONE stacked pass against G_hi, z_hi against G_lo — only
    # z_lo·G_lo (~2^-32) is dropped. Measured 1.4e-4-class p2 gradients vs
    # a float64 oracle (XLA-HIGHEST parity); a 3-rung ladder bought nothing
    # further at +60ms.
    zl3 = zhilo_ref[:]                                   # (2(Qp+1), Ml) bf16
    dn = (((1,), (1,)), ((), ()))
    hxt = jnp.zeros((kk, tn * ms), f32)
    for c0 in range(0, ml, lc):
        zcl = jax.lax.slice_in_dim(z, c0, c0 + lc, axis=0)        # (lc, Qp)
        bt_c = compensated_dot(zc, zcl).reshape(tn, ms, lc)
        vpp_cl = jax.lax.slice_in_dim(vpp, c0, c0 + lc, axis=1)
        e_c = jnp.exp2(bt_c + vpp_s[:, :, None] + vpp_cl[:, None, :])
        dp2s_c = jax.lax.slice_in_dim(dp2s_ref[:], c0, c0 + lc, axis=1)
        g2 = (e_c * dp2s_c[None, :, :]).reshape(tn * ms, lc)
        # NB: rungs via Veltkamp rounding, NOT astype round-trips — the
        # compiler's excess-precision simplification folds cast round-trips,
        # silently zeroing the lo rung (see precise._round_bf16). The MXU
        # operand is a plain bf16 cast (safe: used AS bf16, never
        # round-tripped back); the residual comes from the Veltkamp-rounded
        # value, which equals the cast's RNE value without an extra buffer.
        g_hi = g2.astype(jnp.bfloat16)                   # (TN·Ms, lc) bf16
        g_lo = (g2 - _round_bf16(g2)).astype(jnp.bfloat16)
        zl3_c = jax.lax.slice_in_dim(zl3, c0, c0 + lc, axis=1)
        hx2 = jax.lax.dot_general(zl3_c, g_hi, dn, preferred_element_type=f32)
        hx1 = jax.lax.dot_general(
            zl3_c[:kk], g_lo, dn, preferred_element_type=f32
        )
        hxt = hxt + (hx2[:kk] + hx2[kk:]) + hx1
    # dvpp: both (m, m') occurrences collapse onto the row side by symmetry
    # (the backward always runs Ms == Ml — the h3 reshape here needs a
    # lane-aligned minor dim).
    h3 = (_LN2 * hxt).reshape(kk, tn, ms)
    _bwd_epilogue(h3, qp, coef, zl3, vjp2, dlq,
                  dmu_ref, ds_ref, dz_ref, dzt_ref, dalpha_ref, dlogsf2_ref)


def _bwd_2d_common(mu_ref, s_ref, yw_ref, w_ref, z_ref, alpha_ref,
                   logsf2_ref, dp1y_ref, m_real: int):
    """Shared backward prologue: jax.vjp of the 2-D tile stage plus the
    Psi1 cotangent path. Returns everything the Psi2 3-D path needs."""
    tn, qp = mu_ref.shape
    ml = z_ref.shape[0]
    neg_pad, logw = _mask_and_logw(mu_ref[:], w_ref[:], ml, m_real)
    alphab = jnp.broadcast_to(alpha_ref[:], (tn, qp))

    def small_fn(mu, s, z, alphab, logsf2):
        return _tile_2d(mu, s, z, z * z, alphab, logsf2, logw, neg_pad)

    (lq, vpp, coef), vjp2 = jax.vjp(
        small_fn, mu_ref[:], s_ref[:], z_ref[:], alphab, logsf2_ref[:]
    )
    psi1 = jnp.exp2(lq)
    dpsi1 = _comp_dg(yw_ref[:], dp1y_ref[:], 1, 1)       # (TN, Ml)
    dlq = (_LN2 * dpsi1) * psi1
    dyw = _comp_dg(psi1, dp1y_ref[:], 1, 0)              # (TN, D)
    return vpp, coef, vjp2, dlq, dyw


def _bwd_epilogue(h3, qp, coef, zl3, vjp2, dlq,
                  dmu_ref, ds_ref, dz_ref, dzt_ref, dalpha_ref, dlogsf2_ref):
    """Shared backward epilogue: H -> (dvpp, dcoef, dzt) contractions and
    the 2-D chain transposes (see _bwd_kernel docstring for the math)."""
    kk = qp + 1
    f32 = jnp.float32
    ms = h3.shape[2]
    dvpp = 2.0 * h3[qp]
    zst = (
        zl3[:qp, :ms].astype(f32) + zl3[kk : kk + qp, :ms].astype(f32)
    )                                                             # (Qp, Ms)
    hq = h3[:qp]                                                  # (Qp, TN, Ms)
    dcoef = jnp.sum(hq * zst[:, None, :], axis=2).T               # (TN, Qp)
    dzt_ref[:] += 2.0 * jnp.sum(hq * coef.T[:, :, None], axis=1)  # (Qp, Ms)

    dmu, ds, dz2d, dalphab, dlogsf2 = vjp2((dlq, dvpp, dcoef))
    dmu_ref[:] = dmu
    ds_ref[:] = ds
    dz_ref[:] += dz2d
    dalpha_ref[:] += jnp.sum(dalphab, axis=0, keepdims=True)
    dlogsf2_ref[:] += dlogsf2


def _bucket_mirror(mir, hm, r1: int, bl: int = 128):
    """Bucket a slab's mirror contribution hm (K, TN, Ml - r1) — columns
    [r1, Ml) of the H accumulator — into per-bl-column-block lists. The old
    scheme padded each hm with a zero block and added the full (K, TN, Ml)
    tensor into one accumulator: O(nb^2) VPU adds on zeros plus a retained
    full-width buffer (VERDICT r3 item 6). Bucketing keeps exactly the
    nonzero adds and defers them to the per-block fuse in _fuse_mirror."""
    wm = hm.shape[2]
    for j in range(r1 // bl, (r1 + wm) // bl):
        c0 = j * bl - r1
        mir[j].append(jax.lax.slice_in_dim(hm, c0, c0 + bl, axis=2))


def _fuse_mirror(hrows, mir):
    """h3[j] = hrows[j] + sum(mir[j]) per 128-column block, concatenated
    once — every add lands on real data."""
    out = []
    for hb, pieces in zip(hrows, mir):
        for p in pieces:
            hb = hb + p
        out.append(hb)
    return jnp.concatenate(out, axis=2)


def _bwd_kernel_stair(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                      alpha_ref, logsf2_ref, dp1y_ref, dp2s_ref, zhilo_ref,
                      dmu_ref, ds_ref, dyw_ref, dz_ref, dzt_ref, dalpha_ref,
                      dlogsf2_ref, *, m_real: int, ms: int, lc: int):
    """Staircase-triangle backward (round-3): G = E * sym(dPsi2) is
    symmetric, so per 128-row slab only the columns from the diagonal block
    onward are exponentiated (25% fewer big-tensor cells at Ml=256, 37.5% at
    Ml=512 than the full square); the mirror contribution — H rows for the
    off-diagonal columns — reuses the SAME slab through an in-kernel
    minor-2D transpose of its bf16 halves (G[n,c,r] = G[n,r,c]):

      H[m, k] = sum_{m'>=slab} G[m, m'] zext[m', k]   (row dot, per slab)
      H[c, k] += sum_{r in slab} G[r, c] zext[r, k]   (transposed mirror dot)

    Measured v5e, N=1e6/M=200: 384 ms vs 414 ms for the lane-chunked full
    square (the VPU big-tensor chain is traffic-bound, so the win tracks
    the removed cells minus the transpose cost). ``lc`` is unused (the slab
    structure replaces lane chunking); the full-square kernel remains the
    fallback for Ml > _STAIR_ML_LIMIT where slab working sets outgrow VMEM.
    """
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

    vpp, coef, vjp2, dlq, dyw = _bwd_2d_common(
        mu_ref, s_ref, yw_ref, w_ref, z_ref, alpha_ref, logsf2_ref,
        dp1y_ref, m_real,
    )
    dyw_ref[:] = dyw

    z = z_ref[:]
    zl3 = zhilo_ref[:]                                   # (2kk, Ml) bf16
    dn = (((1,), (1,)), ((), ()))
    bl = 128
    hrows = []
    mir = [[] for _ in range(ms // bl)]
    for r0 in range(0, ms, bl):
        r1 = r0 + bl
        w_cols = ml - r0
        zr = jax.lax.slice_in_dim(z, r0, r1, axis=0)
        zc_i = (zr[None, :, :] * coef[:, None, :]).reshape(tn * bl, qp)
        zcols = jax.lax.slice_in_dim(z, r0, ml, axis=0)
        bt = compensated_dot(zc_i, zcols).reshape(tn, bl, w_cols)
        vpp_r = jax.lax.slice_in_dim(vpp, r0, r1, axis=1)
        vpp_c = jax.lax.slice_in_dim(vpp, r0, ml, axis=1)
        e = jnp.exp2(bt + vpp_r[:, :, None] + vpp_c[:, None, :])
        dp2s_b = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(dp2s_ref[:], r0, r1, axis=0), r0, ml, axis=1
        )
        g = e * dp2s_b[None]
        g2 = g.reshape(tn * bl, w_cols)
        g_hi = g2.astype(jnp.bfloat16)
        g_lo = (g2 - _round_bf16(g2)).astype(jnp.bfloat16)
        zl3_c = jax.lax.slice_in_dim(zl3, r0, ml, axis=1)
        hx2 = jax.lax.dot_general(zl3_c, g_hi, dn, preferred_element_type=f32)
        hx1 = jax.lax.dot_general(zl3_c[:kk], g_lo, dn,
                                  preferred_element_type=f32)
        hrows.append(((hx2[:kk] + hx2[kk:]) + hx1).reshape(kk, tn, bl))
        if r1 < ml:
            wm = ml - r1
            zl3_r = jax.lax.slice_in_dim(zl3, r0, r1, axis=1)
            gh3 = g_hi.reshape(tn, bl, w_cols)
            gl3 = g_lo.reshape(tn, bl, w_cols)
            m_hi = jnp.swapaxes(
                jax.lax.slice_in_dim(gh3, bl, w_cols, axis=2), 1, 2
            ).reshape(tn * wm, bl)
            m_lo = jnp.swapaxes(
                jax.lax.slice_in_dim(gl3, bl, w_cols, axis=2), 1, 2
            ).reshape(tn * wm, bl)
            hx2m = jax.lax.dot_general(zl3_r, m_hi, dn,
                                       preferred_element_type=f32)
            hx1m = jax.lax.dot_general(zl3_r[:kk], m_lo, dn,
                                       preferred_element_type=f32)
            hm = ((hx2m[:kk] + hx2m[kk:]) + hx1m).reshape(kk, tn, wm)
            _bucket_mirror(mir, hm, r1, bl)
    h3 = _LN2 * _fuse_mirror(hrows, mir)

    _bwd_epilogue(h3, qp, coef, zl3, vjp2, dlq,
                  dmu_ref, ds_ref, dz_ref, dzt_ref, dalpha_ref, dlogsf2_ref)


# ---------------------------------------------------------------------------
# Flat-basis kernels (round 3): the entire log2-Psi2 staircase slab as ONE
# K-major MXU matmul over a (3Q+2)-column basis, then exp2 + reduce — no
# per-cell broadcast adds, no lane-padded zc build, no (TN, Ml) vpp array.
#
#   lp[(n,i), j] = sum_k lhs[(n,i), k] * RZ[k, r0+j]     (base-2 log units)
#   lhs columns:  [coef_nq*z_{r0+i,q} | c2mu'_nq | c2p'_nq | rowside | 1]
#   RZ rows:      [z_jq               | z_jq     | z2_jq   | 1       | rpad_j]
#   rowside      = log2e*(<c2mu',z_m> + <c2p',z2_m>) + rpad_m + nsc_n
#   nsc          = log2e*(log_const + log w);  rpad = -.25*log2e*r + mask
#
# Compensated rungs ride the K dim: lhs3=[L_hi,L_hi,L_lo], rz3=[R_hi,R_lo,R_hi]
# (3K <= 128 for Q <= 42: ONE MXU K-tile). The M-pad mask constant is -32768
# (bf16-exact; exp2 underflows to 0 below ~-150). The measured round-3 win on
# a v5e at N=1e6/M=200: fwd 260 -> 210 ms, bwd 387 -> 317 ms (the removed
# lane-padded split-prep and the sublane-broadcast vpp add were ~55% of the
# old backward's wall time; see tools/kernel_lab.py ablations).
# ---------------------------------------------------------------------------

_NEG_MASK = -32768.0  # bf16-exact M-padding mask in base-2 log units
_KM = (((0,), (0,)), ((), ()))  # K-major dot dims: contract dim0 x dim0


def _tile_basis(mu, s, z, z2, alphab, logsf2, logw, rpad):
    """Differentiable small stage of the flat kernels: returns
    (lq, coef, c2mu, c2p, rs, nsc), all (tn, .)-shaped. ``rs`` is the
    z/rpad-dependent part of the rowside column, (tn, Ml); ``nsc`` the
    per-point scalar, (tn, 1) — kept separate because the backward doubles
    rs's cotangent (row/col symmetry) but nsc appears once per cell.
    All dots are compensated_dot so cotangent products stay compensated."""
    den1 = alphab * s + 1.0
    c1 = alphab / den1
    logn1 = (
        logsf2
        - 0.5 * jnp.sum(jnp.log(den1), axis=1, keepdims=True)
        - 0.5 * jnp.sum(c1 * mu * mu, axis=1, keepdims=True)
        + logw
    )
    quad = compensated_dot(
        jnp.concatenate([c1 * mu, -0.5 * c1], axis=1),
        jnp.concatenate([z, z2], axis=1))
    lq = _LOG2E * (logn1 + quad)                                  # (tn, Ml)

    den2 = 2.0 * alphab * s + 1.0
    c2 = alphab / den2
    log_const = (
        2.0 * logsf2
        - 0.5 * jnp.sum(jnp.log(den2), axis=1, keepdims=True)
        - jnp.sum(c2 * mu * mu, axis=1, keepdims=True)
    )
    coef = (0.5 * _LOG2E) * (alphab - c2)                         # (tn, qp)
    c2mu = _LOG2E * (c2 * mu)
    c2p = (-0.25 * _LOG2E) * c2
    nsc = _LOG2E * (log_const + logw)                             # (tn, 1)
    tn = mu.shape[0]
    rs = compensated_dot(
        jnp.concatenate([c2mu, c2p, jnp.ones((tn, 1), jnp.float32)], axis=1),
        jnp.concatenate([z, z2, rpad], axis=1))                   # (tn, Ml)
    return lq, coef, c2mu, c2p, rs, nsc


def _flat_lhs3(coefT, c2muT, c2pT, rowside_s, zsT):
    """Per-slab lhs rungs (3K, tn*128) bf16; K = 3*qp + 2."""
    qp, tn = coefT.shape
    coefz = coefT[:, :, None] * zsT[:, None, :]                   # (qp,tn,128)
    ones = jnp.ones((1, tn, 128), jnp.float32)
    big = jnp.concatenate([
        coefz,
        jnp.broadcast_to(c2muT[:, :, None], (qp, tn, 128)),
        jnp.broadcast_to(c2pT[:, :, None], (qp, tn, 128)),
        rowside_s[None],
        ones,
    ], axis=0).reshape(3 * qp + 2, tn * 128)
    hi = _round_bf16(big)
    lo = big - hi
    return jnp.concatenate([hi, hi, lo], 0).astype(jnp.bfloat16)


def _rz3_inputs(z_p, z2_p, alpha_row, m_real):
    """XLA-side flat-kernel inputs: rz3 (3K, Ml) bf16 rungs and the rpad
    column (Ml, 1) f32 (-.25*log2e*r + M-pad mask)."""
    ml, qp = z_p.shape
    r = jnp.sum(alpha_row.reshape(1, qp) * z2_p, axis=1)          # (Ml,)
    mask = jnp.where(jnp.arange(ml) >= m_real, _NEG_MASK, 0.0)
    rpad = ((-0.25 * _LOG2E) * r + mask).reshape(ml, 1).astype(jnp.float32)
    rz = jnp.concatenate([
        z_p.T, z_p.T, z2_p.T, jnp.ones((1, ml), z_p.dtype), rpad.T,
    ], axis=0).astype(jnp.float32)                                # (K, Ml)
    hi = _round_bf16(rz)
    lo = rz - hi
    return jnp.concatenate([hi, lo, hi], 0).astype(jnp.bfloat16), rpad


def _mirror_blockdiag(p2, ml, dtype):
    """u + u^T - blockdiag(u): restores the full symmetric matrix from the
    computed upper staircase (diagonal 128-blocks computed fully)."""
    nb = ml // 128
    eye_b = jnp.kron(jnp.eye(nb, dtype=dtype), jnp.ones((128, 128), dtype))
    return p2 + p2.T - p2 * eye_b


def _fwd_flat_body(mu, s, yw, w, z_ref, z2_ref, alpha_ref, logsf2_ref,
                   rz3_ref, rpad_ref, p1y_ref, p2_ref, m_real: int):
    """Shared flat-forward tile body: (tn, .)-shaped VALUES for the N-sized
    inputs (so the (N, Q)- and (Q, N)-blocked kernels share all math), refs
    for the replicated inputs and the on-chip accumulators."""
    f32 = jnp.float32
    tn, qp = mu.shape
    ml = z_ref.shape[0]
    logw = jnp.maximum(jnp.log(w), w * 0.0 + _NEG_BIG)
    alphab = jnp.broadcast_to(alpha_ref[:], (tn, qp))
    lq, coef, c2mu, c2p, rs, nsc = _tile_basis(
        mu, s, z_ref[:], z2_ref[:], alphab,
        logsf2_ref[:], logw, rpad_ref[:])
    rowside_full = rs + nsc
    coefT, c2muT, c2pT = _t2(coef), _t2(c2mu), _t2(c2p)
    neg_pad = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ml), 1) >= m_real
    ).astype(f32) * _NEG_BIG
    psi1 = jnp.exp2(lq + neg_pad)
    p1y_ref[:] += jax.lax.dot_general(
        psi1, yw, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)

    for r0 in range(0, ml, 128):
        w_cols = ml - r0
        zsT = _t2(jax.lax.slice_in_dim(z_ref[:], r0, r0 + 128, axis=0))
        rowside_s = jax.lax.slice_in_dim(rowside_full, r0, r0 + 128, axis=1)
        lhs3 = _flat_lhs3(coefT, c2muT, c2pT, rowside_s, zsT)
        rz3_c = jax.lax.slice_in_dim(rz3_ref[:], r0, ml, axis=1)
        lp = jax.lax.dot_general(lhs3, rz3_c, _KM,
                                 preferred_element_type=f32)      # (A, w)
        e = jnp.exp2(lp).reshape(tn, 128, w_cols)
        p2_ref[r0:r0 + 128, r0:ml] += jnp.sum(e, axis=0)


def _fwd_kernel_flat(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                     alpha_ref, logsf2_ref, rz3_ref, rpad_ref,
                     p1y_ref, p2_ref, *, m_real: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        p1y_ref[:] = jnp.zeros_like(p1y_ref)
        p2_ref[:] = jnp.zeros_like(p2_ref)

    _fwd_flat_body(mu_ref[:], s_ref[:], yw_ref[:], w_ref[:], z_ref, z2_ref,
                   alpha_ref, logsf2_ref, rz3_ref, rpad_ref,
                   p1y_ref, p2_ref, m_real)


def _sub_rows(xt, off, st: int, interpret: bool):
    """Rows [off, off+st) of xt with a TRACED offset. Mosaic has no lowering
    for value-level dynamic_slice, but tpu.DynamicRotateOp takes dynamic
    shifts — roll the wanted rows to the top and slice statically. Interpret
    mode is the reverse: no pltpu.roll rule, but dynamic_slice works."""
    if st == xt.shape[0]:
        return xt
    if interpret:
        return jax.lax.dynamic_slice_in_dim(xt, off, st, axis=0)
    return jax.lax.slice_in_dim(pltpu.roll(xt, -off, 0), 0, st, axis=0)


def _place_rows(r, off, lb: int, interpret: bool):
    """Inverse of _sub_rows for accumulation: an (st, k) sub-result placed at
    row offset ``off`` of an (lb, k) zero field (static pad at 0, dynamic
    roll into position)."""
    st = r.shape[0]
    if interpret:
        return jax.lax.dynamic_update_slice_in_dim(
            jnp.zeros((lb,) + r.shape[1:], r.dtype), r, off, axis=0)
    rp = jnp.pad(r, ((0, lb - st),) + ((0, 0),) * (r.ndim - 1))
    return pltpu.roll(rp, off, 0)


def _fwd_kernel_flat_t(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                       alpha_ref, logsf2_ref, rz3_ref, rpad_ref,
                       p1y_ref, p2_ref, *, m_real: int, st: int,
                       interpret: bool):
    """(Q, N)-native flat forward: blocks arrive transposed — mu/s (Qp, LB),
    yw (D, LB), w (1, LB) with LB a 128-multiple lane block of the N axis
    (Mosaic requires lane blocks to be 128-aligned) — and grid axis 1 walks
    LB/st sub-tiles so the per-step VMEM working set stays at the calibrated
    (st, ...) budget. Nothing (N, small) ever exists in HBM: the 12.8x
    lane-padding expansion of (N, Q<=10) arrays becomes a 1.6x sublane pad."""
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        p1y_ref[:] = jnp.zeros_like(p1y_ref)
        p2_ref[:] = jnp.zeros_like(p2_ref)

    off = pl.program_id(1) * st
    mu = _sub_rows(_t2(mu_ref[:]), off, st, interpret)
    s = _sub_rows(_t2(s_ref[:]), off, st, interpret)
    yw = _sub_rows(_t2(yw_ref[:]), off, st, interpret)
    w = _sub_rows(_t2(w_ref[:]), off, st, interpret)
    _fwd_flat_body(mu, s, yw, w, z_ref, z2_ref,
                   alpha_ref, logsf2_ref, rz3_ref, rpad_ref,
                   p1y_ref, p2_ref, m_real)


def _bwd_flat_body(mu, s, yw, w, z_ref, z2_ref,
                   alpha_ref, logsf2_ref, rz3_ref, rpad_ref,
                   dp1y_ref, dp2s_ref, m_real: int):
    """Flat-basis backward tile body (shared by the (N, Q)- and
    (Q, N)-blocked kernels; N-sized inputs arrive as (tn, .) VALUES).
    The per-slab H-dot generalizes the old zext-dot
    to the full basis: dlhs[k, (n,i)] = sum_j RZ[k, j] G[(n,i), j] with
    G = exp2(lp) * sym(dPsi2) and the mirror contribution transposed in from
    the same slab (G symmetric), exactly as the staircase kernel. Parameter
    chains flow through jax.vjp of _tile_basis; by row/col symmetry the
    column-side cotangents of the c2mu'/c2p'/rpad basis rows equal the
    row-side ones, so rs's cotangent is doubled and those rows discarded.
    rpad's own chain (dalpha, dz) is closed outside the kernel via drpad.

    Returns per-tile cotangent VALUES:
    (dmu, ds, dyw, dz2d, dzt_add, dalpha_row, dlogsf2, drpad)."""
    f32 = jnp.float32
    tn, qp = mu.shape
    ml = z_ref.shape[0]
    kx = 3 * qp + 2

    logw = jnp.maximum(jnp.log(w), w * 0.0 + _NEG_BIG)
    alphab = jnp.broadcast_to(alpha_ref[:], (tn, qp))

    def small_fn(mu, s, z, alphab, logsf2, rpad):
        return _tile_basis(mu, s, z, z * z, alphab, logsf2, logw, rpad)

    (lq, coef, c2mu, c2p, rs, nsc), vjp2 = jax.vjp(
        small_fn, mu, s, z_ref[:], alphab, logsf2_ref[:],
        rpad_ref[:])
    rowside_full = rs + nsc

    neg_pad = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ml), 1) >= m_real
    ).astype(f32) * _NEG_BIG
    psi1 = jnp.exp2(lq + neg_pad)
    dpsi1 = _comp_dg(yw, dp1y_ref[:], 1, 1)
    dlq = (_LN2 * dpsi1) * psi1
    dyw = _comp_dg(psi1, dp1y_ref[:], 1, 0)

    coefT, c2muT, c2pT = _t2(coef), _t2(c2mu), _t2(c2p)
    dn = (((1,), (1,)), ((), ()))
    hrows = []
    mir = [[] for _ in range(ml // 128)]
    for r0 in range(0, ml, 128):
        r1 = r0 + 128
        w_cols = ml - r0
        zsT = _t2(jax.lax.slice_in_dim(z_ref[:], r0, r1, axis=0))
        rowside_s = jax.lax.slice_in_dim(rowside_full, r0, r1, axis=1)
        lhs3 = _flat_lhs3(coefT, c2muT, c2pT, rowside_s, zsT)
        rz3_c = jax.lax.slice_in_dim(rz3_ref[:], r0, ml, axis=1)
        lp = jax.lax.dot_general(lhs3, rz3_c, _KM,
                                 preferred_element_type=f32)
        e3 = jnp.exp2(lp).reshape(tn, 128, w_cols)
        dp2s_b = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(dp2s_ref[:], r0, r1, axis=0), r0, ml, axis=1)
        g = e3 * dp2s_b[None]
        g2 = g.reshape(tn * 128, w_cols)
        g_hi = g2.astype(jnp.bfloat16)
        g_lo = (g2 - _round_bf16(g2)).astype(jnp.bfloat16)
        hx2 = jax.lax.dot_general(rz3_c[:2 * kx], g_hi, dn,
                                  preferred_element_type=f32)
        hx1 = jax.lax.dot_general(rz3_c[:kx], g_lo, dn,
                                  preferred_element_type=f32)
        hrows.append(((hx2[:kx] + hx2[kx:]) + hx1).reshape(kx, tn, 128))
        if r1 < ml:
            wm = ml - r1
            rz3_r = jax.lax.slice_in_dim(rz3_ref[:], r0, r1, axis=1)
            gh3 = g_hi.reshape(tn, 128, w_cols)
            gl3 = g_lo.reshape(tn, 128, w_cols)
            m_hi = jnp.swapaxes(
                jax.lax.slice_in_dim(gh3, 128, w_cols, axis=2), 1, 2
            ).reshape(tn * wm, 128)
            m_lo = jnp.swapaxes(
                jax.lax.slice_in_dim(gl3, 128, w_cols, axis=2), 1, 2
            ).reshape(tn * wm, 128)
            hx2m = jax.lax.dot_general(rz3_r[:2 * kx], m_hi, dn,
                                       preferred_element_type=f32)
            hx1m = jax.lax.dot_general(rz3_r[:kx], m_lo, dn,
                                       preferred_element_type=f32)
            hm = ((hx2m[:kx] + hx2m[kx:]) + hx1m).reshape(kx, tn, wm)
            _bucket_mirror(mir, hm, r1)
    dlhs = _LN2 * _fuse_mirror(hrows, mir)                        # (K,tn,Ml)

    zT_all = _t2(z_ref[:])
    dcoefz = dlhs[:qp]                                            # (qp,tn,Ml)
    dcoef = jnp.sum(dcoefz * zT_all[:, None, :], axis=2).T        # (tn, qp)
    dzt_add = 2.0 * jnp.sum(dcoefz * coefT[:, :, None], axis=1)
    drowside = dlhs[3 * qp]                                       # (tn, Ml)
    dnsc = jnp.sum(drowside, axis=1, keepdims=True)

    dmu, ds, dz2d, dalphab, dlogsf2, drpad = vjp2(
        (dlq, dcoef, jnp.zeros_like(c2mu), jnp.zeros_like(c2p),
         2.0 * drowside, dnsc))
    return (dmu, ds, dyw, dz2d, dzt_add,
            jnp.sum(dalphab, axis=0, keepdims=True), dlogsf2, drpad)


def _bwd_kernel_flat(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                     alpha_ref, logsf2_ref, rz3_ref, rpad_ref,
                     dp1y_ref, dp2s_ref,
                     dmu_ref, ds_ref, dyw_ref, dz_ref, dzt_ref,
                     dalpha_ref, dlogsf2_ref, drpad_ref, *, m_real: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dz_ref[:] = jnp.zeros_like(dz_ref)
        dzt_ref[:] = jnp.zeros_like(dzt_ref)
        dalpha_ref[:] = jnp.zeros_like(dalpha_ref)
        dlogsf2_ref[:] = jnp.zeros_like(dlogsf2_ref)
        drpad_ref[:] = jnp.zeros_like(drpad_ref)

    dmu, ds, dyw, dz2d, dzt_add, dalpha_row, dlogsf2, drpad = _bwd_flat_body(
        mu_ref[:], s_ref[:], yw_ref[:], w_ref[:], z_ref, z2_ref,
        alpha_ref, logsf2_ref, rz3_ref, rpad_ref, dp1y_ref, dp2s_ref, m_real)
    dmu_ref[:] = dmu
    ds_ref[:] = ds
    dyw_ref[:] = dyw
    dz_ref[:] += dz2d
    dzt_ref[:] += dzt_add
    dalpha_ref[:] += dalpha_row
    dlogsf2_ref[:] += dlogsf2
    drpad_ref[:] += drpad


def _bwd_kernel_flat_t(mu_ref, s_ref, yw_ref, w_ref, z_ref, z2_ref,
                       alpha_ref, logsf2_ref, rz3_ref, rpad_ref,
                       dp1y_ref, dp2s_ref,
                       dmu_ref, ds_ref, dyw_ref, dz_ref, dzt_ref,
                       dalpha_ref, dlogsf2_ref, drpad_ref,
                       *, m_real: int, st: int, interpret: bool):
    """(Q, N)-native flat backward. Blocks arrive transposed (lane blocks of
    N must be 128-multiples), and a fori_loop walks LB/st sub-tiles INSIDE
    the kernel — a real loop, so Mosaic reuses the slab temporaries across
    sub-tiles and the retained VMEM stays at the calibrated (st, ...) budget
    (an unrolled Python loop would retain every sub-tile's slabs and
    overflow scoped VMEM at LB=128). The N-sized cotangents accumulate in
    (LB, .) carries and store transposed ONCE per block, so dmu/ds/dyw also
    live (Q, N)/(D, N) in HBM."""
    f32 = jnp.float32
    qp, lb = mu_ref.shape
    d = yw_ref.shape[0]
    ml = z_ref.shape[0]
    dtype = mu_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        dz_ref[:] = jnp.zeros_like(dz_ref)
        dzt_ref[:] = jnp.zeros_like(dzt_ref)
        dalpha_ref[:] = jnp.zeros_like(dalpha_ref)
        dlogsf2_ref[:] = jnp.zeros_like(dlogsf2_ref)
        drpad_ref[:] = jnp.zeros_like(drpad_ref)

    muT = _t2(mu_ref[:])
    sT = _t2(s_ref[:])
    ywT = _t2(yw_ref[:])
    wT = _t2(w_ref[:])

    def body(j, carry):
        dmu_b, ds_b, dyw_b, dz_a, dzt_a, dal_a, dls_a, drp_a = carry
        off = j * st
        mu = _sub_rows(muT, off, st, interpret)
        s = _sub_rows(sT, off, st, interpret)
        yw = _sub_rows(ywT, off, st, interpret)
        w = _sub_rows(wT, off, st, interpret)
        dmu, ds, dyw, dz2d, dzt_add, dal, dls, drp = _bwd_flat_body(
            mu, s, yw, w, z_ref, z2_ref, alpha_ref, logsf2_ref,
            rz3_ref, rpad_ref, dp1y_ref, dp2s_ref, m_real)
        dmu_b = dmu_b + _place_rows(dmu, off, lb, interpret)
        ds_b = ds_b + _place_rows(ds, off, lb, interpret)
        dyw_b = dyw_b + _place_rows(dyw, off, lb, interpret)
        return (dmu_b, ds_b, dyw_b, dz_a + dz2d, dzt_a + dzt_add,
                dal_a + dal, dls_a + dls, drp_a + drp)

    init = (
        jnp.zeros((lb, qp), dtype), jnp.zeros((lb, qp), dtype),
        jnp.zeros((lb, d), dtype), jnp.zeros((ml, qp), f32),
        jnp.zeros((qp, ml), f32), jnp.zeros((1, qp), f32),
        jnp.zeros((1, 1), f32), jnp.zeros((ml, 1), f32),
    )
    trips = lb // st
    out = body(0, init) if trips == 1 else jax.lax.fori_loop(
        0, trips, body, init)
    dmu_ref[:] = _t2(out[0])
    ds_ref[:] = _t2(out[1])
    dyw_ref[:] = _t2(out[2])
    dz_ref[:] += out[3]
    dzt_ref[:] += out[4]
    dalpha_ref[:] += out[5]
    dlogsf2_ref[:] += out[6]
    drpad_ref[:] += out[7]


def _pad_inputs(mu, s, yw, w, z, tile):
    """Apply the exact padding contract; returns padded arrays + dims."""
    n, q = mu.shape
    m = z.shape[0]
    npad = _round_up(n, tile)
    # Qp: lane-dim efficiency is irrelevant for (TN, Q) ops; pad to >= 1 only.
    qp = q
    _, ml = _m_dims(m)

    if npad != n:
        ones = jnp.ones((npad - n, q), mu.dtype)
        mu = jnp.concatenate([mu, ones], 0)
        s = jnp.concatenate([s, ones], 0)
        yw = jnp.concatenate([yw, jnp.zeros((npad - n, yw.shape[1]), yw.dtype)], 0)
        w = jnp.concatenate([w, jnp.zeros((npad - n,), w.dtype)], 0)
    if ml != m:
        z = jnp.concatenate([z, jnp.zeros((ml - m, z.shape[1]), z.dtype)], 0)
    return mu, s, yw, w, z, npad, qp, ml


def _pad_inputs_t(mu_t, s_t, yw_t, w, z, tile):
    """Transposed-layout padding: mu/s are (Q, N), yw is (D, N) — N pads on
    AXIS 1 so nothing (N, small) ever materializes (the whole point of the
    layout: an (N, q<=10) f32 array physically tiles to (N, 128) in HBM)."""
    q, n = mu_t.shape
    m = z.shape[0]
    npad = _round_up(n, tile)
    _, ml = _m_dims(m)
    if npad != n:
        ones = jnp.ones((q, npad - n), mu_t.dtype)
        mu_t = jnp.concatenate([mu_t, ones], 1)
        s_t = jnp.concatenate([s_t, ones], 1)
        yw_t = jnp.concatenate(
            [yw_t, jnp.zeros((yw_t.shape[0], npad - n), yw_t.dtype)], 1
        )
        w = jnp.concatenate([w, jnp.zeros((npad - n,), w.dtype)], 0)
    if ml != m:
        z = jnp.concatenate([z, jnp.zeros((ml - m, z.shape[1]), z.dtype)], 0)
    return mu_t, s_t, yw_t, w, z, npad, q, ml


def _t2(x):
    """Small-block 2-D transpose inside a kernel via the (proven-lowering)
    3-D minor-2 swapaxes pattern."""
    return jnp.swapaxes(x[None], 1, 2)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def psi_fused(mu, s, z, sf2, alpha, yw, w_arr, tile: int = 32,
              interpret: bool = False):
    """Fused (Psi1^T(w·Y), sum_n w_n Psi2_n) via the Pallas kernel.

    Args mirror psi.py; ``yw`` is Y (weights are applied in-kernel via
    ``w_arr``). Returns (psi1y (M, D), psi2 (M, M)). Differentiable wrt
    (mu, s, z, sf2, alpha, yw) through a Pallas backward kernel.
    """
    out, _ = _psi_fused_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret)
    return out


# ===========================================================================
# DEVICE-GENERATION CALIBRATION BLOCK. The constants below fall into three
# classes with DIFFERENT re-calibration rules:
#
#  (1) VMEM-budget bounds — _FWD_BUDGET, _BWD_BUDGET, _FLAT_FWD_ELEMS,
#      _FLAT_BWD_ELEMS, _STAIR_BUDGET — measured on a TPU v5e (16 MB
#      VMEM/core). Conservative compile-or-fallback bounds, not correctness
#      constants: on v4/v5p the kernels still run correctly but may use
#      v5e-sized tiles (leaving headroom). Re-run
#      tools/{flat_lab,kernel_lab,grid_lab}.py on the new generation and
#      bump these together (PALLAS_M_LIMIT below is in this class too).
#      Two more v5e-sized values of the same class
#      live OUTSIDE this block: the 18 MB vmem_limit_bytes CompilerParams
#      override (a 2M bump over the v5e's 16M scoped-vmem default) and the
#      min(tile, 64) triangle-mode N-tile cap — re-measure both too.
#  (2) Capability windows — _FLAT_ML_LIMIT, _STAIR_ML_LIMIT — the shapes
#      the kernels are WRITTEN to handle (interpret-mode CPU parity tests
#      exercise the full window). Not hardware measurements; do not shrink
#      them when porting or the CPU coverage of the ml in (256, 512]
#      sub-tile ladders disappears.
#  (3) Hardware crash guard — _FLAT_ML_HW_LIMIT — guards a DOCUMENTED TPU
#      worker crash (see its own comment). NEVER bump it with class (1);
#      it may only be raised after tools/qn_ml512_bisect.py passes ml in
#      {384, 512} fwd+bwd on real hardware.
# ===========================================================================

# VMEM element budgets for the (TN, Ms, Ml) working set, calibrated on a
# v5e: forward keeps ~2 big f32 buffers live, backward ~3 f32 + 2 bf16.
_FWD_BUDGET = 64 * 256 * 256
_BWD_BUDGET = 32 * 256 * 256

# Largest M any pallas engine accepts at all (class 1, measured on v5e:
# M=640 compiles with the lane-chunked backward, M>=1024 does not — Mosaic
# retains per-chunk temporaries). Beyond it the dispatchers
# (parallel/stats.py, models/gplvm.py) fall back to the XLA scan engine.
PALLAS_M_LIMIT = 640

# Flat-basis kernels: largest Ml routed through them (beyond: staircase /
# lane-chunked fallbacks), and per-path VMEM element budgets expressed as
# tile * 128 * sum-of-slab-widths, calibrated on a v5e at Ml=256 (fwd tile
# 152 compiles, 160 overflows scoped vmem by 0.6M — the kernel retains the
# full-width rowside/lq (TN, Ml) pair on top of the slab working set; bwd
# 64 compiles, 96 does not).
_FLAT_ML_LIMIT = 512
_FLAT_FWD_ELEMS = 152 * 128 * 384
_FLAT_BWD_ELEMS = 64 * 128 * 384


def _flat_tile(tile: int, ml: int, budget_elems: int) -> int:
    """N-tile for the flat kernels: the retained working set scales with the
    staircase's total slab area 128 * S, S = sum_b (ml - 128 b)."""
    nb = ml // 128
    s = nb * ml - 128 * (nb * (nb - 1)) // 2
    t = min(tile, budget_elems // (128 * s))
    return max(8, t - (t % 8))

# Staircase backward: largest Ml whose slab working sets fit scoped VMEM
# (Mosaic retains per-slab temporaries across the static slab loop), and the
# retained-elements budget calibrated on a v5e (Ml=256 at tile 32 = 3.93M
# elements compiles; 4.2M does not).
_STAIR_ML_LIMIT = 512
_STAIR_BUDGET = 4_000_000


def _stair_tile(tile: int, ml: int) -> int:
    """N-tile for the staircase backward: retained VMEM ~ slab G buffers
    (f32 + two bf16 halves = 2x f32 elems) plus mirror transposes (bf16
    halves = 1.5x counting the sliced source)."""
    nb = ml // 128
    s0 = (ml + 128) * nb // 2          # sum of slab widths
    s1 = (ml - 128) * nb // 2          # sum of mirror widths
    per_tile = 128 * (2 * s0 + (3 * s1) // 2)
    t = min(tile, _STAIR_BUDGET // per_tile)
    return max(8, t - (t % 8))


def _lane_chunk(tile: int, ms: int, ml: int, budget_elems: int) -> int:
    """Largest 128-multiple lane-chunk lc dividing Ml with tile*Ms*lc within
    the VMEM budget (falls back to 128): keeps the backward compilable at
    any M even when the minimum tile alone would overflow VMEM."""
    k = ml // 128
    for d in range(k, 0, -1):
        if k % d == 0 and tile * ms * (d * 128) <= budget_elems:
            return d * 128
    return 128


def _fit_tile(tile: int, ms: int, ml: int, budget_elems: int) -> int:
    """Cap the N-tile so the (TN, Ms, Ml) VMEM working set stays on-chip for
    any M, honoring the caller's tile when it already fits. Multiples of 8:
    the (tile, Q) N-blocks need sublane-divisible block shapes."""
    t = min(tile, budget_elems // (ms * ml))
    return max(8, t - (t % 8))


def _flat_subtile(budget_tile: int) -> int:
    """Sub-tile for the (Q, N)-native kernels: the largest 8-multiple
    divisor of the 128-lane block that fits the calibrated budget (the
    in-kernel loop keeps retained VMEM at st, not LB)."""
    for c in (128, 64, 32, 16, 8):
        if c <= budget_tile:
            return c
    return 8


# Shared HARDWARE window for the whole flat-basis kernel family — row-major
# (_use_flat) and (Q, N)-native (qn_native_ok) dispatch alike; one risk
# policy, not two (ADVICE r3).
#
# History, with the round-5 root cause. ml=512 "crashed the TPU worker at
# N=1e7/M=500" in rounds 3 and 4 and was first quarantined, then (after
# tools/qn_ml512_bisect.py passed ml in {384, 512} fwd+bwd to N=4e6)
# guarded by per-call N caps. Round 5 (2026-08-19, v5e,
# tools/flat_n_boundary.py) identified the failing quantity, and it was
# NEVER the kernel: the probe tools closed their jitted losses over the
# N-sized y/w arrays, embedding O(N) CONSTANTS into the HLO shipped
# through the axon tunnel's /remote_compile HTTP endpoint. Evidence:
#   * constants version, N=6e6 (~312 MB of constants): clean client error
#     "HTTP 413: Failed to buffer the request body: length limit exceeded";
#     a 300 MB control constant at N=4096 passes — limit sits just above
#     300 MB, and the historic ~520 MB payloads at N=1e7 are what killed
#     the tunnel worker ("TPU worker process crashed" from the client);
#   * arguments version (the PRODUCTION calling convention — suff_stats
#     under fit/bench never embeds data): N walked 4e6 -> 6e6 -> 8e6 ->
#     1e7 at ml=512, fwd+bwd, ALL PASS (13.3 s steady at 1e7);
#   * grid-steps hypothesis refuted separately (tile=8 at N=4e6 = 500k
#     steps > the "crashing" shape's 312k: PASS), wall-time hypothesis
#     bounded (13.3 s single calls pass).
# The window therefore sits at the capability limit with no kernel-side
# N quarantine. Interpret mode keeps the full capability window
# (_FLAT_ML_LIMIT) so CPU parity tests cover every sub-tile ladder.
_FLAT_ML_HW_LIMIT = 512

# Per-pallas_call N caps. After the round-5 root cause above, both classes
# sit at the HARDWARE-PROVEN single-call endpoint (v5e: N=1e7 at ml=256
# round 3 production path; N=1e7 at ml=512 round 5 boundary walk, fwd+bwd).
# The caps and the lax.scan chunked accumulation below them are kept as the
# guard for territory beyond any measurement (N > 1e7 per call): chunking
# is exact — both outputs are plain sums over N and chunk-padding rows
# carry w=0 (the _pad_inputs contract, tested to 0 ulp) — and measured
# free (the 3-chunk config-5 eval matched the single-call wall to <1%).
_FLAT_N_PER_CALL_NARROW = 10_000_000
_FLAT_N_PER_CALL_WIDE = 10_000_000
_CHUNK_GRANULE = 1024   # rows-per-chunk granularity (tests patch this down)


def _chunk_plan(n: int, ml: int):
    """(num_chunks, rows_per_chunk) when n exceeds the per-call hardware
    cap for this Ml class; None when one call is proven safe. Applies in
    interpret mode too (chunking is exact, and CPU test shapes never reach
    the caps); parity tests monkeypatch the caps to exercise the chunked
    path at test scale."""
    cap = _FLAT_N_PER_CALL_NARROW if ml <= 256 else _FLAT_N_PER_CALL_WIDE
    if n <= cap:
        return None
    g = _CHUNK_GRANULE
    nb = -(-n // cap)                    # ceil(n / cap) chunks
    block = _round_up(-(-n // nb), g)    # equal rows per chunk
    if block > cap:                      # granule-rounding overshot the cap
        nb += 1
        block = _round_up(-(-n // nb), g)
    return nb, block


def _use_flat(ml: int, q: int, interpret: bool) -> bool:
    """Route through the flat-basis kernels: >= 2 lane blocks (one full
    block is already minimal for the old kernels), slab working sets within
    the calibrated VMEM budgets, the 3Q+2 basis inside ONE MXU K-tile, and
    ml inside the hardware-proven window unless interpreting."""
    lim = _FLAT_ML_LIMIT if interpret else _FLAT_ML_HW_LIMIT
    return 2 * 128 <= ml <= lim and 3 * q + 2 <= 128


def qn_native_ok(m: int, q: int, interpret: bool) -> bool:
    """Can suff_stats_t route (m, q) through the (Q, N)-native kernels?"""
    _, ml = _m_dims(m)
    lim = _FLAT_ML_LIMIT if interpret else _FLAT_ML_HW_LIMIT
    return 2 * 128 <= ml <= lim and 3 * q + 2 <= 128


def _call_fwd_flat(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret):
    d = yw.shape[1]
    m = z.shape[0]
    dtype = mu.dtype
    _, ml = _m_dims(m)
    # Callers' tile hints are tuned for the (TN, Ms, Ml) kernels; on hardware
    # the slab budget is the binding constraint (interpret keeps the hint so
    # CPU parity tests exercise multi-step grid accumulation).
    tile = _flat_tile(tile if interpret else 256, ml, _FLAT_FWD_ELEMS)
    mu_p, s_p, yw_p, w_p, z_p, npad, qp, ml = _pad_inputs(
        mu, s, yw, w_arr, z, tile)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    rz3, rpad = _rz3_inputs(z_p, z2_p, alpha_row, m)
    grid = npad // tile
    kx = 3 * qp + 2
    kernel = functools.partial(_fwd_kernel_flat, m_real=m)
    p1y, p2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # mu
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # s
            pl.BlockSpec((tile, d), lambda i: (i, 0)),         # yw
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),         # w
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),          # z
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),          # z2
            pl.BlockSpec((1, qp), lambda i: (0, 0)),           # alpha
            pl.BlockSpec((1, 1), lambda i: (0, 0)),            # log sf2
            pl.BlockSpec((3 * kx, ml), lambda i: (0, 0)),      # rz3 rungs
            pl.BlockSpec((ml, 1), lambda i: (0, 0)),           # rpad
        ],
        out_specs=[
            pl.BlockSpec((ml, d), lambda i: (0, 0)),
            pl.BlockSpec((ml, ml), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ml, d), dtype),
            jax.ShapeDtypeStruct((ml, ml), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(-1, 1), z_p, z2_p, alpha_row, logsf2,
      rz3, rpad)
    p2 = _mirror_blockdiag(p2, ml, dtype)
    return p1y[:m], p2[:m, :m]


def _call_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret):
    d = yw.shape[1]
    m = z.shape[0]
    dtype = mu.dtype
    ms, ml = _m_dims(m)
    if _use_flat(ml, mu.shape[1], interpret):
        return _call_fwd_flat(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret)
    # Triangle mode works block-at-a-time, but Mosaic does NOT reuse the
    # per-block temporaries across the static block loop (measured: VMEM
    # grows ~ tile*128*128 per block), so the tile budget divides by the
    # block count, with the (Ms, Ml) accumulator off the top. 64 is the
    # largest N-tile that fits the scoped VMEM at Ml=256 (80 overflows by
    # ~0.9MB); larger never measured faster.
    tri_probe = ml >= 2 * _TRI_BL
    if tri_probe:
        nblk = len(_tri_blocks(ms, ml))
        tile = _fit_tile(
            min(tile, 64), _TRI_BL, _TRI_BL * nblk,
            max(_FWD_BUDGET - ms * ml, 8 * _TRI_BL * _TRI_BL * nblk),
        )
    else:
        tile = _fit_tile(min(tile, 64), ms, ml, _FWD_BUDGET)
    mu_p, s_p, yw_p, w_p, z_p, npad, qp, ml = _pad_inputs(mu, s, yw, w_arr, z, tile)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    grid = npad // tile

    # Triangle tiling pays once there are >= 2 lane blocks; at Ml=128 the
    # single full block is already minimal.
    tri = ml >= 2 * _TRI_BL
    kernel = functools.partial(_fwd_kernel, m_real=m, tri=tri)
    p1y, p2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # mu
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # s
            pl.BlockSpec((tile, d), lambda i: (i, 0)),         # yw
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),         # w
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),          # z
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),          # z2
            pl.BlockSpec((1, qp), lambda i: (0, 0)),           # alpha
            pl.BlockSpec((1, 1), lambda i: (0, 0)),            # log sf2
        ],
        out_specs=[
            pl.BlockSpec((ml, d), lambda i: (0, 0)),
            pl.BlockSpec((ms, ml), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ml, d), dtype),
            jax.ShapeDtypeStruct((ms, ml), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(-1, 1), z_p, z2_p, alpha_row, logsf2)
    if tri:
        # Mirror the upper-triangle blocks on the small accumulator: the
        # diagonal blocks were computed fully (and are symmetric), so
        # U + U^T - (diag blocks of U) restores the full matrix.
        u = jnp.zeros((ml, ml), dtype).at[:ms].set(p2)
        nb = ml // _TRI_BL
        eye_b = jnp.kron(
            jnp.eye(nb, dtype=dtype), jnp.ones((_TRI_BL, _TRI_BL), dtype)
        )
        p2 = u + u.T - u * eye_b
    return p1y[:m], p2[:m, :m]


def _psi_fused_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret):
    out = _call_fwd(mu, s, z, sf2, alpha, yw, w_arr, tile, interpret)
    return out, (mu, s, z, sf2, alpha, yw, w_arr)


def _call_bwd_flat(mu, s, z, sf2, alpha, yw, w_arr, dp1y, dp2, tile,
                   interpret):
    d = yw.shape[1]
    m = z.shape[0]
    dtype = mu.dtype
    n = mu.shape[0]
    _, ml = _m_dims(m)
    tile = _flat_tile(tile if interpret else 256, ml, _FLAT_BWD_ELEMS)
    mu_p, s_p, yw_p, w_p, z_p, npad, qp, ml = _pad_inputs(
        mu, s, yw, w_arr, z, tile)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    rz3, rpad = _rz3_inputs(z_p, z2_p, alpha_row, m)
    dp1y_p = jnp.zeros((ml, d), dtype).at[:m].set(dp1y)
    # Psi2 is symmetric, so only the symmetric part of its cotangent acts;
    # the flat backward needs G = E * dp2s symmetric for the row/col-side
    # cotangent folding.
    dp2s = 0.5 * (dp2 + dp2.T)
    dp2_p = jnp.zeros((ml, ml), dtype).at[:m, :m].set(dp2s)
    grid = npad // tile
    kx = 3 * qp + 2
    kernel = functools.partial(_bwd_kernel_flat, m_real=m)
    dmu, ds, dyw, dz, dzt, dalpha, dlogsf2, drpad = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((3 * kx, ml), lambda i: (0, 0)),      # rz3 rungs
            pl.BlockSpec((ml, 1), lambda i: (0, 0)),           # rpad
            pl.BlockSpec((ml, d), lambda i: (0, 0)),           # dp1y
            pl.BlockSpec((ml, ml), lambda i: (0, 0)),          # dp2s
        ],
        out_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # dmu
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # ds
            pl.BlockSpec((tile, d), lambda i: (i, 0)),         # dyw
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),          # dz (2-D) acc
            pl.BlockSpec((qp, ml), lambda i: (0, 0)),          # dz (direct)^T
            pl.BlockSpec((1, qp), lambda i: (0, 0)),           # dalpha acc
            pl.BlockSpec((1, 1), lambda i: (0, 0)),            # dlogsf2 acc
            pl.BlockSpec((ml, 1), lambda i: (0, 0)),           # drpad acc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, qp), dtype),
            jax.ShapeDtypeStruct((npad, qp), dtype),
            jax.ShapeDtypeStruct((npad, d), dtype),
            jax.ShapeDtypeStruct((ml, qp), dtype),
            jax.ShapeDtypeStruct((qp, ml), dtype),
            jax.ShapeDtypeStruct((1, qp), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((ml, 1), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(-1, 1), z_p, z2_p, alpha_row, logsf2,
      rz3, rpad, dp1y_p, dp2_p)

    # rpad = -.25*log2e*(z2 @ alpha) + mask entered the kernel as data; close
    # its alpha/z chains here: d rpad_j/d alpha_q = -.25*log2e*z_jq^2 and
    # d rpad_j/d z_jq = -.5*log2e*alpha_q*z_jq.
    drp = drpad[:, :1]                                         # (ml, 1)
    dalpha_total = (
        dalpha.reshape(qp)
        + (-0.25 * _LOG2E) * jnp.sum(drp * z2_p, axis=0)
    ).astype(alpha.dtype)
    dz_total = (
        dz[:m] + dzt.T[:m]
        + ((-0.5 * _LOG2E) * (drp * z_p * alpha_row))[:m]
    )
    dsf2 = (dlogsf2[0, 0] / sf2).astype(jnp.asarray(sf2).dtype)
    dw = jnp.zeros_like(w_arr)  # weights treated as non-differentiable data
    return dmu[:n], ds[:n], dz_total, dsf2, dalpha_total, dyw[:n], dw


def _psi_fused_bwd(tile, interpret, res, cots):
    mu, s, z, sf2, alpha, yw, w_arr = res
    dp1y, dp2 = cots
    d = yw.shape[1]
    m = z.shape[0]
    dtype = mu.dtype
    n = mu.shape[0]

    _, ml = _m_dims(m)
    if _use_flat(ml, mu.shape[1], interpret):
        return _call_bwd_flat(
            mu, s, z, sf2, alpha, yw, w_arr, dp1y, dp2, tile, interpret)
    # The backward's h3 reshape (kk, TN·Ms) -> (kk, TN, Ms) is a Mosaic
    # shape cast that only lowers when the new minor dim is lane-aligned,
    # so the backward runs symmetric Ms = Ml (the forward keeps the
    # asymmetric savings). It keeps ~3 (TN, Ms, lc) f32 buffers + 2 bf16
    # splits live; honor the caller's tile whenever that fits VMEM, and
    # lane-chunk the Psi2 path once even the minimum tile would not.
    ms = ml
    # Staircase-triangle kernel where its slab working sets fit VMEM
    # (2 <= nb <= 4 lane blocks); lane-chunked full square beyond.
    use_stair = 2 * 128 <= ml <= _STAIR_ML_LIMIT
    if use_stair:
        tile = _stair_tile(tile, ml)
        lc = ml
    else:
        tile = _fit_tile(tile, ms, ml, _BWD_BUDGET)
        lc = _lane_chunk(tile, ms, ml, _BWD_BUDGET)

    mu_p, s_p, yw_p, w_p, z_p, npad, qp, ml = _pad_inputs(mu, s, yw, w_arr, z, tile)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    dp1y_p = jnp.zeros((ml, d), dtype).at[:m].set(dp1y)
    # Psi2 is symmetric, so only the symmetric part of its cotangent acts;
    # the fused backward exploits G = E * dp2s being symmetric.
    dp2s = 0.5 * (dp2 + dp2.T)
    dp2_p = jnp.zeros((ms, ml), dtype).at[:m, :m].set(dp2s)
    grid = npad // tile

    kk = qp + 1
    zext = jnp.concatenate([z_p, jnp.ones((ml, 1), dtype)], axis=1)
    # Veltkamp rounding, not astype round-trips (see precise._round_bf16).
    zext_hi = _round_bf16(zext)
    # Stacked [z_hi; z_lo]^T rungs, stored bf16.
    zhilo = jnp.concatenate(
        [zext_hi.T, (zext - zext_hi).T], axis=0
    ).astype(jnp.bfloat16)                                # (2(Qp+1), Ml)

    kernel = functools.partial(
        _bwd_kernel_stair if use_stair else _bwd_kernel,
        m_real=m, ms=ms, lc=lc,
    )
    dmu, ds, dyw, dz, dzt, dalpha, dlogsf2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((ml, d), lambda i: (0, 0)),           # dp1y
            pl.BlockSpec((ms, ml), lambda i: (0, 0)),          # dp2s
            pl.BlockSpec((2 * kk, ml), lambda i: (0, 0)),      # [z_hi; z_lo]^T
        ],
        out_specs=[
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # dmu
            pl.BlockSpec((tile, qp), lambda i: (i, 0)),        # ds
            pl.BlockSpec((tile, d), lambda i: (i, 0)),         # dyw
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),          # dz (2-D chains) acc
            pl.BlockSpec((qp, ms), lambda i: (0, 0)),          # dz (direct, transposed) acc
            pl.BlockSpec((1, qp), lambda i: (0, 0)),           # dalpha acc
            pl.BlockSpec((1, 1), lambda i: (0, 0)),            # dlogsf2 acc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, qp), dtype),
            jax.ShapeDtypeStruct((npad, qp), dtype),
            jax.ShapeDtypeStruct((npad, d), dtype),
            jax.ShapeDtypeStruct((ml, qp), dtype),
            jax.ShapeDtypeStruct((qp, ms), dtype),
            jax.ShapeDtypeStruct((1, qp), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(-1, 1), z_p, z2_p, alpha_row, logsf2,
      dp1y_p, dp2_p, zhilo)

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


# ---------------------------------------------------------------------------
# (Q, N)-native entry points: the single-chip large-N path. XLA:TPU tiles
# f32 HBM arrays to (8, 128), so any (N, Q<=10) array physically occupies
# 12.8x its logical bytes — at N=1e7 that is ~4.8 GB PER ARRAY and the seven
# N-sized tensors of a bound+grad eval overflow one chip's HBM. Stored and
# consumed (Q, N)/(D, N), the pad is a 1.6x sublane roundup instead, and the
# same eval fits comfortably (docs/DESIGN.md §5). Flat-basis kernels only
# (2 <= Ml/128 blocks <= 4 covers the M=200..500 baseline shapes).
# ---------------------------------------------------------------------------


def _call_fwd_flat_t(mu_t, s_t, z, sf2, alpha, yw_t, w_arr, tile, interpret):
    d = yw_t.shape[0]
    m = z.shape[0]
    dtype = mu_t.dtype
    _, ml = _m_dims(m)
    lb = 128
    st = _flat_subtile(
        _flat_tile(tile if interpret else 256, ml, _FLAT_FWD_ELEMS))
    mu_p, s_p, yw_p, w_p, z_p, npad, qp, ml = _pad_inputs_t(
        mu_t, s_t, yw_t, w_arr, z, lb)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    rz3, rpad = _rz3_inputs(z_p, z2_p, alpha_row, m)
    kx = 3 * qp + 2
    kernel = functools.partial(_fwd_kernel_flat_t, m_real=m, st=st,
                               interpret=interpret)
    p1y, p2 = pl.pallas_call(
        kernel,
        grid=(npad // lb, lb // st),
        in_specs=[
            pl.BlockSpec((qp, lb), lambda i, j: (0, i)),       # mu^T
            pl.BlockSpec((qp, lb), lambda i, j: (0, i)),       # s^T
            pl.BlockSpec((d, lb), lambda i, j: (0, i)),        # yw^T
            pl.BlockSpec((1, lb), lambda i, j: (0, i)),        # w
            pl.BlockSpec((ml, qp), lambda i, j: (0, 0)),       # z
            pl.BlockSpec((ml, qp), lambda i, j: (0, 0)),       # z2
            pl.BlockSpec((1, qp), lambda i, j: (0, 0)),        # alpha
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),         # log sf2
            pl.BlockSpec((3 * kx, ml), lambda i, j: (0, 0)),   # rz3 rungs
            pl.BlockSpec((ml, 1), lambda i, j: (0, 0)),        # rpad
        ],
        out_specs=[
            pl.BlockSpec((ml, d), lambda i, j: (0, 0)),
            pl.BlockSpec((ml, ml), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ml, d), dtype),
            jax.ShapeDtypeStruct((ml, ml), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(1, -1), z_p, z2_p, alpha_row, logsf2,
      rz3, rpad)
    p2 = _mirror_blockdiag(p2, ml, dtype)
    return p1y[:m], p2[:m, :m]


def _call_bwd_flat_t(mu_t, s_t, z, sf2, alpha, yw_t, w_arr, dp1y, dp2, tile,
                     interpret):
    d = yw_t.shape[0]
    m = z.shape[0]
    dtype = mu_t.dtype
    n = mu_t.shape[1]
    _, ml = _m_dims(m)
    lb = 128
    st = _flat_subtile(
        _flat_tile(tile if interpret else 256, ml, _FLAT_BWD_ELEMS))
    mu_p, s_p, yw_p, w_p, z_p, npad, qp, ml = _pad_inputs_t(
        mu_t, s_t, yw_t, w_arr, z, lb)
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    rz3, rpad = _rz3_inputs(z_p, z2_p, alpha_row, m)
    dp1y_p = jnp.zeros((ml, d), dtype).at[:m].set(dp1y)
    dp2s = 0.5 * (dp2 + dp2.T)
    dp2_p = jnp.zeros((ml, ml), dtype).at[:m, :m].set(dp2s)
    kx = 3 * qp + 2
    kernel = functools.partial(_bwd_kernel_flat_t, m_real=m, st=st,
                               interpret=interpret)
    # The fori carries + transposed block copies sit ~120K above the 16M
    # default scoped-vmem limit at st=64/Ml=256; a 2M bump keeps st=64
    # (halving st to 32 costs real MXU contraction depth, and the playbook's
    # "bigger limits hurt pipelining" finding was for 100M, not this).
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=18 * 1024 * 1024)
    dmu, ds, dyw, dz, dzt, dalpha, dlogsf2, drpad = pl.pallas_call(
        kernel,
        grid=(npad // lb,),
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((qp, lb), lambda i: (0, i)),
            pl.BlockSpec((qp, lb), lambda i: (0, i)),
            pl.BlockSpec((d, lb), lambda i: (0, i)),
            pl.BlockSpec((1, lb), lambda i: (0, i)),
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, qp), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((3 * kx, ml), lambda i: (0, 0)),      # rz3 rungs
            pl.BlockSpec((ml, 1), lambda i: (0, 0)),           # rpad
            pl.BlockSpec((ml, d), lambda i: (0, 0)),           # dp1y
            pl.BlockSpec((ml, ml), lambda i: (0, 0)),          # dp2s
        ],
        out_specs=[
            pl.BlockSpec((qp, lb), lambda i: (0, i)),          # dmu^T
            pl.BlockSpec((qp, lb), lambda i: (0, i)),          # ds^T
            pl.BlockSpec((d, lb), lambda i: (0, i)),           # dyw^T
            pl.BlockSpec((ml, qp), lambda i: (0, 0)),          # dz (2-D) acc
            pl.BlockSpec((qp, ml), lambda i: (0, 0)),          # dz (direct)^T
            pl.BlockSpec((1, qp), lambda i: (0, 0)),           # dalpha acc
            pl.BlockSpec((1, 1), lambda i: (0, 0)),            # dlogsf2 acc
            pl.BlockSpec((ml, 1), lambda i: (0, 0)),           # drpad acc
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, npad), dtype),
            jax.ShapeDtypeStruct((qp, npad), dtype),
            jax.ShapeDtypeStruct((d, npad), dtype),
            jax.ShapeDtypeStruct((ml, qp), dtype),
            jax.ShapeDtypeStruct((qp, ml), dtype),
            jax.ShapeDtypeStruct((1, qp), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((ml, 1), dtype),
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(1, -1), z_p, z2_p, alpha_row, logsf2,
      rz3, rpad, dp1y_p, dp2_p)

    # Close rpad's alpha/z chains, exactly as _call_bwd_flat.
    drp = drpad[:, :1]                                         # (ml, 1)
    dalpha_total = (
        dalpha.reshape(qp)
        + (-0.25 * _LOG2E) * jnp.sum(drp * z2_p, axis=0)
    ).astype(alpha.dtype)
    dz_total = (
        dz[:m] + dzt.T[:m]
        + ((-0.5 * _LOG2E) * (drp * z_p * alpha_row))[:m]
    )
    dsf2 = (dlogsf2[0, 0] / sf2).astype(jnp.asarray(sf2).dtype)
    dw = jnp.zeros_like(w_arr)  # weights treated as non-differentiable data
    return (dmu[:, :n], ds[:, :n], dz_total, dsf2, dalpha_total,
            dyw[:, :n], dw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def psi_fused_t(mu_t, s_t, z, sf2, alpha, yw_t, w_arr, tile: int = 32,
                interpret: bool = False):
    """(Q, N)-native psi_fused: mu_t/s_t are (Q, N), yw_t is (D, N); the
    cotangents of the N-sized inputs come back in the same transposed layout
    (no (N, small) array exists anywhere in the forward OR backward).
    Flat-basis shapes only — callers route via suff_stats_t."""
    out, _ = _psi_fused_t_fwd(mu_t, s_t, z, sf2, alpha, yw_t, w_arr, tile,
                              interpret)
    return out


def _psi_fused_t_fwd(mu_t, s_t, z, sf2, alpha, yw_t, w_arr, tile, interpret):
    out = _call_fwd_flat_t(mu_t, s_t, z, sf2, alpha, yw_t, w_arr, tile,
                           interpret)
    return out, (mu_t, s_t, z, sf2, alpha, yw_t, w_arr)


def _psi_fused_t_bwd(tile, interpret, res, cots):
    mu_t, s_t, z, sf2, alpha, yw_t, w_arr = res
    dp1y, dp2 = cots
    return _call_bwd_flat_t(
        mu_t, s_t, z, sf2, alpha, yw_t, w_arr, dp1y, dp2, tile, interpret)


psi_fused_t.defvjp(_psi_fused_t_fwd, _psi_fused_t_bwd)


def _psi_fused_chunked(mu, s, z, sf2, alpha, yw, w, tile, interpret, plan):
    """Accumulate psi_fused over equal N-chunks (row-major layout) so no
    single pallas_call exceeds the hardware-proven per-call N for its Ml
    class (_chunk_plan). Chunk-padding rows follow the _pad_inputs
    contract (mu/s ones, y/w zeros) and contribute exactly zero."""
    nb, block = plan
    n, q = mu.shape
    m = z.shape[0]
    d = yw.shape[1]
    npad = nb * block
    if npad != n:
        pad = npad - n
        ones = jnp.ones((pad, q), mu.dtype)
        mu = jnp.concatenate([mu, ones], 0)
        s = jnp.concatenate([s, ones], 0)
        yw = jnp.concatenate([yw, jnp.zeros((pad, d), yw.dtype)], 0)
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)], 0)
    xs = (
        mu.reshape(nb, block, q),
        s.reshape(nb, block, q),
        yw.reshape(nb, block, d),
        w.reshape(nb, block),
    )

    def body(carry, x):
        mu_b, s_b, yw_b, w_b = x
        a, b = psi_fused(mu_b, s_b, z, sf2, alpha, yw_b, w_b, tile, interpret)
        return (carry[0] + a, carry[1] + b), None

    init = (jnp.zeros((m, d), mu.dtype), jnp.zeros((m, m), mu.dtype))
    (p1y, p2), _ = jax.lax.scan(body, init, xs)
    return p1y, p2


def _psi_fused_t_chunked(mu_t, s_t, z, sf2, alpha, yw_t, w, tile, interpret,
                         plan):
    """(Q, N)-layout twin of _psi_fused_chunked: chunks slice axis 1, the
    (nb, Q, block) re-layout is ONE compact HBM copy (never an (N, small)
    lane-padded array — the layout's invariant holds through the scan)."""
    nb, block = plan
    q, n = mu_t.shape
    m = z.shape[0]
    d = yw_t.shape[0]
    npad = nb * block
    if npad != n:
        pad = npad - n
        ones = jnp.ones((q, pad), mu_t.dtype)
        mu_t = jnp.concatenate([mu_t, ones], 1)
        s_t = jnp.concatenate([s_t, ones], 1)
        yw_t = jnp.concatenate([yw_t, jnp.zeros((d, pad), yw_t.dtype)], 1)
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)], 0)
    xs = (
        jnp.swapaxes(mu_t.reshape(q, nb, block), 0, 1),
        jnp.swapaxes(s_t.reshape(q, nb, block), 0, 1),
        jnp.swapaxes(yw_t.reshape(d, nb, block), 0, 1),
        w.reshape(nb, block),
    )

    def body(carry, x):
        mu_b, s_b, yw_b, w_b = x
        a, b = psi_fused_t(mu_b, s_b, z, sf2, alpha, yw_b, w_b, tile,
                           interpret)
        return (carry[0] + a, carry[1] + b), None

    init = (jnp.zeros((m, d), mu_t.dtype), jnp.zeros((m, m), mu_t.dtype))
    (p1y, p2), _ = jax.lax.scan(body, init, xs)
    return p1y, p2


def suff_stats_t(
    y_t, mu_t, s_t, z, sf2, alpha,
    weights=None, tile: int = 32, interpret: bool = None,
) -> SufficientStats:
    """suff_stats in the (Q, N)/(D, N) storage layout (GPLVMConfig
    layout='qn'): identical statistics, but no N-sized tensor is ever
    materialized in the lane-padded (N, small) form. Shapes outside the
    flat-basis window (Ml/128 not in 2..4) fall back to the (N, Q) kernels
    via an explicit transpose — correct, but paying the padded layout."""
    if s_t is None:
        raise ValueError(
            "SGPR (s=None) statistics are plain MXU matmuls; use psi.suff_stats"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = y_t.shape[1]
    w = jnp.ones((n,), y_t.dtype) if weights is None else weights
    n_f = jnp.sum(w)
    yy = jnp.sum((y_t * y_t) * w[None, :])
    psi0 = n_f * sf2
    kl = 0.5 * jnp.sum(
        jnp.sum(mu_t * mu_t + s_t - jnp.log(s_t) - 1.0, axis=0) * w)
    if qn_native_ok(z.shape[0], mu_t.shape[0], interpret):
        plan = _chunk_plan(n, _m_dims(z.shape[0])[1])
        if plan is None:
            p1y, p2 = psi_fused_t(mu_t, s_t, z, sf2, alpha, y_t, w, tile,
                                  interpret)
        else:
            p1y, p2 = _psi_fused_t_chunked(mu_t, s_t, z, sf2, alpha, y_t, w,
                                           tile, interpret, plan)
    else:
        p1y, p2 = psi_fused(mu_t.T, s_t.T, z, sf2, alpha, y_t.T, w, tile,
                            interpret)
    return SufficientStats(psi0, p1y, p2, yy, kl, n_f)


def suff_stats(
    y, mu, s, z, sf2, alpha,
    weights=None, tile: int = 32, interpret: bool = None,
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
    plan = _chunk_plan(n, _m_dims(z.shape[0])[1])
    if plan is None:
        p1y, p2 = psi_fused(mu, s, z, sf2, alpha, y, w, tile, interpret)
    else:
        p1y, p2 = _psi_fused_chunked(mu, s, z, sf2, alpha, y, w, tile,
                                     interpret, plan)
    return SufficientStats(psi0, p1y, p2, yy, kl, n_f)
