"""Psi-statistics (Gaussian expectations of the ARD-RBF kernel) — pure JAX.

This is the mathematical core of the framework and the autodiff *oracle* for
the fused Pallas kernel in ``psi_pallas.py``. It re-designs the reference's
``partial_terms.py`` psi-statistic code (SURVEY.md §2 [C-HIGH], statistic names
``exp_K_ii``/``exp_K_mi``/``exp_K_mi_K_im`` [C-MED]) for XLA:

  * closed forms are written as large batched matmuls + elementwise exp so XLA
    tiles them onto the MXU/VPU,
  * all derivatives (the reference hand-codes dF/d{Z, alpha, sf2, beta, mu, s})
    come from ``jax.grad`` of these forward evaluations,
  * the O(N·M²) Psi2 accumulation is available in a blocked ``lax.scan`` form
    with rematerialization so memory stays O(block·M²) for arbitrary N.

Definitions (q(x_n) = N(mu_n, diag(s_n)), SURVEY.md Appendix A — numerically
verified against Monte-Carlo in the survey session):

  psi0        = sum_n <k(x_n, x_n)>           = N * sf2
  Psi1[n, m]  = <k(x_n, z_m)>
              = sf2 * prod_q (alpha_q s_nq + 1)^(-1/2)
                    * exp(-1/2 alpha_q (mu_nq - z_mq)^2 / (alpha_q s_nq + 1))
  Psi2[m, m'] = sum_n <k(x_n, z_m) k(x_n, z_m')>
              = sum_n sf2^2 * prod_q (2 alpha_q s_nq + 1)^(-1/2)
                  * exp(- alpha_q (zb_q - mu_nq)^2 / (2 alpha_q s_nq + 1)
                        - 1/4 alpha_q (z_mq - z_m'q)^2),   zb = (z_m + z_m')/2

In the s -> 0 limit: Psi1 -> K_NM, Psi2 -> K_NM^T K_NM, psi0 -> N sf2 (used by
the SGPR fixed-inputs path, where no expectations are needed at all).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gparml_tpu.ops import ard_rbf


class SufficientStats(NamedTuple):
    """Per-shard (or global, after psum) sufficient statistics of the bound.

    These are exactly the quantities the reference's MapReduce layer sums over
    partitions (``local_MapReduce.py`` reduce step, SURVEY.md §3.4): every
    field is a plain sum over data points n, so the decomposition is exact
    under any partition of N.
    """

    psi0: jnp.ndarray     # () : sum_n <k_nn>
    psi1_y: jnp.ndarray   # (M, D) : Psi1^T Y
    psi2: jnp.ndarray     # (M, M) : sum_n Psi2_n
    yy: jnp.ndarray       # () : sum_{n,d} Y[n,d]^2
    kl: jnp.ndarray       # () : KL(q(X) || N(0, I)) partial sum
    n: jnp.ndarray        # () : number of data points (constant wrt params)

    def __add__(self, other: "SufficientStats") -> "SufficientStats":
        return jax.tree.map(jnp.add, self, other)


def psi1(mu: jnp.ndarray, s: jnp.ndarray, z: jnp.ndarray, sf2, alpha) -> jnp.ndarray:
    """Psi1 matrix, shape (N, M)."""
    denom = alpha * s + 1.0                          # (N, Q)
    log_norm = -0.5 * jnp.sum(jnp.log(denom), axis=-1)   # (N,)
    c = alpha / denom                                 # (N, Q)
    # -1/2 sum_q c_nq (mu_nq - z_mq)^2
    #   = -1/2 [ sum_q c mu^2 - 2 sum_q c mu z + sum_q c z^2 ]
    cm2 = jnp.sum(c * mu * mu, axis=-1)               # (N,)
    cmz = jnp.matmul(c * mu, z.T, precision='highest')  # (N, M)
    cz2 = jnp.matmul(c, (z * z).T, precision='highest') # (N, M)
    quad = -0.5 * (cm2[:, None] - 2.0 * cmz + cz2)
    return sf2 * jnp.exp(log_norm[:, None] + quad)


def psi2_sum(
    mu: jnp.ndarray, s: jnp.ndarray, z: jnp.ndarray, sf2, alpha,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """sum_n w_n * Psi2_n, shape (M, M). Materializes (N, M, M) — small N only.

    Decomposition used (also the shape of the Pallas kernel):
      log Psi2[n,m,m'] = const_n + v_n[m] + v_n[m'] - 1/2 B_n[m,m'] + E0[m,m']
    with c_nq = alpha_q / (2 alpha_q s_nq + 1):
      E0[m,m']  = -1/4 sum_q alpha_q (z_mq - z_m'q)^2        (n-independent)
      B_n[m,m'] = sum_q c_nq z_mq z_m'q                      (per-n MXU matmul)
      v_n[m]    = -1/4 sum_q c_nq z_mq^2 + 1/2 sum_q c_nq mu_nq z_mq ... see below
    """
    log_e0, const_n, v, c = _psi2_pieces(mu, s, z, sf2, alpha)
    # B_n[m,m'] = sum_q c_nq z_mq z_m'q : batched matmul (N,M,M). NOTE: plain
    # einsum at HIGHEST, not the compensated split — in HBM-streamed XLA land
    # the split's materialized operands cost far more than the extra MXU
    # passes (the split only pays inside the VMEM-resident Pallas kernel).
    b = jnp.einsum("nq,mq,pq->nmp", c, z, z, precision="highest")
    log_psi2 = (
        const_n[:, None, None]
        + v[:, :, None]
        + v[:, None, :]
        - 0.5 * b
        + log_e0[None, :, :]
    )
    p2 = jnp.exp(log_psi2)
    if weights is not None:
        p2 = p2 * weights[:, None, None]
    return jnp.sum(p2, axis=0)


def _psi2_pieces(mu, s, z, sf2, alpha):
    """Shared scalar/vector pieces of the Psi2 decomposition.

    Returns (log_e0 (M,M), const_n (N,), v (N,M), c (N,Q)).

    Derivation: with a=alpha_q, den = 2 a s + 1, c = a/den, u=z_mq, w=z_m'q,
      -a(zb - mu)^2/den - a/4 (u-w)^2
      = -(c/4)(u^2 + w^2 + 2uw) + c mu (u + w) - c mu^2 - (a/4)(u^2 + w^2 - 2uw)
      = [-(c+a)/4 u^2 + c mu u] + [same in w] + ((a - c)/2) u w - c mu^2
    and (a - c)/2 = a^2 s / den / ... note a - c = a(1 - 1/den) = 2 a^2 s/den,
    so the uw coefficient is a^2 s / den. We fold the n-independent -a/4 u w
    ... instead we keep E0 = -1/4 a (u - w)^2 verbatim and define
      B_n[m,m'] = sum_q c_nq u w   (so -1/2 B_n + E0 reproduces the cross terms:
      E0 contributes +a/2 uw and -a/4(u^2+w^2); -c/4(u^2+w^2) - c/2 uw from the
      first factor; total uw coeff = (a - c)/2 ✓, total u^2 coeff = -(a+c)/4 ✓).
      v_n[m]    = -1/4 sum_q c_nq u^2 + sum_q c_nq mu_nq u
      const_n   = 2 log sf2 - 1/2 sum_q log den_nq - sum_q c_nq mu_nq^2
    """
    den = 2.0 * alpha * s + 1.0                       # (N, Q)
    c = alpha / den                                   # (N, Q)
    log_e0 = -0.25 * ard_rbf.sq_dist(z, z, alpha)     # (M, M)
    const_n = (
        2.0 * jnp.log(sf2)
        - 0.5 * jnp.sum(jnp.log(den), axis=-1)
        - jnp.sum(c * mu * mu, axis=-1)
    )                                                 # (N,)
    v = -0.25 * jnp.matmul(c, (z * z).T, precision='highest') + jnp.matmul(c * mu, z.T, precision='highest')  # (N, M)
    return log_e0, const_n, v, c


def kl_qp(
    mu: jnp.ndarray, s: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """KL( prod_n N(mu_n, diag(s_n)) || N(0, I) ), a plain sum over (n, q)."""
    per_n = 0.5 * jnp.sum(mu * mu + s - jnp.log(s) - 1.0, axis=-1)
    if weights is not None:
        per_n = per_n * weights
    return jnp.sum(per_n)


def suff_stats(
    y: jnp.ndarray,
    mu: jnp.ndarray,
    s: Optional[jnp.ndarray],
    z: jnp.ndarray,
    sf2,
    alpha,
    block: Optional[int] = None,
    weights: Optional[jnp.ndarray] = None,
    vary_axis: Optional[str] = None,
) -> SufficientStats:
    """Sufficient statistics {psi0, Psi1^T Y, sum Psi2, sum y^2, KL, n}.

    Args:
      y: (N, D) observations.
      mu: (N, Q) variational means (GPLVM) or observed inputs X (SGPR).
      s: (N, Q) variational variances, or None for the SGPR fixed-inputs path
         (the exact s=0 limit: Psi1 = K_NM, Psi2 = K_NM^T K_NM, KL = 0).
      z: (M, Q) inducing inputs.
      sf2, alpha: kernel hypers (positive; alpha shape (Q,)).
      block: if given, accumulate Psi2 over N-blocks of this size via
         lax.scan + remat (O(block·M²) memory, any N). N must be a multiple.
      weights: optional (N,) per-point weights (0/1 masks for padded shards,
         or fractional weights for minibatch scaling). All statistics become
         sum_n w_n * (...); ``n`` becomes sum_n w_n.
      vary_axis: mesh axis name when called inside a shard_map body with
         varying-manual-axes checking on — the blocked scan's zero init must
         be marked device-varying (lax.pvary) to type-match the carry.

    Returns SufficientStats with dtype following the inputs.
    """
    n = y.shape[0]
    if weights is None:
        n_f = jnp.asarray(n, dtype=y.dtype)
        yw = y
        yy = jnp.sum(y * y)
    else:
        n_f = jnp.sum(weights)
        yw = y * weights[:, None]
        yy = jnp.sum(yw * y)
    psi0 = n_f * sf2

    if s is None:
        kl = jnp.zeros((), dtype=y.dtype)
        if block is None or block >= n:
            knm = ard_rbf.k(mu, z, sf2, alpha)
            p1y = jnp.matmul(knm.T, yw, precision='highest')
            knm_w = knm if weights is None else knm * jnp.sqrt(weights)[:, None]
            p2 = jnp.matmul(knm_w.T, knm_w, precision='highest')
            return SufficientStats(psi0, p1y, p2, yy, kl, n_f)
        # Blocked SGPR statistics: K_NM never materializes beyond one
        # (block, M) slab — O(block·M) memory at any N (the s=0 analogue of
        # the GPLVM blocked scan below).
        if n % block != 0:
            raise ValueError(f"N={n} must be a multiple of block={block}")
        m = z.shape[0]
        d = y.shape[1]
        nb = n // block
        w = jnp.ones((n,), dtype=y.dtype) if weights is None else weights

        @jax.checkpoint
        def body(carry, xs):
            p1y_acc, p2_acc = carry
            yb, mub, wb = xs
            knm = ard_rbf.k(mub, z, sf2, alpha)
            p1y_b = jnp.matmul(knm.T, yb * wb[:, None], precision='highest')
            knm_w = knm * jnp.sqrt(wb)[:, None]
            p2_b = jnp.matmul(knm_w.T, knm_w, precision='highest')
            return (p1y_acc + p1y_b, p2_acc + p2_b), None

        xs = (
            y.reshape(nb, block, d),
            mu.reshape(nb, block, mu.shape[1]),
            w.reshape(nb, block),
        )
        init = (
            jnp.zeros((m, d), dtype=y.dtype),
            jnp.zeros((m, m), dtype=y.dtype),
        )
        if vary_axis is not None:
            if hasattr(jax.lax, "pcast"):
                init = jax.lax.pcast(init, vary_axis, to="varying")
            else:
                init = jax.lax.pvary(init, vary_axis)
        (p1y, p2), _ = jax.lax.scan(body, init, xs)
        return SufficientStats(psi0, p1y, p2, yy, kl, n_f)

    kl = kl_qp(mu, s, weights)
    if block is None or block >= n:
        p1 = psi1(mu, s, z, sf2, alpha)
        p1y = jnp.matmul(p1.T, yw, precision='highest')
        p2 = psi2_sum(mu, s, z, sf2, alpha, weights)
        return SufficientStats(psi0, p1y, p2, yy, kl, n_f)

    if n % block != 0:
        raise ValueError(f"N={n} must be a multiple of block={block}")

    m = z.shape[0]
    d = y.shape[1]
    nb = n // block
    w = jnp.ones((n,), dtype=y.dtype) if weights is None else weights

    @jax.checkpoint
    def body(carry, xs):
        p1y_acc, p2_acc = carry
        yb, mub, sb, wb = xs
        p1b = psi1(mub, sb, z, sf2, alpha)
        p2b = psi2_sum(mub, sb, z, sf2, alpha, wb)
        return (p1y_acc + jnp.matmul(p1b.T, yb * wb[:, None], precision='highest'), p2_acc + p2b), None

    xs = (
        y.reshape(nb, block, d),
        mu.reshape(nb, block, mu.shape[1]),
        s.reshape(nb, block, s.shape[1]),
        w.reshape(nb, block),
    )
    init = (
        jnp.zeros((m, d), dtype=y.dtype),
        jnp.zeros((m, m), dtype=y.dtype),
    )
    if vary_axis is not None:
        # jax.lax.pvary is deprecated in favor of pcast(..., to='varying');
        # support both so the sharded scan path survives JAX upgrades.
        if hasattr(jax.lax, "pcast"):
            init = jax.lax.pcast(init, vary_axis, to="varying")
        else:
            init = jax.lax.pvary(init, vary_axis)
    (p1y, p2), _ = jax.lax.scan(body, init, xs)
    return SufficientStats(psi0, p1y, p2, yy, kl, n_f)


def suff_stats_t(
    y_t: jnp.ndarray,
    mu_t: jnp.ndarray,
    s_t: jnp.ndarray,
    z: jnp.ndarray,
    sf2,
    alpha,
    block: Optional[int] = None,
    weights: Optional[jnp.ndarray] = None,
) -> SufficientStats:
    """(Q, N)-native sufficient statistics via the blocked XLA scan.

    The XLA engine for GPLVMConfig(layout='qn', y_layout='dn'): inputs are
    stored transposed — y_t (D, N), mu_t/s_t (Q, N) — so no array ever pays
    XLA:TPU's 12.8x lane-padding of (N, small) tensors (docs/DESIGN.md §5).
    Each scan step transposes ONE (Q, block) slab into row-major form and
    reuses the psi1/psi2_sum math verbatim; the transient (block, Q) slab is
    O(block·128) padded bytes, independent of N. This is the correct any-M
    fallback for the shapes outside the Pallas flat window (Ml < 256 or
    M > the pallas engine limit) at single-chip N where a whole-array
    transpose would not fit HBM.

    ``s_t=None`` is the SGPR (observed inputs, s ≡ 0) mode: mu_t is the
    transposed X, Psi1 = K_NM / Psi2 = K_NM^T K_NM accumulate per block.
    """
    q, n = mu_t.shape
    d = y_t.shape[0]
    if weights is None:
        n_f = jnp.asarray(n, dtype=y_t.dtype)
        w = None
        yy = jnp.sum(y_t * y_t)
    else:
        n_f = jnp.sum(weights)
        w = weights
        yy = jnp.sum((y_t * weights[None, :]) * y_t)
    psi0 = n_f * sf2

    if s_t is None:
        kl = jnp.zeros((), dtype=y_t.dtype)
    else:
        per_n = 0.5 * jnp.sum(mu_t * mu_t + s_t - jnp.log(s_t) - 1.0, axis=0)
        kl = jnp.sum(per_n if w is None else per_n * w)

    if block is None or block >= n:
        mu = mu_t.T
        yw = y_t.T if w is None else (y_t * w[None, :]).T
        if s_t is None:
            knm = ard_rbf.k(mu, z, sf2, alpha)
            p1y = jnp.matmul(knm.T, yw, precision="highest")
            knm_w = knm if w is None else knm * jnp.sqrt(w)[:, None]
            p2 = jnp.matmul(knm_w.T, knm_w, precision="highest")
        else:
            s = s_t.T
            p1 = psi1(mu, s, z, sf2, alpha)
            p1y = jnp.matmul(p1.T, yw, precision="highest")
            p2 = psi2_sum(mu, s, z, sf2, alpha, w)
        return SufficientStats(psi0, p1y, p2, yy, kl, n_f)

    if n % block != 0:
        raise ValueError(f"N={n} must be a multiple of block={block}")

    m = z.shape[0]
    nb = n // block
    w_full = jnp.ones((n,), dtype=y_t.dtype) if w is None else w

    @jax.checkpoint
    def body(carry, xs):
        p1y_acc, p2_acc = carry
        if s_t is None:
            ybt, mubt, wb = xs
            knm = ard_rbf.k(mubt.T, z, sf2, alpha)
            p1yb = jnp.matmul(knm.T, (ybt * wb[None, :]).T,
                              precision="highest")
            knm_w = knm * jnp.sqrt(wb)[:, None]
            p2b = jnp.matmul(knm_w.T, knm_w, precision="highest")
        else:
            ybt, mubt, sbt, wb = xs
            mub, sb = mubt.T, sbt.T
            p1b = psi1(mub, sb, z, sf2, alpha)
            p2b = psi2_sum(mub, sb, z, sf2, alpha, wb)
            p1yb = jnp.matmul(p1b.T, (ybt * wb[None, :]).T,
                              precision="highest")
        return (p1y_acc + p1yb, p2_acc + p2b), None

    # (Q, N) -> (nb, Q, block): one HBM copy of the COMPACT transposed form
    # (1.6x sublane pad), never the 12.8x padded row-major array.
    xs = (
        jnp.swapaxes(y_t.reshape(d, nb, block), 0, 1),
        jnp.swapaxes(mu_t.reshape(q, nb, block), 0, 1),
    )
    if s_t is not None:
        xs = xs + (jnp.swapaxes(s_t.reshape(q, nb, block), 0, 1),)
    xs = xs + (w_full.reshape(nb, block),)
    init = (
        jnp.zeros((m, d), dtype=y_t.dtype),
        jnp.zeros((m, m), dtype=y_t.dtype),
    )
    (p1y, p2), _ = jax.lax.scan(body, init, xs)
    return SufficientStats(psi0, p1y, p2, yy, kl, n_f)
