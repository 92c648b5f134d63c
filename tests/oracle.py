"""Float64 NumPy oracle: an independent, naive implementation of the math in
SURVEY.md Appendix A. Deliberately written with direct loops/einsums and the
direct A-form bound (vs the package's B-form) so that agreement is meaningful.
This plays the role of the reference implementation for numeric-parity gates
(1e-6 rtol on CPU x64), standing in for GParML itself (reference mount empty —
see SURVEY.md EVIDENCE STATUS)."""

import numpy as np


def kern(x1, x2, sf2, alpha):
    d2 = np.zeros((x1.shape[0], x2.shape[0]))
    for q in range(x1.shape[1]):
        d2 += alpha[q] * (x1[:, q : q + 1] - x2[None, :, q]) ** 2
    return sf2 * np.exp(-0.5 * d2)


def psi0(n, sf2):
    return n * sf2


def psi1(mu, s, z, sf2, alpha):
    n, q = mu.shape
    m = z.shape[0]
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            val = sf2
            for k in range(q):
                den = alpha[k] * s[i, k] + 1.0
                val *= den ** -0.5 * np.exp(
                    -0.5 * alpha[k] * (mu[i, k] - z[j, k]) ** 2 / den
                )
            out[i, j] = val
    return out


def psi2(mu, s, z, sf2, alpha):
    """(N, M, M) per-point Psi2 tensor, direct formula."""
    n, q = mu.shape
    m = z.shape[0]
    out = np.zeros((n, m, m))
    for i in range(n):
        for j in range(m):
            for jp in range(m):
                val = sf2**2
                for k in range(q):
                    den = 2.0 * alpha[k] * s[i, k] + 1.0
                    zb = 0.5 * (z[j, k] + z[jp, k])
                    val *= den ** -0.5 * np.exp(
                        -alpha[k] * (zb - mu[i, k]) ** 2 / den
                        - 0.25 * alpha[k] * (z[j, k] - z[jp, k]) ** 2
                    )
                out[i, j, jp] = val
    return out


def kl(mu, s):
    return 0.5 * np.sum(mu**2 + s - np.log(s) - 1.0)


def bound(y, mu, s, z, sf2, alpha, beta, jitter=1e-6):
    """Collapsed bound, direct A-form (A = Kmm + beta*Psi2)."""
    n, d = y.shape
    m = z.shape[0]
    if s is None:
        p1 = kern(mu, z, sf2, alpha)
        p2s = p1.T @ p1
        p0 = psi0(n, sf2)
        kl_term = 0.0
    else:
        p1 = psi1(mu, s, z, sf2, alpha)
        p2s = psi2(mu, s, z, sf2, alpha).sum(axis=0)
        p0 = psi0(n, sf2)
        kl_term = kl(mu, s)

    kmm = kern(z, z, sf2, alpha) + jitter * sf2 * np.eye(m)
    a = kmm + beta * p2s
    sign_k, logdet_k = np.linalg.slogdet(kmm)
    sign_a, logdet_a = np.linalg.slogdet(a)
    assert sign_k > 0 and sign_a > 0
    c = p1.T @ y  # (M, D)
    quad = np.trace(np.linalg.solve(a, c @ c.T))
    tr_kinv_psi2 = np.trace(np.linalg.solve(kmm, p2s))

    f = (
        -0.5 * n * d * np.log(2.0 * np.pi)
        + 0.5 * n * d * np.log(beta)
        + 0.5 * d * logdet_k
        - 0.5 * d * logdet_a
        - 0.5 * beta * np.sum(y**2)
        - 0.5 * beta * d * p0
        + 0.5 * beta * d * tr_kinv_psi2
        + 0.5 * beta**2 * quad
        - kl_term
    )
    return f


def dense_gp_loglik(y, x, sf2, alpha, beta):
    """Exact dense GP marginal log-likelihood (for the Z=X, s->0 sanity limit)."""
    n, d = y.shape
    k = kern(x, x, sf2, alpha) + (1.0 / beta) * np.eye(n)
    sign, logdet = np.linalg.slogdet(k)
    assert sign > 0
    ll = -0.5 * n * d * np.log(2 * np.pi) - 0.5 * d * logdet
    ll -= 0.5 * np.trace(y.T @ np.linalg.solve(k, y))
    return ll
