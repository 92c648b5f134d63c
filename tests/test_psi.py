"""Psi-statistics parity vs the float64 oracle + structural identities.

Covers the reference's most important validation idea (SURVEY.md §4 item 1-2):
closed forms checked against an independent implementation, plus the s->0
limits Psi1 -> K_NM, Psi2 -> K_NM^T K_NM."""

import numpy as np
import jax.numpy as jnp

from gparml_tpu.ops import ard_rbf, psi
from tests import oracle
from tests.conftest import make_problem

RTOL = 1e-9


def test_kernel_matches_oracle(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng)
    got = ard_rbf.k(jnp.asarray(mu), jnp.asarray(z), sf2, jnp.asarray(alpha))
    want = oracle.kern(mu, z, sf2, alpha)
    np.testing.assert_allclose(got, want, rtol=RTOL)


def test_psi1_matches_oracle(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng)
    got = psi.psi1(jnp.asarray(mu), jnp.asarray(s), jnp.asarray(z), sf2, jnp.asarray(alpha))
    want = oracle.psi1(mu, s, z, sf2, alpha)
    np.testing.assert_allclose(got, want, rtol=RTOL)


def test_psi2_matches_oracle(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng)
    got = psi.psi2_sum(jnp.asarray(mu), jnp.asarray(s), jnp.asarray(z), sf2, jnp.asarray(alpha))
    want = oracle.psi2(mu, s, z, sf2, alpha).sum(axis=0)
    np.testing.assert_allclose(got, want, rtol=RTOL)


def test_kl_matches_oracle(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng)
    got = psi.kl_qp(jnp.asarray(mu), jnp.asarray(s))
    np.testing.assert_allclose(got, oracle.kl(mu, s), rtol=RTOL)


def test_s_to_zero_limits(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng)
    s0 = np.full_like(mu, 1e-14)
    knm = ard_rbf.k(jnp.asarray(mu), jnp.asarray(z), sf2, jnp.asarray(alpha))
    p1 = psi.psi1(jnp.asarray(mu), jnp.asarray(s0), jnp.asarray(z), sf2, jnp.asarray(alpha))
    np.testing.assert_allclose(p1, knm, rtol=1e-7)
    p2 = psi.psi2_sum(jnp.asarray(mu), jnp.asarray(s0), jnp.asarray(z), sf2, jnp.asarray(alpha))
    np.testing.assert_allclose(p2, knm.T @ knm, rtol=1e-7)


def test_suff_stats_sgpr_mode(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, latent=False)
    st = psi.suff_stats(
        jnp.asarray(y), jnp.asarray(mu), None, jnp.asarray(z), sf2, jnp.asarray(alpha)
    )
    knm = oracle.kern(mu, z, sf2, alpha)
    np.testing.assert_allclose(st.psi1_y, knm.T @ y, rtol=RTOL)
    np.testing.assert_allclose(st.psi2, knm.T @ knm, rtol=RTOL)
    np.testing.assert_allclose(st.psi0, mu.shape[0] * sf2, rtol=RTOL)
    np.testing.assert_allclose(st.yy, np.sum(y**2), rtol=RTOL)
    assert st.kl == 0.0


def test_blocked_suff_stats_match_dense(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=24)
    args = (jnp.asarray(y), jnp.asarray(mu), jnp.asarray(s), jnp.asarray(z), sf2, jnp.asarray(alpha))
    dense = psi.suff_stats(*args)
    blocked = psi.suff_stats(*args, block=4)
    for a, b in zip(dense, blocked):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_partition_invariance_of_stats(rng):
    """Sufficient statistics are an exact sum decomposition over any split of N
    (SURVEY.md §4 item 3 — the reference's key implicit integration test)."""
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=16)
    whole = psi.suff_stats(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(s), jnp.asarray(z), sf2, jnp.asarray(alpha)
    )
    parts = None
    for sl in [slice(0, 5), slice(5, 6), slice(6, 16)]:
        st = psi.suff_stats(
            jnp.asarray(y[sl]), jnp.asarray(mu[sl]), jnp.asarray(s[sl]),
            jnp.asarray(z), sf2, jnp.asarray(alpha),
        )
        parts = st if parts is None else parts + st
    for a, b in zip(whole, parts):
        np.testing.assert_allclose(a, b, rtol=1e-12)
