"""Fused Pallas psi-kernel parity vs the pure-JAX oracle implementation
(psi.py), forward and backward, in interpreter mode on CPU (SURVEY.md §4:
"Pallas kernels vs pure-JAX reference implementations"). float32 — the
kernel's production dtype."""

import numpy as np
import jax
import jax.numpy as jnp

from gparml_tpu.ops import psi, psi_pallas
from tests.conftest import make_problem

F = jnp.float32


def _inputs(rng, n=24, d=3, q=2, m=5):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=n, d=d, q=q, m=m)
    return (
        jnp.asarray(y, F), jnp.asarray(mu, F), jnp.asarray(s, F),
        jnp.asarray(z, F), jnp.float32(sf2), jnp.asarray(alpha, F),
    )


def test_forward_parity(rng):
    y, mu, s, z, sf2, alpha = _inputs(rng)
    st_ref = psi.suff_stats(y, mu, s, z, sf2, alpha)
    st = psi_pallas.suff_stats(y, mu, s, z, sf2, alpha, tile=8, interpret=True)
    np.testing.assert_allclose(st.psi1_y, st_ref.psi1_y, rtol=8e-5)
    np.testing.assert_allclose(st.psi2, st_ref.psi2, rtol=8e-5, atol=1e-6)
    np.testing.assert_allclose(st.psi0, st_ref.psi0, rtol=1e-6)
    np.testing.assert_allclose(st.kl, st_ref.kl, rtol=1e-6)


def test_forward_parity_weighted(rng):
    y, mu, s, z, sf2, alpha = _inputs(rng, n=24)
    w = jnp.asarray(np.r_[np.ones(17), np.zeros(7)], F)
    st_ref = psi.suff_stats(y, mu, s, z, sf2, alpha, weights=w)
    st = psi_pallas.suff_stats(
        y, mu, s, z, sf2, alpha, weights=w, tile=8, interpret=True
    )
    np.testing.assert_allclose(st.psi1_y, st_ref.psi1_y, rtol=8e-5)
    np.testing.assert_allclose(st.psi2, st_ref.psi2, rtol=8e-5, atol=1e-6)
    assert float(st.n) == 17.0


def test_forward_parity_n_not_multiple_of_tile(rng):
    y, mu, s, z, sf2, alpha = _inputs(rng, n=21)
    st_ref = psi.suff_stats(y, mu, s, z, sf2, alpha)
    st = psi_pallas.suff_stats(y, mu, s, z, sf2, alpha, tile=8, interpret=True)
    np.testing.assert_allclose(st.psi1_y, st_ref.psi1_y, rtol=8e-5)
    np.testing.assert_allclose(st.psi2, st_ref.psi2, rtol=8e-5, atol=1e-6)


def test_backward_parity(rng):
    """Gradients of a scalarized objective through the Pallas custom VJP match
    jax.grad of the pure-JAX path (the autodiff oracle)."""
    y, mu, s, z, sf2, alpha = _inputs(rng, n=16, d=2, q=2, m=4)
    pr = np.random.default_rng(1)
    wy = jnp.asarray(pr.standard_normal((4, 2)), F)   # (M, D) probe
    wp = jnp.asarray(pr.standard_normal((4, 4)), F)   # (M, M) probe

    def obj_ref(mu, s, z, sf2, alpha, y):
        st = psi.suff_stats(y, mu, s, z, sf2, alpha)
        return jnp.sum(st.psi1_y * wy) + jnp.sum(st.psi2 * wp)

    def obj_pal(mu, s, z, sf2, alpha, y):
        w = jnp.ones((y.shape[0],), F)
        p1y, p2 = psi_pallas.psi_fused(mu, s, z, sf2, alpha, y, w, 8, True)
        return jnp.sum(p1y * wy) + jnp.sum(p2 * wp)

    args = (mu, s, z, sf2, alpha, y)
    g_ref = jax.jit(jax.grad(obj_ref, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    g_pal = jax.jit(jax.grad(obj_pal, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    names = ["mu", "s", "z", "sf2", "alpha", "y"]
    for name, a, b in zip(names, g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_bound_through_pallas_matches(rng):
    """Full GPLVM bound + grads via the Pallas stats vs the pure-JAX stats."""
    from gparml_tpu.ops import bound

    y, mu, s, z, sf2, alpha = _inputs(rng, n=16, d=3, q=2, m=5)
    beta = jnp.float32(2.0)

    def f_ref(mu, s, z):
        st = psi.suff_stats(y, mu, s, z, sf2, alpha)
        return bound.bound_from_stats(st, z, sf2, alpha, beta, d=y.shape[1])

    def f_pal(mu, s, z):
        st = psi_pallas.suff_stats(y, mu, s, z, sf2, alpha, tile=8, interpret=True)
        return bound.bound_from_stats(st, z, sf2, alpha, beta, d=y.shape[1])

    fr, gr = jax.jit(jax.value_and_grad(f_ref, argnums=(0, 1, 2)))(mu, s, z)
    fp, gp = jax.jit(jax.value_and_grad(f_pal, argnums=(0, 1, 2)))(mu, s, z)
    np.testing.assert_allclose(float(fp), float(fr), rtol=1e-5)
    for a, b in zip(gp, gr):
        # Norm-scaled: both f32 paths wobble ~1e-3 of the gradient norm around
        # the f64 truth (verified: the Pallas path is as close to f64 as the
        # XLA path); elementwise rtol on mixed-magnitude entries is too harsh.
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, atol=3e-3 * np.abs(b).max(), rtol=1e-3
        )


def test_pallas_stats_inside_shard_map(rng):
    """stats_impl='pallas' through the data-parallel layer (interpret mode on
    the CPU mesh) matches the XLA path, values and gradients."""
    import jax
    from gparml_tpu.parallel import mesh as mesh_lib
    from gparml_tpu.parallel import stats as pstats

    y, mu, s, z, sf2, alpha = _inputs(rng, n=32, d=3, q=2, m=5)
    m8 = mesh_lib.make_mesh(8)
    ys, mus, ss, w = mesh_lib.shard_data(m8, np.asarray(y), np.asarray(mu), np.asarray(s))

    def obj(impl):
        def f(mu_, s_, z_):
            st = pstats.suff_stats_sharded(
                ys, mu_, s_, z_, sf2, alpha, mesh=m8, weights=w, impl=impl, tile=8
            )
            return jnp.sum(st.psi2) + jnp.sum(st.psi1_y)
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(mus, ss, z)

    fx, gx = obj("xla")
    fp, gp = obj("pallas")
    np.testing.assert_allclose(float(fp), float(fx), rtol=1e-4)
    for a, b in zip(gp, gx):
        b = np.asarray(b)
        np.testing.assert_allclose(np.asarray(a), b, atol=3e-4 * max(np.abs(b).max(), 1e-9), rtol=1e-3)


def test_forward_backward_parity_large_m(rng):
    """M > 256 exercises the triangle-tiled forward (Ml=384, clipped last
    row block) and the symmetric lane-chunk-capable backward."""
    y, mu, s, z, sf2, alpha = _inputs(rng, n=12, d=2, q=2, m=300)

    def obj(fn):
        def f(mu, s, z):
            st = fn(y, mu, s, z, sf2, alpha)
            return jnp.sum(st.psi2) * 0.1 + jnp.sum(st.psi1_y)
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(mu, s, z)

    fr, gr = obj(lambda *a: psi.suff_stats(*a))
    fp, gp = obj(lambda *a: psi_pallas.suff_stats(*a, tile=8, interpret=True))
    np.testing.assert_allclose(float(fp), float(fr), rtol=1e-4)
    for a, b in zip(gp, gr):
        b = np.asarray(b)
        np.testing.assert_allclose(
            np.asarray(a), b, atol=3e-4 * max(np.abs(b).max(), 1e-9), rtol=1e-3
        )


def test_sgpr_mode_rejected(rng):
    """The kernel is GPLVM-only (SGPR statistics are plain MXU matmuls)."""
    import pytest

    y, mu, s, z, sf2, alpha = _inputs(rng, n=8)
    with pytest.raises(ValueError, match="s=None"):
        psi_pallas.suff_stats(y, mu, None, z, sf2, alpha, interpret=True)


def test_flat_dispatch_shares_one_hardware_window():
    """ADVICE r3: row-major (_use_flat) and transposed (qn_native_ok)
    dispatch must apply ONE hardware risk policy for the flat-basis kernel
    family. Round 4 lifted the window to ml=512; round 5 proved ml=512 to
    N=1e7 per call and root-caused the historic crashes to probe-tool HLO
    constants (psi_pallas calibration block) — the per-call N caps
    (_chunk_plan) remain as the beyond-measurement guard. Both dispatches
    must still agree exactly, and interpret mode keeps the full capability
    window for CPU parity."""
    q = 3
    for ml in (256, 384, 512):
        on_hw = psi_pallas._use_flat(ml, q, interpret=False)
        assert on_hw == (ml <= psi_pallas._FLAT_ML_HW_LIMIT), ml
        # transposed dispatch agrees exactly (m chosen so ml_pad == ml)
        assert psi_pallas.qn_native_ok(ml, q, interpret=False) == on_hw, ml
        assert psi_pallas._use_flat(ml, q, interpret=True), ml
        assert psi_pallas.qn_native_ok(ml, q, interpret=True), ml


def test_chunk_plan_respects_caps(monkeypatch):
    """Every plan keeps rows-per-call at or under the hardware-proven cap
    for its Ml class, covers n, and uses equal granule-aligned chunks."""
    monkeypatch.setattr(psi_pallas, "_CHUNK_GRANULE", 8)
    monkeypatch.setattr(psi_pallas, "_FLAT_N_PER_CALL_NARROW", 64)
    monkeypatch.setattr(psi_pallas, "_FLAT_N_PER_CALL_WIDE", 24)
    assert psi_pallas._chunk_plan(64, 256) is None
    assert psi_pallas._chunk_plan(24, 512) is None
    for n in (65, 100, 129, 1000):
        for ml, cap in ((256, 64), (384, 24), (512, 24)):
            nb, block = psi_pallas._chunk_plan(n, ml)
            assert block <= cap, (n, ml)
            assert nb * block >= n, (n, ml)
            assert block % 8 == 0, (n, ml)


def test_chunked_stats_match_single_call(rng, monkeypatch):
    """Forcing tiny per-call N caps must leave suff_stats/suff_stats_t
    values AND gradients unchanged (the N=1e7/M=500 worker-crash guard is
    exact: stats are sums over N, chunk padding carries w=0). m=130 so
    ml=256 — both the row-major flat dispatch and the (Q, N)-native route
    (qn_native_ok needs ml >= 256) take their chunked drivers."""
    y, mu, s, z, sf2, alpha = _inputs(rng, n=40, d=3, q=2, m=130)

    def objectives():
        def f_row(mu, s):
            st = psi_pallas.suff_stats(y, mu, s, z, sf2, alpha, tile=8,
                                       interpret=True)
            return jnp.sum(st.psi2) * 0.1 + jnp.sum(st.psi1_y) + st.kl

        def f_t(mu_t, s_t):
            st = psi_pallas.suff_stats_t(y.T, mu_t, s_t, z, sf2, alpha,
                                         tile=8, interpret=True)
            return jnp.sum(st.psi2) * 0.1 + jnp.sum(st.psi1_y) + st.kl

        vr = jax.value_and_grad(f_row, argnums=(0, 1))(mu, s)
        vt = jax.value_and_grad(f_t, argnums=(0, 1))(mu.T, s.T)
        return vr, vt

    (f0, g0), (ft0, gt0) = objectives()
    monkeypatch.setattr(psi_pallas, "_CHUNK_GRANULE", 8)
    monkeypatch.setattr(psi_pallas, "_FLAT_N_PER_CALL_NARROW", 16)
    monkeypatch.setattr(psi_pallas, "_FLAT_N_PER_CALL_WIDE", 16)
    assert psi_pallas._chunk_plan(40, 256) == (3, 16)
    (f1, g1), (ft1, gt1) = objectives()
    np.testing.assert_allclose(float(f1), float(f0), rtol=2e-6)
    np.testing.assert_allclose(float(ft1), float(ft0), rtol=2e-6)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)
    for a, b in zip(gt1, gt0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)
