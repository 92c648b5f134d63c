"""Partition invariance over mesh sizes {1, 2, 8} on the forced-8-device CPU
backend (SURVEY.md §4 item 3): the distributed bound/gradients must equal the
single-device ones to float tolerance because the map-reduce decomposition is
an exact sum — the reference validated this by running 1 vs k worker
processes; here it's 1 vs k mesh shards."""

import numpy as np
import jax
import jax.numpy as jnp

from gparml_tpu.ops import bound, psi
from gparml_tpu.parallel import mesh as mesh_lib
from gparml_tpu.parallel import stats as pstats
from tests.conftest import make_problem


def _dist_bound(mesh, y, mu, s, z, sf2, alpha, beta, d, weights=None):
    st = pstats.suff_stats_sharded(
        y, mu, s, z, sf2, alpha, mesh=mesh, weights=weights
    )
    return bound.bound_from_stats(st, z, sf2, alpha, beta, d=d)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_stats_invariant_across_mesh_sizes(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=32, d=3, q=2, m=5)
    args = [jnp.asarray(a) for a in (y, mu, s, z)]
    alpha_j = jnp.asarray(alpha)

    ref = psi.suff_stats(args[0], args[1], args[2], args[3], sf2, alpha_j)
    for k in (1, 2, 8):
        m = mesh_lib.make_mesh(k)
        ys, mus, ss, w = mesh_lib.shard_data(m, y, mu, s)
        st = jax.jit(lambda mus_, ss_, z_: pstats.suff_stats_sharded(
            ys, mus_, ss_, z_, sf2, alpha_j, mesh=m, weights=w
        ))(mus, ss, args[3])
        for a, b in zip(ref, st):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)


def test_bound_and_grads_invariant_across_mesh_sizes(rng):
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=32, d=3, q=2, m=5)
    zj, alphaj = jnp.asarray(z), jnp.asarray(alpha)

    def ref_obj(zj, mu_, s_):
        st = psi.suff_stats(jnp.asarray(y), mu_, s_, zj, sf2, alphaj)
        return bound.bound_from_stats(st, zj, sf2, alphaj, beta, d=y.shape[1])

    f_ref, g_ref = jax.jit(jax.value_and_grad(ref_obj, argnums=(0, 1, 2)))(
        zj, jnp.asarray(mu), jnp.asarray(s)
    )

    for k in (2, 8):
        m = mesh_lib.make_mesh(k)
        ys, mus, ss, w = mesh_lib.shard_data(m, y, mu, s)

        def dist_obj(zj, mu_, s_):
            return _dist_bound(m, ys, mu_, s_, zj, sf2, alphaj, beta, y.shape[1], w)

        f, g = jax.jit(jax.value_and_grad(dist_obj, argnums=(0, 1, 2)))(zj, mus, ss)
        np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-12)
        # grad wrt replicated Z (psum of per-shard partials) and sharded mu, s
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g[2]), np.asarray(g_ref[2]), rtol=1e-10)


def test_uneven_n_padding_is_exact(rng):
    """N=29 over 8 shards: ones-padding + 0/1 weights keeps stats exact."""
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=29, d=3, q=2, m=5)
    ref = psi.suff_stats(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(s), jnp.asarray(z), sf2, jnp.asarray(alpha)
    )
    m = mesh_lib.make_mesh(8)
    ys, mus, ss, w = mesh_lib.shard_data(m, y, mu, s)
    assert ys.shape[0] == 32
    st = pstats.suff_stats_sharded(
        ys, mus, ss, jnp.asarray(z), sf2, jnp.asarray(alpha), mesh=m, weights=w
    )
    for a, b in zip(ref, st):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)
    assert float(st.n) == 29.0


def test_sgpr_mode_sharded(rng):
    y, x, _, z, sf2, alpha, beta = make_problem(rng, n=24, d=3, q=2, m=5, latent=False)
    ref = psi.suff_stats(
        jnp.asarray(y), jnp.asarray(x), None, jnp.asarray(z), sf2, jnp.asarray(alpha)
    )
    m = mesh_lib.make_mesh(8)
    ys, xs, w = mesh_lib.shard_data(m, y, x)
    st = pstats.suff_stats_sharded(
        ys, xs, None, jnp.asarray(z), sf2, jnp.asarray(alpha), mesh=m, weights=w
    )
    for a, b in zip(ref, st):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)


def test_blocked_scan_inside_shard_map(rng):
    """block (remat scan) composed with shard_map matches the dense path."""
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=64, d=3, q=2, m=5)
    ref = psi.suff_stats(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(s), jnp.asarray(z), sf2, jnp.asarray(alpha)
    )
    m8 = mesh_lib.make_mesh(8)
    ys, mus, ss, w = mesh_lib.shard_data(m8, y, mu, s)
    st = pstats.suff_stats_sharded(
        ys, mus, ss, jnp.asarray(z), sf2, jnp.asarray(alpha),
        mesh=m8, weights=w, block=4,
    )
    for a, b in zip(ref, st):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10)


def test_sgpr_blocked_scan_inside_shard_map(rng):
    """The SGPR (s=None) blocked K_NM scan composed with shard_map matches
    the dense path — the new blocked branch must honor vary_axis for the
    scan carry inside the manual-axes region."""
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=64, d=3, q=2, m=5)
    ref = psi.suff_stats(
        jnp.asarray(y), jnp.asarray(mu), None, jnp.asarray(z), sf2,
        jnp.asarray(alpha)
    )
    m8 = mesh_lib.make_mesh(8)
    ys, mus, _, w = mesh_lib.shard_data(m8, y, mu, s)
    st = pstats.suff_stats_sharded(
        ys, mus, None, jnp.asarray(z), sf2, jnp.asarray(alpha),
        mesh=m8, weights=w, block=4,
    )
    for a, b in zip(ref, st):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-10)


def test_sgpr_predict_under_mesh(rng):
    """predict with sharded training data matches the single-device result."""
    from gparml_tpu.models import sgpr

    x = np.sort(rng.uniform(-2, 2, (40, 1)), axis=0)
    y = np.sin(2 * x)
    cfg = sgpr.SGPRConfig(num_inducing=6)
    g0 = sgpr.init_params(jax.random.key(0), jnp.asarray(x), jnp.asarray(y), cfg)
    xs = jnp.linspace(-2, 2, 9)[:, None]
    mean_ref, var_ref = sgpr.predict(g0, jnp.asarray(x), jnp.asarray(y), xs, cfg)

    m8 = mesh_lib.make_mesh(8)
    ys, xsh, w = mesh_lib.shard_data(m8, y, x)
    mean, var = sgpr.predict(g0, xsh, ys, xs, cfg, mesh=m8, weights=w)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), rtol=1e-8)


def test_pallas_m_limit_fallback(rng):
    """impl='pallas' beyond _PALLAS_M_LIMIT must silently reroute to the XLA
    scan and still produce correct stats AND grads (VERDICT r2 item 5: the
    framework must be correct at any M, not just fast below the limit)."""
    m_big = pstats._PALLAS_M_LIMIT + 60  # 700 at the current limit
    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=12, d=2, q=2, m=m_big)
    zj, alphaj = jnp.asarray(z), jnp.asarray(alpha)

    def obj(impl):
        def f(zj, mu_, s_):
            st = pstats.suff_stats_auto(
                jnp.asarray(y), mu_, s_, zj, sf2, alphaj, impl=impl
            )
            return st.psi0 + jnp.sum(st.psi1_y) + jnp.sum(st.psi2) + st.kl
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(
            zj, jnp.asarray(mu), jnp.asarray(s)
        )

    f_ref, g_ref = obj("xla")
    f_p, g_p = obj("pallas")  # reroutes: M > limit
    np.testing.assert_allclose(float(f_p), float(f_ref), rtol=1e-12)
    for a, b in zip(g_p, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)

    # and under a mesh (suff_stats_sharded takes the same reroute)
    m8 = mesh_lib.make_mesh(8)
    ys, mus, ss, w = mesh_lib.shard_data(m8, y, mu, s)
    st = pstats.suff_stats_sharded(
        ys, mus, ss, zj, sf2, alphaj, mesh=m8, weights=w, impl="pallas"
    )
    ref = psi.suff_stats(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(s), zj, sf2, alphaj
    )
    for a, b in zip(ref, st):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)


def test_stepped_scg_matches_fused_under_mesh(rng):
    """The host-stepped SCG driver (the config-5-scale mode) under a data
    mesh: sharded latents/data ride the per-iteration programs unchanged,
    and the trajectory matches the fused while_loop driver."""
    from gparml_tpu.models import gplvm
    from gparml_tpu.models import params as P

    y, mu, s, z, sf2, alpha, beta = make_problem(rng, n=24, d=3, q=2, m=5)
    m8 = mesh_lib.make_mesh(8)
    ys, mus, ss, w = mesh_lib.shard_data(m8, y, mu, s)
    lat = P.make_latents(mus, ss, bijector="exp")
    glob = P.make_global(jnp.asarray(z), sf2, alpha, beta)
    p0 = P.GPLVMParams(glob=glob, lat=lat)

    hists = {}
    for mode in ("fused", "stepped"):
        cfg = gplvm.GPLVMConfig(q=2, num_inducing=5, scg_mode=mode)
        res = gplvm.fit(p0, ys, cfg, iters=6, mesh=m8, weights=w)
        h = np.asarray(res.history)
        hists[mode] = h[np.isfinite(h)]
        assert hists[mode].size > 0
    k = min(len(hists["fused"]), len(hists["stepped"]))
    np.testing.assert_allclose(hists["fused"][:k], hists["stepped"][:k],
                               rtol=1e-6)
