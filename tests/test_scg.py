"""SCG optimizer unit tests: quadratic/Rosenbrock convergence, monotone
accepted-step history, pytree parameters (SURVEY.md §4 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from gparml_tpu.opt import scg


def test_quadratic_exact_convergence():
    """On a convex quadratic, CG-type methods converge in ~dim steps."""
    a = jnp.asarray(np.diag([1.0, 4.0, 9.0, 0.5]))
    b = jnp.asarray(np.array([1.0, -2.0, 3.0, 0.2]))

    def vg(x):
        f = 0.5 * x @ a @ x - b @ x
        return f, a @ x - b

    x0 = jnp.zeros(4)
    st = jax.jit(lambda x: scg.minimize(vg, x, scg.SCGOptions(max_iters=50)))(x0)
    x_star = np.linalg.solve(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(st.x, x_star, atol=1e-4)
    assert bool(st.done) and int(st.iteration) < 30


def test_rosenbrock():
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)

    vg = jax.value_and_grad(rosen)
    x0 = jnp.asarray(np.array([-1.2, 1.0]))
    st = jax.jit(lambda x: scg.minimize(vg, x, scg.SCGOptions(max_iters=400)))(x0)
    np.testing.assert_allclose(st.x, np.ones(2), atol=1e-4)


def test_pytree_params_and_monotone_history():
    """Params as a nested pytree; accepted objective values never increase."""
    def vg(p):
        f = jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"]["c"] + 1.0) ** 4)
        return f, jax.grad(lambda q: jnp.sum((q["w"] - 3.0) ** 2) + jnp.sum((q["b"]["c"] + 1.0) ** 4))(p)

    p0 = {"w": jnp.zeros((3, 2)), "b": {"c": jnp.ones(5)}}
    st = jax.jit(lambda p: scg.minimize(vg, p, scg.SCGOptions(max_iters=100)))(p0)
    np.testing.assert_allclose(st.x["w"], 3.0, atol=1e-5)
    np.testing.assert_allclose(st.x["b"]["c"], -1.0, atol=1e-2)
    hist = np.asarray(st.history.f)
    valid = np.isfinite(hist)
    # f_now history is non-increasing (rejected steps keep the old value)
    assert np.all(np.diff(hist[valid]) <= 1e-12)
    # the trace struct is populated consistently on executed iterations
    assert np.all(np.isfinite(np.asarray(st.history.gnorm2)[valid]))
    assert np.all(np.asarray(st.history.lam)[valid] > 0)
    assert np.all(np.isfinite(np.asarray(st.history.alpha)[valid]))
    assert np.asarray(st.history.accepted)[valid].any()


def test_stepped_matches_fused_quadratic():
    """minimize_stepped executes the identical algorithm (shared body):
    bit-level trajectory parity with the fused while_loop driver."""
    a = jnp.asarray(np.diag([1.0, 4.0, 9.0, 0.5]))
    b = jnp.asarray(np.array([1.0, -2.0, 3.0, 0.2]))

    def vg(x, a, b):
        f = 0.5 * x @ a @ x - b @ x
        return f, a @ x - b

    x0 = jnp.zeros(4)
    opts = scg.SCGOptions(max_iters=50)
    fused = jax.jit(lambda x: scg.minimize(lambda p: vg(p, a, b), x, opts))(x0)
    stepped = scg.minimize_stepped(vg, x0, opts, extra=(a, b))
    # Same algorithm, but different program partitionings are not bit-equal:
    # near convergence an ulp flips the stop iteration. Compare the early
    # trajectory tightly and both optima against the analytic solution.
    k = min(int(fused.iteration), int(stepped.iteration), 10)
    np.testing.assert_allclose(
        np.asarray(fused.history.f)[:k], np.asarray(stepped.history.f)[:k],
        rtol=1e-9)
    x_star = np.linalg.solve(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(stepped.x), x_star, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.x), x_star, atol=1e-4)
    # host loop honored the convergence flag (did not run to max_iters)
    assert bool(stepped.done) and int(stepped.iteration) < opts.max_iters
    # the caller's x0 buffer survives the donation scheme
    np.testing.assert_array_equal(np.asarray(x0), 0.0)


def test_stepped_pytree_params():
    def vg(p):
        obj = lambda q: jnp.sum((q["w"] - 3.0) ** 2) + jnp.sum((q["b"]["c"] + 1.0) ** 4)
        return obj(p), jax.grad(obj)(p)

    p0 = {"w": jnp.zeros((3, 2)), "b": {"c": jnp.ones(5)}}
    st = scg.minimize_stepped(vg, p0, scg.SCGOptions(max_iters=100))
    np.testing.assert_allclose(st.x["w"], 3.0, atol=1e-5)
    np.testing.assert_allclose(st.x["b"]["c"], -1.0, atol=1e-2)


def test_use_stepped_resolution():
    assert scg.use_stepped("stepped", 1)
    assert not scg.use_stepped("fused", 10**9)
    assert scg.use_stepped("auto", scg.STEPPED_N_THRESHOLD)
    assert not scg.use_stepped("auto", scg.STEPPED_N_THRESHOLD - 1)
    try:
        scg.use_stepped("bogus", 1)
    except ValueError:
        pass
    else:
        raise AssertionError("bad mode must raise")


def test_early_convergence_stops_evals():
    """Once converged, the loop exits (history stays nan afterwards)."""
    def vg(x):
        f = jnp.sum(x**2)
        return f, 2.0 * x

    st = jax.jit(lambda x: scg.minimize(vg, x, scg.SCGOptions(max_iters=500)))(
        jnp.ones(3)
    )
    hist = np.asarray(st.history.f)
    assert np.isnan(hist[-1])  # converged long before 500 iterations
    assert float(st.f_now) < 1e-12
