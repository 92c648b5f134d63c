"""Subprocess body for the real-TPU smoke test (see test_tpu_smoke.py).

Runs OUTSIDE the test conftest (which forces the CPU backend), so the fused
Pallas kernel goes through the real Mosaic compile. Exit codes:
  0  — parity holds on hardware
  3  — no TPU backend available (test skips)
  4  — crashed mid-run AFTER the backend initialized (tunnel dropped, worker
       died, compile infra error) — distinguishable from a measured parity
       mismatch so bench.py can keep its one-line JSON artifact
  1  — measured parity failure (values computed and differ)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    # Test hook: this environment pins jax_platforms='axon,cpu' at site
    # level (overriding the JAX_PLATFORMS env var), so the only way a test
    # can simulate an uninitializable backend is a config update, which
    # wins over the site pin.
    forced = os.environ.get("GPARML_SMOKE_FORCE_PLATFORMS")
    if forced:
        jax.config.update("jax_platforms", forced)

    try:
        backend = jax.default_backend()
    except Exception as e:  # noqa: BLE001
        # An uninitializable pinned TPU plugin raises RuntimeError here
        # (e.g. "Unable to initialize backend 'axon': UNAVAILABLE ...").
        # That is "no hardware", not "kernel parity failed" — rc 3, not 1.
        # (Round 3 lost its BENCH artifact to exactly this confusion.)
        print(f"no usable backend: {type(e).__name__}: {e}", file=sys.stderr)
        return 3
    if backend != "tpu" and not os.environ.get("GPARML_SMOKE_FORCE_CRASH"):
        # (the FORCE_CRASH test hook must reach _parity_checks on a CPU CI
        # host to exercise the rc-4 mid-run-crash path; it raises before any
        # device work)
        return 3
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

    try:
        return _parity_checks(jax, jnp)
    except Exception as e:  # noqa: BLE001
        # The backend initialized but the run died before a parity verdict
        # (tunnel outage, worker crash, Mosaic infra error). rc 4, not 1:
        # "could not check" is not "checked and mismatched", and bench.py
        # must keep its JSON artifact for the former (round-3 postmortem).
        print(f"smoke crashed mid-run: {type(e).__name__}: {e}",
              file=sys.stderr)
        return 4


def _parity_checks(jax, jnp) -> int:
    if os.environ.get("GPARML_SMOKE_FORCE_CRASH"):
        raise RuntimeError("forced mid-run crash (test hook)")

    from gparml_tpu.ops import psi, psi_pallas

    F = jnp.float32
    failures = []
    # M=200 hits the flat-basis fwd+bwd (the production path); M=512 the
    # top of the flat window (round-5 root cause: the historic ml=512
    # N-scale "crashes" were O(N) HLO constants in probe tools, not the
    # kernel — psi_pallas calibration block); M=640 the lane-chunked full-square
    # fallback; Q=44 the triangle-forward + staircase-backward pair at
    # small M (3Q+2 > 128 disables the flat basis).
    for n, m, q, d in ((64, 200, 10, 12), (24, 512, 10, 12),
                       (16, 640, 10, 12), (24, 256, 44, 4)):
        rng = np.random.default_rng(m)
        y = jnp.asarray(rng.standard_normal((n, d)), F)
        mu = jnp.asarray(rng.standard_normal((n, q)), F)
        s = jnp.asarray(0.3 + 0.5 * rng.random((n, q)), F)
        z = jnp.asarray(rng.standard_normal((m, q)), F)
        sf2 = jnp.float32(1.3)
        alpha = jnp.asarray(0.5 + rng.random(q), F)
        wy = jnp.asarray(rng.standard_normal((m, d)), F)
        wp = jnp.asarray(rng.standard_normal((m, m)), F)

        def obj(fn):
            def f(mu, s, z, sf2, alpha):
                p1y, p2 = fn(mu, s, z, sf2, alpha)
                return jnp.sum(p1y * wy) * 1e-2 + jnp.sum(p2 * wp) * 1e-3
            return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2, 4)))(
                mu, s, z, sf2, alpha
            )

        def pallas_fn(mu, s, z, sf2, alpha):
            w = jnp.ones((n,), F)
            return psi_pallas.psi_fused(mu, s, z, sf2, alpha, y, w, 32, False)

        def xla_fn(mu, s, z, sf2, alpha):
            st = psi.suff_stats(y, mu, s, z, sf2, alpha)
            return st.psi1_y, st.psi2

        def qn_fn(mu, s, z, sf2, alpha):
            st = psi_pallas.suff_stats_t(y.T, mu.T, s.T, z, sf2, alpha)
            return st.psi1_y, st.psi2

        vp, gp = obj(pallas_fn)
        vx, gx = obj(xla_fn)
        if not np.isclose(float(vp), float(vx), rtol=2e-4):
            failures.append(f"M={m}: value {float(vp)} vs {float(vx)}")
        for name, a, b in zip("mu s z alpha".split(), gp, gx):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)
            # Both paths are ~1.5e-4 from float64 truth (measured); allow 2x.
            if err > 1e-3:
                failures.append(f"M={m} grad {name}: rel err {err:.2e}")
        if m in (200, 512) and psi_pallas.qn_native_ok(m, q, interpret=False):
            # The (Q, N)-native kernels (single-chip large-N path) must also
            # survive the real Mosaic compile and match, across the flat
            # window's sub-tile ladder. M=512 is hardware-proven to
            # N=1e7 per call (round-5 boundary walk; the historic crashes
            # were probe-tool HLO-constant artifacts, see the psi_pallas
            # calibration block).
            vq, gq = obj(qn_fn)
            if not np.isclose(float(vq), float(vx), rtol=2e-4):
                failures.append(f"M={m} qn: value {float(vq)} vs {float(vx)}")
            for name, a, b in zip("mu s z alpha".split(), gq, gx):
                a = np.asarray(a, np.float64)
                b = np.asarray(b, np.float64)
                err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)
                if err > 1e-3:
                    failures.append(f"M={m} qn grad {name}: rel {err:.2e}")

    if failures:
        print("\n".join(failures))
        return 1
    print("tpu smoke: pallas fwd+bwd matches XLA on hardware "
          "(M=200 flat-basis; M=512 inside the staircase/flat hw window; "
          "(Q,N)-native inside its hw window; M=640 lane-chunked; "
          "Q=44 staircase)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
