"""Test configuration: force an 8-virtual-device CPU backend (SURVEY.md §4:
"the fake backend that makes distributed tests run anywhere") and enable x64
so parity gates run at 1e-6 rtol against the float64 oracle."""

import jax

# NOTE: this environment pre-sets jax_platforms='axon,cpu' (a remote TPU
# tunnel) at a level that overrides the JAX_PLATFORMS env var; only
# jax.config.update wins. Without this, every test op round-trips to the TPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# A persistent cache makes test re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_problem(rng, n=12, d=3, q=2, m=5, latent=True):
    """Small random GPLVM/SGPR problem in float64."""
    y = rng.standard_normal((n, d))
    mu = rng.standard_normal((n, q))
    s = rng.uniform(0.2, 1.5, size=(n, q)) if latent else None
    z = rng.standard_normal((m, q))
    sf2 = 1.3
    alpha = rng.uniform(0.3, 2.0, size=(q,))
    beta = 2.1
    return y, mu, s, z, sf2, alpha, beta
