"""Bijectors between constrained (positive) and unconstrained parameters.

Re-design of GParML ``supporting_functions.py`` transform helpers (SURVEY.md
§2 [C-MED]): the reference optimizes log-values of positive hypers; we keep
that ``exp`` transform as the default (so optimization trajectories are
comparable) and offer ``softplus`` as a better-conditioned alternative.
"""

from __future__ import annotations

import jax.numpy as jnp


class Exp:
    """y = exp(x); the reference's transform for positive hypers."""

    @staticmethod
    def forward(x):
        return jnp.exp(x)

    @staticmethod
    def inverse(y):
        return jnp.log(y)


class Softplus:
    """y = log(1 + exp(x)); numerically gentler near zero."""

    @staticmethod
    def forward(x):
        return jnp.logaddexp(x, 0.0)

    @staticmethod
    def inverse(y):
        # x = log(exp(y) - 1) = y + log(1 - exp(-y)), stable for y > 0
        return y + jnp.log(-jnp.expm1(-y))


BIJECTORS = {"exp": Exp, "softplus": Softplus}


def get(name: str):
    try:
        return BIJECTORS[name]
    except KeyError:
        raise ValueError(f"unknown bijector {name!r}; options: {sorted(BIJECTORS)}")
