"""Alternative first-order optimizers via optax (reference's plain
gradient-descent option, SURVEY.md §2 "Alternative optimizer (GD)" [C-LOW] —
generalized to any optax rule; adam is the default alternative)."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class OptaxResult(NamedTuple):
    x: object
    f_now: jnp.ndarray
    history: jnp.ndarray  # (iters,) objective value per step
    n_evals: jnp.ndarray


def minimize(
    value_and_grad_fn: Callable,
    x0,
    iters: int,
    optimizer: optax.GradientTransformation | None = None,
    learning_rate: float = 1e-2,
) -> OptaxResult:
    """Run ``iters`` optax steps on ``value_and_grad_fn`` via lax.scan."""
    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(x0)

    def step(carry, _):
        x, opt_state = carry
        f, g = value_and_grad_fn(x)
        updates, opt_state = optimizer.update(g, opt_state, x)
        x = optax.apply_updates(x, updates)
        return (x, opt_state), f

    (x, _), history = jax.lax.scan(step, (x0, opt_state), None, length=iters)
    f_final, _ = value_and_grad_fn(x)
    return OptaxResult(
        x=x, f_now=f_final, history=history,
        n_evals=jnp.asarray(iters + 1, jnp.int32),
    )
