"""Error-compensated single-pass matmuls for TPU.

TPU MXUs multiply in bf16; f32 ``Precision.HIGHEST`` is emulated with 6 bf16
passes (and ``HIGH``/3-pass is rejected by Mosaic). For the psi-statistic
quadratic forms we need ~f32-accurate *exponents* but the contraction depth
K = Q (or 3Q) is far below the MXU's native 128, so extra K is free: split
each operand into bf16 high/low halves and contract

    [a_hi, a_hi, a_lo] . [b_hi; b_lo; b_hi]     (K -> 3K)

in ONE pass. Error ~2^-22 relative per product (Precision.HIGH quality) at
one-sixth the MXU passes of HIGHEST.

``compensated_dot`` carries a custom VJP whose cotangent products use the
same compensated scheme (the naive autodiff transpose would round cotangents
through bf16, costing ~1e-2 relative gradient error).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_bf16(x):
    """Round an f32 array to the nearest bf16 value WITHOUT a dtype round-trip.

    ``x.astype(bf16).astype(f32)`` is algebraically folded away by XLA under
    ``--xla_allow_excess_precision`` (a default in deployed toolchains), which
    silently turns every hi/lo split into ``hi = x, lo = 0`` and collapses the
    compensation to plain bf16 products (~5e-3 gradient error, measured).
    ``lax.reduce_precision`` would be the canonical fix but has no Pallas TPU
    lowering, and integer bit-twiddling (bitcast + mask) lowers to a ~25x
    slower scalar path in Mosaic. Veltkamp splitting is pure f32 VPU math:
    with c = 2^16 + 1, y = c*x rounds so that y - (y - x) keeps exactly the
    top 8 mantissa bits of x (a bf16-representable value, RNE). The
    excess-precision pass folds dtype-convert pairs, not float arithmetic,
    so the split survives. Finite inputs only: |x| must stay below
    ~2^110 so c*x doesn't overflow (fine for exponents/cotangents)."""
    c = jnp.float32(65537.0)  # 2^16 + 1
    y = c * x
    return y - (y - x)


def _split(x):
    x = x.astype(jnp.float32)
    hi = _round_bf16(x)
    return hi, x - hi


def _comp_dg(a, b, a_axis: int, b_axis: int) -> jnp.ndarray:
    """Compensated dot_general of two 2-D arrays contracting ``a_axis`` of a
    with ``b_axis`` of b (single MXU pass, ~2^-16-accurate products).

    The dropped a_lo*b_lo term and the MXU's bf16 rounding of the lo halves
    cap this at ~2^-16 relative per product; with the Veltkamp splits (which
    survive the compiler, see _round_bf16) that yields ~1.5e-4-class psi
    VJPs against a float64 oracle — parity with the XLA HIGHEST path. A
    6-term 3-way-ladder variant (~2^-24) was tried and measured: no further
    gradient gain here, at ~40% forward throughput cost in split-prep VPU
    work."""
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    lhs = jnp.concatenate([a_hi, a_hi, a_lo], axis=a_axis)
    rhs = jnp.concatenate([b_hi, b_lo, b_hi], axis=b_axis)
    return jax.lax.dot_general(
        lhs, rhs, (((a_axis,), (b_axis,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.custom_vjp
def compensated_dot(a: jnp.ndarray, b_t: jnp.ndarray) -> jnp.ndarray:
    """a @ b_t.T with ~f32 products in one MXU pass.

    Args:
      a: (R, K) left operand.
      b_t: (C, K) right operand, row-major (contraction over the last axis of
        both — the natural layout for kernel/psi matmuls).

    Returns (R, C) f32. Gradients are computed with the same compensated
    scheme (no transposes: the cotangent contractions are expressed over
    leading/trailing axes directly, which Mosaic lowers cleanly).
    """
    return _comp_dg(a, b_t, 1, 1)


def _cd_fwd(a, b_t):
    return _comp_dg(a, b_t, 1, 1), (a, b_t)


def _cd_bwd(res, g):
    a, b_t = res
    # da[r, k] = sum_c g[r, c] b_t[c, k]  — contract axis 1 of g, axis 0 of b_t
    da = _comp_dg(g, b_t, 1, 0)
    # db_t[c, k] = sum_r g[r, c] a[r, k]  — contract axis 0 of g, axis 0 of a
    db_t = _comp_dg(g, a, 0, 0)
    return da.astype(a.dtype), db_t.astype(b_t.dtype)


compensated_dot.defvjp(_cd_fwd, _cd_bwd)


def dot_nt(a: jnp.ndarray, b_t: jnp.ndarray) -> jnp.ndarray:
    """a @ b_t.T, picking the compensated path on TPU-style f32 inputs and a
    plain highest-precision dot for float64 (CPU oracle runs)."""
    if a.dtype == jnp.float64 or b_t.dtype == jnp.float64:
        return jax.lax.dot_general(
            a, b_t, (((a.ndim - 1,), (b_t.ndim - 1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    return compensated_dot(a, b_t)
