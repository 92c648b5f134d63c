"""Data-parallel sufficient statistics: shard_map + psum over the mesh.

This module *is* the reference's MapReduce layer, re-designed for TPUs
(GParML ``local_MapReduce.py`` / remote twin, SURVEY.md §2 [C-HIGH]):

  reference                              | here
  ---------------------------------------+--------------------------------
  map: one OS process per partition      | shard_map body on each device
  computes per-partition psi statistics  | computes per-shard SufficientStats
  writes partial-stat .npy files to tmp/ | (stays in registers/VMEM)
  reduce: sum partial files on master    | one psum over ICI/DCN
  statistics caching keyed on params     | unnecessary: value_and_grad is one
  (SCG probes re-evaluate same x)        | fused pass under jit

One psum of (M² + M·D + 4) floats per bound+grad evaluation replaces
thousands of file writes. Gradients flow through the psum (its transpose is
the identity broadcast), so jax.grad of the distributed bound is exact.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from gparml_tpu.ops import psi
from gparml_tpu.ops import psi_pallas
from gparml_tpu.parallel.mesh import DATA_AXIS


# Largest M the fused backward fits in scoped VMEM; beyond it the XLA scan
# engine takes over. The value lives in psi_pallas's device-generation
# calibration block (class 1 — re-measure when porting chip generations)
# so there is ONE checklist of hardware-calibrated constants.
_PALLAS_M_LIMIT = psi_pallas.PALLAS_M_LIMIT


def _local_stats(y, mu, s, z, sf2, alpha, block, weights, impl, tile,
                 vary_axis=None):
    if impl == "auto":
        # fused kernel on TPU; XLA scan elsewhere (Pallas would run in the
        # slow interpreter off-TPU)
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and z.shape[0] > _PALLAS_M_LIMIT:
        impl = "xla"
    if impl == "pallas" and s is not None:
        return psi_pallas.suff_stats(y, mu, s, z, sf2, alpha, weights=weights,
                                     tile=tile)
    return psi.suff_stats(y, mu, s, z, sf2, alpha, block=block, weights=weights,
                          vary_axis=vary_axis)


def suff_stats_sharded(
    y,
    mu,
    s,
    z,
    sf2,
    alpha,
    *,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    block: Optional[int] = None,
    weights=None,
    impl: str = "xla",
    tile: int = 16,
) -> psi.SufficientStats:
    """Global SufficientStats with (y, mu, s, weights) sharded over ``axis``
    and (z, sf2, alpha) replicated. Output is replicated on every device.

    Differentiable: cotangents wrt the replicated params are psum-reduced by
    shard_map's transpose, exactly mirroring the reference's summed partial
    gradients (SURVEY.md §3.4).
    """
    has_s = s is not None
    has_w = weights is not None
    if impl == "auto":
        impl_resolved = "pallas" if jax.default_backend() == "tpu" else "xla"
    else:
        impl_resolved = impl
    if not has_s:
        impl_resolved = "xla"  # SGPR statistics always take the XLA path

    def local(y, mu, s_or_none, w_or_none, z, sf2, alpha):
        st = _local_stats(
            y, mu, s_or_none, z, sf2, alpha, block, w_or_none, impl, tile,
            vary_axis=axis,
        )
        return jax.tree.map(lambda t: jax.lax.psum(t, axis), st)

    # Keep the arg list static per (has_s, has_w) combination so specs match.
    sharded = P(axis)
    rep = P()

    def wrapped(y, mu, s_, w_, z, sf2, alpha):
        return local(
            y, mu, s_ if has_s else None, w_ if has_w else None, z, sf2, alpha
        )

    dummy_s = s if has_s else mu  # placeholder with a valid sharding
    dummy_w = weights if has_w else y[:, 0]

    fn = jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, rep, rep, rep),
        out_specs=rep,
        # The XLA impl runs with the static varying-manual-axes checker ON
        # (the blocked scan's zero init is pvary'd, see psi.suff_stats).
        # The Pallas impl cannot: its interpret-mode body inlines into the
        # shard_map trace where in-kernel constants (iota masks, clamp
        # literals) are unvarying and lax.pvary has no Mosaic lowering; the
        # compiled path's pallas_call is opaque to the checker either way.
        # Replication of the Pallas path is guarded by the
        # partition-invariance tests instead.
        check_vma=impl_resolved != "pallas",
    )
    return fn(y, mu, dummy_s, dummy_w, z, sf2, alpha)


def suff_stats_auto(
    y, mu, s, z, sf2, alpha,
    *, mesh: Optional[Mesh] = None, axis: str = DATA_AXIS,
    block: Optional[int] = None, weights=None,
    impl: str = "xla", tile: int = 16,
) -> psi.SufficientStats:
    """Single-device or distributed sufficient statistics, one entry point.

    ``mesh=None`` is the reference's single-worker path; a mesh switches to
    shard_map+psum (its ``-p local`` vs cluster backends collapse to this one
    flag, SURVEY.md §2 "Remote/cluster MapReduce backend"). ``impl`` selects
    the psi engine: 'xla' (blocked scan) or 'pallas' (fused kernel; GPLVM
    path only — the SGPR s=None statistics are plain MXU matmuls already)."""
    if mesh is None:
        return _local_stats(y, mu, s, z, sf2, alpha, block, weights, impl, tile)
    return suff_stats_sharded(
        y, mu, s, z, sf2, alpha, mesh=mesh, axis=axis, block=block,
        weights=weights, impl=impl, tile=tile,
    )
