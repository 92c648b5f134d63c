"""2-D-grid psi kernel prototypes: grid = (N-tile index, triangle-block
index). Each grid step processes ONE 128x128 block of the symmetric Psi2
square for one N-tile, so Mosaic pipelines blocks like ordinary grid steps
(per-block VMEM is freed between steps, unlike a static in-body block loop)
and the N-tile can grow. The 2-D per-tile stage (lq/vpp/coef) is computed
once per N-tile (at block index 0) into VMEM scratch.

Usage:
  python tools/grid_lab.py check          # CPU interpret parity
  python tools/grid_lab.py time [tile]    # TPU forward timing
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

from gparml_tpu.ops import psi_pallas as pp
from gparml_tpu.ops.precise import compensated_dot

_BL = 128


def _tri_block_list(nb: int):
    return [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]


def _tri_bi(j, nb: int):
    """Row-block index of linear upper-triangle block j, as pure integer
    arithmetic on a traced j (index maps must not capture arrays): row bi
    starts at offset bi*nb - bi(bi-1)/2."""
    bi = 0
    for t in range(1, nb):
        bi = bi + (j >= (t * nb - t * (t - 1) // 2)).astype(jnp.int32)
    return bi


def _tri_bj(j, nb: int):
    bi = _tri_bi(j, nb)
    return j - (bi * nb - bi * (bi - 1) // 2) + bi


def _fwd_grid_kernel(mu_ref, s_ref, yw_ref, w_ref, zfull_ref, z2full_ref,
                     alpha_ref, logsf2_ref, zr_ref, zc_ref,
                     p1y_ref, p2_ref, vpp_scr, coef_scr,
                     *, m_real: int, nb: int, rows, cols):
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)
    tn, qp = mu_ref.shape
    ml = zfull_ref.shape[0]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        p1y_ref[:] = jnp.zeros_like(p1y_ref)

    @pl.when(i == 0)
    def _():
        p2_ref[:] = jnp.zeros_like(p2_ref)

    @pl.when(j == 0)
    def _():
        neg_pad, logw = pp._mask_and_logw(mu_ref[:], w_ref[:], ml, m_real)
        lq, vpp, coef = pp._tile_2d(
            mu_ref[:], s_ref[:], zfull_ref[:], z2full_ref[:], alpha_ref[:],
            logsf2_ref[:], logw, neg_pad,
        )
        psi1 = jnp.exp2(lq)
        p1y_ref[:] += jax.lax.dot_general(
            psi1, yw_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
        coef_scr[:] = coef
        for b in range(nb):
            vpp_scr[b] = jax.lax.slice_in_dim(
                vpp, b * _BL, (b + 1) * _BL, axis=1
            )

    rj = _tri_bi(j, nb)
    cj = _tri_bj(j, nb)
    coef = coef_scr[:]
    zc_i = (zr_ref[:][None, :, :] * coef[:, None, :]).reshape(tn * _BL, qp)
    bt = compensated_dot(zc_i, zc_ref[:]).reshape(tn, _BL, _BL)
    vpp_r = vpp_scr[rj]
    vpp_c = vpp_scr[cj]
    lp = bt + vpp_r[:, :, None] + vpp_c[:, None, :]
    p2_ref[:] += jnp.sum(jnp.exp2(lp), axis=0)


def fwd_grid(mu, s, z, sf2, alpha, yw, w_arr, tile: int = 64,
             interpret: bool = False):
    d = yw.shape[1]
    m = z.shape[0]
    dtype = mu.dtype
    ml = pp._round_up(max(m, _BL), _BL)
    mu_p, s_p, yw_p, w_p, z_p, npad, qp, _ = pp._pad_inputs(
        mu, s, yw, w_arr, jnp.concatenate(
            [z, jnp.zeros((ml - m, z.shape[1]), z.dtype)], 0
        ) if ml != m else z, tile,
    )
    z2_p = z_p * z_p
    alpha_row = alpha.reshape(1, qp).astype(dtype)
    logsf2 = jnp.log(jnp.asarray(sf2, dtype)).reshape(1, 1)
    nb = ml // _BL
    blocks = _tri_block_list(nb)
    rows = tuple(b[0] for b in blocks)
    cols = tuple(b[1] for b in blocks)
    grid = (npad // tile, len(blocks))

    kernel = functools.partial(
        _fwd_grid_kernel, m_real=m, nb=nb, rows=rows, cols=cols
    )
    row_idx = lambda i, j: (_tri_bi(j, nb), 0)
    col_idx = lambda i, j: (_tri_bj(j, nb), 0)
    p1y, p2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, qp), lambda i, j: (i, 0)),      # mu
            pl.BlockSpec((tile, qp), lambda i, j: (i, 0)),      # s
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),       # yw
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),       # w
            pl.BlockSpec((ml, qp), lambda i, j: (0, 0)),        # z full
            pl.BlockSpec((ml, qp), lambda i, j: (0, 0)),        # z2 full
            pl.BlockSpec((1, qp), lambda i, j: (0, 0)),         # alpha
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),          # log sf2
            pl.BlockSpec((_BL, qp), row_idx),                   # z row block
            pl.BlockSpec((_BL, qp), col_idx),                   # z col block
        ],
        out_specs=[
            pl.BlockSpec((ml, d), lambda i, j: (0, 0)),
            pl.BlockSpec((_BL, _BL), lambda i, j: (_tri_bi(j, nb),
                                                   _tri_bj(j, nb))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ml, d), dtype),
            jax.ShapeDtypeStruct((ml, ml), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, tile, _BL), jnp.float32),           # vpp blocks
            pltpu.VMEM((tile, qp), jnp.float32),                # coef
        ],
        interpret=interpret,
    )(mu_p, s_p, yw_p, w_p.reshape(-1, 1), z_p, z2_p, alpha_row, logsf2,
      z_p, z_p)

    # zero never-visited lower blocks, then mirror the upper triangle
    nbs = ml // _BL
    triu_b = jnp.kron(
        jnp.triu(jnp.ones((nbs, nbs), dtype)), jnp.ones((_BL, _BL), dtype)
    )
    eye_b = jnp.kron(
        jnp.eye(nbs, dtype=dtype), jnp.ones((_BL, _BL), dtype)
    )
    u = p2 * triu_b
    p2_full = u + u.T - u * eye_b
    return p1y[:m], p2_full[:m, :m]


def check():
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    for m in (200, 300):
        n, q, d = 48, 3, 2
        y = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        mu = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
        s = jnp.asarray(rng.uniform(0.2, 0.8, (n, q)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((m, q)), jnp.float32)
        alpha = jnp.ones((q,), jnp.float32)
        w = jnp.ones((n,), jnp.float32)
        ref = pp.psi_fused(mu, s, z, jnp.float32(1.0), alpha, y, w, 16, True)
        got = fwd_grid(mu, s, z, jnp.float32(1.0), alpha, y, w, 16, True)
        errs = [float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
                for a, b in zip(got, ref)]
        print(f"check fwd_grid M={m}: max rel err {max(errs):.2e}", flush=True)


def timing(tile: int):
    n, m, q, d = 1_000_000, 200, 10, 12
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
    s = jnp.full((n, q), 0.5, jnp.float32)
    z = jnp.asarray(rng.standard_normal((m, q)), jnp.float32)
    sf2 = jnp.float32(1.0)
    alpha = jnp.ones((q,), jnp.float32)
    w = jnp.ones((n,), jnp.float32)

    @jax.jit
    def fwd(mu, s, z, sf2, alpha, y, w):
        p1y, p2 = fwd_grid(mu, s, z, sf2, alpha, y, w, tile, False)
        return jnp.sum(p1y) + jnp.sum(p2)

    out = fwd(mu, s, z, sf2, alpha, y, w)
    float(out)
    times = []
    for i in range(3):
        zi = z + np.float32((i + 1) * 1e-6)
        t0 = time.perf_counter()
        out = fwd(mu, s, zi, sf2, alpha, y, w)
        float(out)
        times.append(time.perf_counter() - t0)
    print(f"fwd_grid tile={tile}: {min(times)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "check":
        check()
    else:
        for t in [int(x) for x in (sys.argv[2:] or ["64"])]:
            timing(t)
