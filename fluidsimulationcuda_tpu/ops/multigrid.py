"""Geometric multigrid pressure solver — the reference's future work.

The reference concludes that its Jacobi pressure solve is the bottleneck and
names conjugate gradient / multigrid as future work (``document/main.tex:356``).
This module implements that roadmap item: a V-cycle for the discrete Poisson
problem the projection solves,

    A p = div,   A p := 4 p - (pL + pR + pU + pD)    (unit index spacing),

with the solver's copy (Neumann-like) boundary rule on every level.  It is an
*optional alternative* to the parity-exact Jacobi solver
(``SimConfig.pressure_solver = "multigrid"``): convergence is mesh-independent
(a few V-cycles) instead of O(n²) sweeps, at the cost of departing from the
reference's numerics.

Components: damped-Jacobi smoothing, full-weighting restriction (×4 rhs
scaling for the coarse operator), bilinear prolongation, recursive coarsening
while the interior size stays even, ~40 Jacobi sweeps on the coarsest level.
Pure jnp — runs on every backend and under ``shard_map``-free single-chip
jit; n must be even down to the coarsest level used.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boundary import embed_interior

__all__ = ["v_cycle", "mg_pressure_solve", "mg_levels", "residual"]


def _apply_A(p: jnp.ndarray) -> jnp.ndarray:
    """Interior application of A = 4I - N."""
    return 4.0 * p[1:-1, 1:-1] - (
        (p[1:-1, :-2] + p[1:-1, 2:]) + p[:-2, 1:-1] + p[2:, 1:-1]
    )


def residual(p: jnp.ndarray, div: jnp.ndarray) -> jnp.ndarray:
    """r = div - A p on the interior, ghost ring via copy BC."""
    return embed_interior(0, div[1:-1, 1:-1] - _apply_A(p))


_OMEGA = 0.8  # damped Jacobi: plain Jacobi leaves the checkerboard mode
#               undamped (amplification -1) and is not a smoother.


def _smooth(p: jnp.ndarray, div: jnp.ndarray, sweeps: int) -> jnp.ndarray:
    """Damped-Jacobi smoothing: p <- (1-w) p + w (div + N p) / 4."""
    rhs = div[1:-1, 1:-1]
    w = jnp.asarray(_OMEGA, p.dtype)
    one_m_w = jnp.asarray(1.0 - _OMEGA, p.dtype)

    def body(_, p):
        neigh = (p[1:-1, :-2] + p[1:-1, 2:]) + p[:-2, 1:-1] + p[2:, 1:-1]
        new = one_m_w * p[1:-1, 1:-1] + w * ((rhs + neigh) * 0.25)
        return embed_interior(0, new)

    return jax.lax.fori_loop(0, sweeps, body, p)


def _restrict(r: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting 2x restriction of a padded field (interior n -> n/2),
    scaled by 4 so the same unit-spacing stencil discretizes the coarse
    operator ((h_H/h_h)^2 = 4)."""
    rin = r[1:-1, 1:-1]
    n = rin.shape[0]
    coarse = rin.reshape(n // 2, 2, n // 2, 2).mean(axis=(1, 3))
    return embed_interior(0, 4.0 * coarse)


def _prolong(e: jnp.ndarray) -> jnp.ndarray:
    """Bilinear prolongation of a padded coarse correction to the fine grid
    (cell-centered 2x refinement: weights 9/3/3/1 over the padded coarse
    field, which the copy BC makes well-defined at the walls)."""
    # Fine cell (i, j) lies inside coarse cell (i//2, j//2); its bilinear
    # stencil uses that cell and the neighbor toward the fine cell's side.
    ec = e  # padded (nc+2, nc+2)
    nc = ec.shape[0] - 2
    # Gather the four coarse neighbors for each fine interior cell via
    # upsample-by-2 of shifted coarse views.
    c = ec[1:-1, 1:-1]
    up = ec[0:-2, 1:-1]
    down = ec[2:, 1:-1]
    left = ec[1:-1, 0:-2]
    right = ec[1:-1, 2:]

    def up2(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)

    cc = up2(c)
    # vertical neighbor: up for even fine rows, down for odd
    vert = up2(up).at[1::2, :].set(up2(down)[1::2, :])
    horiz = up2(left).at[:, 1::2].set(up2(right)[:, 1::2])
    # diagonal neighbor combines both choices
    diag_u = up2(ec[0:-2, 0:-2]).at[:, 1::2].set(
        up2(ec[0:-2, 2:])[:, 1::2]
    )
    diag = diag_u.at[1::2, :].set(
        up2(ec[2:, 0:-2]).at[:, 1::2].set(up2(ec[2:, 2:])[:, 1::2])[1::2, :]
    )
    fine = (9.0 * cc + 3.0 * vert + 3.0 * horiz + diag) / 16.0
    return embed_interior(0, fine)


def mg_levels(n: int, min_n: int = 8) -> int:
    """How many times the interior can be halved (while even and > min_n)."""
    lv = 0
    while n % 2 == 0 and n // 2 >= min_n:
        n //= 2
        lv += 1
    return lv


def v_cycle(p, div, level: int, pre: int = 2, post: int = 2,
            coarse_sweeps: int = 40):
    p = _smooth(p, div, pre)
    if level == 0:
        return _smooth(p, div, coarse_sweeps)
    r = residual(p, div)
    r_c = _restrict(r)
    e_c = v_cycle(jnp.zeros_like(r_c), r_c, level - 1, pre, post,
                  coarse_sweeps)
    p = embed_interior(0, p[1:-1, 1:-1] + _prolong(e_c)[1:-1, 1:-1])
    return _smooth(p, div, post)


def mg_pressure_solve(div: jnp.ndarray, cycles: int = 2, *, pre: int = 2,
                      post: int = 2) -> jnp.ndarray:
    """Multigrid Poisson solve from a zero initial guess (drop-in for
    ``ops.pressure_solve``)."""
    n = div.shape[0] - 2
    levels = mg_levels(n)
    p = jnp.zeros_like(div)
    for _ in range(cycles):
        p = v_cycle(p, div, levels, pre, post)
    return p
