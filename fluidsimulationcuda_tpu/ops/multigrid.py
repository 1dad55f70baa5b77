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


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Alternate a and b along ``axis`` (a first) — a pure stack+reshape,
    no scatter."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _prolong(e: jnp.ndarray) -> jnp.ndarray:
    """Bilinear prolongation of a padded coarse correction to the fine grid
    (cell-centered 2x refinement: weights 9/3/3/1 over the padded coarse
    field, which the copy BC makes well-defined at the walls).

    Scatter-free: the four fine parities are computed as whole coarse-grid
    arrays and interleaved with stack+reshape.  The earlier ``.at[1::2]``
    formulation lowered to strided scatters on TPU and dominated the whole
    V-cycle (measured: the jnp cycle at 2048² cost ~8 ms, mostly here)."""
    ec = e  # padded (nc+2, nc+2)
    c = ec[1:-1, 1:-1]
    up = ec[0:-2, 1:-1]
    down = ec[2:, 1:-1]
    left = ec[1:-1, 0:-2]
    right = ec[1:-1, 2:]
    ul = ec[0:-2, 0:-2]
    ur = ec[0:-2, 2:]
    dl = ec[2:, 0:-2]
    dr = ec[2:, 2:]
    # Fine cell parity (pi, pj) inside coarse cell: vertical neighbor is
    # up for pi=0 / down for pi=1; horizontal left/right likewise.
    f00 = 9.0 * c + 3.0 * up + 3.0 * left + ul
    f01 = 9.0 * c + 3.0 * up + 3.0 * right + ur
    f10 = 9.0 * c + 3.0 * down + 3.0 * left + dl
    f11 = 9.0 * c + 3.0 * down + 3.0 * right + dr
    top = _interleave(f00, f01, axis=1)
    bot = _interleave(f10, f11, axis=1)
    fine = _interleave(top, bot, axis=0) * (1.0 / 16.0)
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


# ---------------------------------------------------------------------------
# Fast path: deep padded hierarchy + Pallas fine-level smoother
# ---------------------------------------------------------------------------


def _pad1(r: jnp.ndarray) -> jnp.ndarray:
    """Grow an odd interior by one zero cell on the far side so the level
    can keep coarsening (2046 -> 1023 would otherwise end the hierarchy —
    the coarsest level would be a 1023² 40-sweep solve, which is the whole
    cost of the solve).  The fictitious cell has zero rhs and couples to
    its real neighbors through the 5-point operator — a standard
    padded-coarsening trick; the cycle stays a contraction (validated by
    the residual tests)."""
    inner = r[1:-1, 1:-1]
    nc = inner.shape[0]
    grown = jnp.zeros((nc + 1, nc + 1), r.dtype).at[:nc, :nc].set(inner)
    return embed_interior(0, grown)


def _smooth_pallas(p, div, sweeps: int, *, zero_init: bool = False):
    """Damped-Jacobi smoothing through the fused-sweep Pallas kernel
    (``kernels.pallas_ops.fused_jacobi`` with ``damp``): K sweeps per HBM
    round-trip vs one jnp pass per sweep."""
    from ..kernels.pallas_ops import fused_jacobi

    return fused_jacobi(0, p, div, 1.0, 4.0, sweeps, zero_init=zero_init,
                        damp=_OMEGA)


def _pallas_ok(side: int) -> bool:
    from ..kernels import pallas_ops
    from ..kernels.dispatch import _on_tpu

    if pallas_ops.INTERPRET:
        return True
    # Compiled Mosaic kernels only exist on TPU — attempting to lower them
    # on the CPU backend hangs the compile (observed, CLI --pressure-solver
    # multigrid on CPU).
    return _on_tpu() and side >= 128 and side % 8 == 0


def mg_pressure_solve_fast(div: jnp.ndarray, cycles: int = 2, *,
                           pre: int = 2, post: int = 2,
                           pallas_smoother: bool = True,
                           min_n: int = 16) -> jnp.ndarray:
    """V-cycles with a DEEP hierarchy (odd levels padded by one cell, so
    2046 -> 1023+1 -> 512 -> ... instead of stopping at a 1023² coarsest
    solve) and the fused Pallas kernel smoothing any level it supports.
    Same damped-Jacobi/full-weighting/bilinear components as ``v_cycle``;
    non-parity numerics either way (mg is an opt-in solver)."""

    def smooth(p, d, sweeps, zero_init=False):
        side = d.shape[0]
        if pallas_smoother and d.dtype == jnp.float32 and _pallas_ok(side):
            return _smooth_pallas(p, d, sweeps, zero_init=zero_init)
        if zero_init:
            p = jnp.zeros_like(d)
        return _smooth(p, d, sweeps)

    def cycle(p, d, zero_init=False):
        n = d.shape[0] - 2
        if n < min_n:
            return smooth(p, d, 40, zero_init=zero_init)
        p = smooth(p, d, pre, zero_init=zero_init)
        r = residual(p, d)
        if n % 2:
            r = _pad1(r)
        r_c = _restrict(r)
        e_c = cycle(jnp.zeros_like(r_c), r_c, zero_init=True)
        e_f = _prolong(e_c)
        if n % 2:
            e_f = e_f[:-1, :-1]  # drop the fictitious fine row/col
        p = embed_interior(0, p[1:-1, 1:-1] + e_f[1:-1, 1:-1])
        return smooth(p, d, post)

    p = jnp.zeros_like(div)
    for k in range(cycles):
        p = cycle(p, div, zero_init=(k == 0))
    return p
