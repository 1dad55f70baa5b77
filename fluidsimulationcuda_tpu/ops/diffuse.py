"""Jacobi diffusion / Poisson solves (jnp reference backend).

The reference runs the Jacobi loop three different ways: 40 host-side kernel
launches per solve (``naivePar/FluidParallelBlockPerElement-Naive.cu:261-264``,
commented "inefficient -> multiple kernel calls"), cooperative-groups
whole-grid sync to keep the loop in one launch
(``optPar/GROUP-BlockPerElement.cu:124-160``), and an (abandoned, racy)
in-kernel loop (``naivePar/FluidParallelError.cu:117-134``).  Under ``jax.jit``
the whole solve is one compiled program by construction — ``lax.fori_loop``
over sweeps, no launches, no barriers, no race class.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boundary import embed_interior

__all__ = ["jacobi_sweep", "diffuse"]


def jacobi_sweep(
    b: int, x: jnp.ndarray, rhs_int: jnp.ndarray, alpha, beta
) -> jnp.ndarray:
    """One Jacobi sweep (``FluidSequential.c:93-101``):
    ``x'[c] = (rhs[c] + alpha*(xL+xR+xU+xD)) / beta`` on the interior, border
    re-derived via mode-``b`` boundary rule.  ``rhs_int`` is the (n, n)
    interior of the right-hand side."""
    neigh = ((x[1:-1, :-2] + x[1:-1, 2:]) + x[:-2, 1:-1]) + x[2:, 1:-1]
    return embed_interior(b, (rhs_int + alpha * neigh) / beta)


def diffuse(
    b: int,
    x_init: jnp.ndarray,
    x0: jnp.ndarray,
    alpha: float,
    beta: float,
    iters: int,
) -> jnp.ndarray:
    """``iters`` Jacobi sweeps starting from guess ``x_init`` with RHS ``x0``
    (``FluidSequential.c:85-104``).  Covers both diffusion
    (alpha = dt*k*n², beta = 1+4*alpha, ``:179-180,199-200``) and the
    pressure Poisson solve (alpha=1, beta=4, ``:218-219``)."""
    dt = x0.dtype
    a = jnp.asarray(alpha, dt)
    bt = jnp.asarray(beta, dt)
    rhs_int = x0[1:-1, 1:-1]

    def body(_, x):
        return jacobi_sweep(b, x, rhs_int, a, bt)

    return jax.lax.fori_loop(0, iters, body, x_init)
