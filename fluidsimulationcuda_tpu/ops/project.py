"""Pressure projection (jnp reference backend).

Divergence + zero-initialized pressure (``computeDivergenceAndPressure``,
``FluidSequential.c:143-158``), Jacobi Poisson solve (alpha=1, beta=4,
``:218-220``), and gradient subtraction (``lastProject``, ``:161-173``).
"""
from __future__ import annotations

import jax.numpy as jnp

from .boundary import embed_interior
from .diffuse import diffuse

__all__ = ["divergence", "pressure_solve", "apply_pressure_gradient", "project"]


def divergence(u: jnp.ndarray, v: jnp.ndarray, n: int) -> jnp.ndarray:
    """``div = -0.5*h*(uR-uL + vD-vU)``, ``h = 1/n``
    (``FluidSequential.c:148-155``); boundary mode 0."""
    dtype = u.dtype
    h = jnp.asarray(1.0, dtype) / n
    d = (jnp.asarray(-0.5, dtype) * h) * (
        (u[1:-1, 2:] - u[1:-1, :-2]) + (v[2:, 1:-1] - v[:-2, 1:-1])
    )
    return embed_interior(0, d)


def pressure_solve(div: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Jacobi Poisson solve from a zero guess (p is zeroed in the reference,
    ``FluidSequential.c:153``)."""
    return diffuse(0, jnp.zeros_like(div), div, 1.0, 4.0, iters)


def apply_pressure_gradient(
    u: jnp.ndarray, v: jnp.ndarray, p: jnp.ndarray, n: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``u -= 0.5*(pR-pL)/h``, ``v -= 0.5*(pD-pU)/h``
    (``FluidSequential.c:165-172``); boundary modes 1 and 2."""
    dtype = u.dtype
    h = jnp.asarray(1.0, dtype) / n
    half = jnp.asarray(0.5, dtype)
    un = u[1:-1, 1:-1] - (half * (p[1:-1, 2:] - p[1:-1, :-2])) / h
    vn = v[1:-1, 1:-1] - (half * (p[2:, 1:-1] - p[:-2, 1:-1])) / h
    return embed_interior(1, un), embed_interior(2, vn)


def project(
    u: jnp.ndarray, v: jnp.ndarray, n: int, iters: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    div = divergence(u, v, n)
    p = pressure_solve(div, iters)
    return apply_pressure_gradient(u, v, p, n)
