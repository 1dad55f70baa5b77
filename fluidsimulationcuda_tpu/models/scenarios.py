"""Initial-condition / forcing scenarios.

The reference has exactly one scenario: a random center-square density
source with uniform random velocities injected on step 1
(``initializeParameters``, ``FluidSequential.c:244-271`` —
``reference_init`` here).  These add the standard demo set; each returns
``(FluidState, Sources)`` and a suggested ``sources_every_step`` flag.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.state import Sources, reference_init, zero_state

__all__ = ["reference_square", "plume", "vortex_pair", "opposing_jets", "SCENARIOS"]


def _coords(cfg: SimConfig):
    side = cfg.n + 2
    c = jnp.arange(side, dtype=cfg.dtype)
    return jnp.meshgrid(c, c, indexing="ij")  # (ii rows/y, jj cols/x)


def reference_square(key: jax.Array, cfg: SimConfig):
    """The reference's own scenario (impulse sources, step 1 only)."""
    state, sources = reference_init(key, cfg)
    return state, sources, False


def plume(key: jax.Array, cfg: SimConfig):
    """Continuous bottom-center dye inflow with upward velocity — a smoke
    plume (needs ``sources_every_step=True``).  Works in 2-D and 3-D (the
    smoke-volume demo for BASELINE config 5): the nozzle becomes a
    cylinder, y stays the vertical axis (row 0 = top, like 2-D)."""
    side = cfg.n + 2
    cx = side / 2.0
    r = side / 16.0
    if cfg.ndim == 3:
        c = jnp.arange(side, dtype=cfg.dtype)
        zz = c[:, None, None]
        yy = c[None, :, None]
        xx = c[None, None, :]
        nozzle = (
            ((xx - cx) ** 2 + (zz - cx) ** 2 < r**2)
            & (yy > side - side // 8)
        )
        dens = jnp.where(nozzle, 2.0, 0.0).astype(cfg.dtype)
        v = jnp.where(nozzle, -3.0, 0.0).astype(cfg.dtype)  # upward
        ku, kw = jax.random.split(key)
        u = jnp.where(nozzle, 0.3 * jax.random.normal(ku, nozzle.shape,
                                                      cfg.dtype), 0.0)
        w = jnp.where(nozzle, 0.3 * jax.random.normal(kw, nozzle.shape,
                                                      cfg.dtype), 0.0)
        return zero_state(cfg), Sources(dens=dens, u=u, v=v, w=w), True
    ii, jj = _coords(cfg)
    nozzle = ((jj - cx) ** 2 < r**2) & (ii > side - side // 8)
    dens = jnp.where(nozzle, 2.0, 0.0).astype(cfg.dtype)
    v = jnp.where(nozzle, -3.0, 0.0).astype(cfg.dtype)  # upward (row 0 = top)
    jitter = 0.3 * jax.random.normal(key, (side, side), cfg.dtype)
    u = jnp.where(nozzle, jitter, 0.0)
    return zero_state(cfg), Sources(dens=dens, u=u, v=v), True


def vortex_pair(key: jax.Array, cfg: SimConfig):
    """Two counter-rotating vortices advecting a dye stripe (impulse).
    2-D only."""
    if cfg.ndim != 2:
        raise ValueError("scenario 'vortex-pair' is 2-D only; "
                         "use 'plume' or 'reference' for ndim=3")
    side = cfg.n + 2
    ii, jj = _coords(cfg)
    y = (ii - side / 2.0) / side
    x = (jj - side / 2.0) / side

    def vortex(cx, cy, sign):
        dx, dy = x - cx, y - cy
        r2 = dx * dx + dy * dy + 1e-4
        amp = sign * jnp.exp(-r2 * 80.0)
        return -dy * amp, dx * amp

    u1, v1 = vortex(-0.15, 0.0, 40.0)
    u2, v2 = vortex(0.15, 0.0, -40.0)
    u = (u1 + u2).astype(cfg.dtype)
    v = (v1 + v2).astype(cfg.dtype)
    dens = jnp.exp(-(y * y) * 200.0).astype(cfg.dtype)  # horizontal stripe
    return zero_state(cfg), Sources(dens=dens, u=u, v=v), False


def opposing_jets(key: jax.Array, cfg: SimConfig):
    """Left and right inflow jets colliding at the center (continuous).
    2-D only."""
    if cfg.ndim != 2:
        raise ValueError("scenario 'jets' is 2-D only; "
                         "use 'plume' or 'reference' for ndim=3")
    side = cfg.n + 2
    ii, jj = _coords(cfg)
    band = jnp.abs(ii - side / 2.0) < side / 24.0
    left = band & (jj < side // 10)
    right = band & (jj > side - side // 10)
    u = jnp.where(left, 2.0, 0.0) + jnp.where(right, -2.0, 0.0)
    dens = jnp.where(left | right, 1.0, 0.0)
    return (
        zero_state(cfg),
        Sources(dens=dens.astype(cfg.dtype), u=u.astype(cfg.dtype),
                v=jnp.zeros_like(u, cfg.dtype)),
        True,
    )


SCENARIOS = {
    "reference": reference_square,
    "plume": plume,
    "vortex-pair": vortex_pair,
    "jets": opposing_jets,
}
