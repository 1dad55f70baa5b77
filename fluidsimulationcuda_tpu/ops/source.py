"""External source injection: ``x += dt * s`` over the full padded grid
(``FluidSequential.c:78-82``).  Pure elementwise — XLA fuses it into the
consumer; it never needs a kernel of its own (the reference spends a full
4.4 ms HBM pass on it per call, BASELINE.md per-kernel table)."""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["add_source"]


def add_source(x: jnp.ndarray, s: jnp.ndarray, dt: float) -> jnp.ndarray:
    return x + jnp.asarray(dt, x.dtype) * s
