"""Batched simulation — vmap datagen (BASELINE config 4).

The reference runs exactly one simulation per process (``main`` owns the six
grids, ``FluidSequential.c:273-334``).  On TPU, ``jax.vmap`` over the step
turns the same solver into a data generator: thousands of independent small
sims per chip, each with its own randomized sources, in one compiled program.

Sharding: batched state can additionally be distributed over a mesh axis
("batch" data parallelism) via ``jax.sharding``; spatial sharding stays the
domain of ``parallel.sharded`` (the two compose for large-grid datagen).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.state import reference_init
from .stable_fluids_2d import step

__all__ = ["batched_init", "make_batched_step_fn", "generate_trajectories"]


def batched_init(key: jax.Array, cfg: SimConfig, batch: int):
    """``batch`` independent reference-style initial conditions, each from
    its own PRNG fold (randomized center-square density + uniform velocity
    sources, mirroring ``initializeParameters``, ``FluidSequential.c:244-271``)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: reference_init(k, cfg))(keys)


def _use_batched_pallas(cfg: SimConfig) -> bool:
    """The Pallas kernels are batch-polymorphic (batch = leading grid dim),
    so batched state runs through them DIRECTLY — vmap is neither needed nor
    possible (ANY-memory blocks reject JAX batching)."""
    if cfg.pressure_solver != "jacobi":
        return False
    from ..kernels.dispatch import _on_tpu, _pallas_supported

    if cfg.backend == "pallas":
        return True
    return cfg.backend == "auto" and _on_tpu() and _pallas_supported(cfg)


def _batched_cfg(cfg: SimConfig) -> SimConfig:
    if cfg.backend in ("pallas", "auto"):
        cfg = cfg.replace(backend="reference")
    return cfg


def make_batched_step_fn(cfg: SimConfig) -> Callable:
    """Jitted step over a leading batch axis: batch-polymorphic Pallas
    kernels when available, vmapped jnp step otherwise."""
    if _use_batched_pallas(cfg):
        return jax.jit(functools.partial(step, cfg.replace(backend="pallas")))
    return jax.jit(jax.vmap(functools.partial(step, _batched_cfg(cfg))))


def generate_trajectories(
    key: jax.Array,
    cfg: SimConfig,
    batch: int,
    num_steps: int,
    *,
    snapshot_every: int = 0,
):
    """Run ``batch`` sims for ``num_steps`` (sources on step 1 only, like the
    reference harness).  Returns the final batched state; with
    ``snapshot_every=k`` also returns stacked density snapshots every k steps
    (the datagen payload), shape ``(num_snaps, batch, side, side)``.
    """
    state, sources = batched_init(key, cfg, batch)
    runner = _trajectory_runner(cfg, num_steps, snapshot_every)
    return runner(state, sources)


@functools.lru_cache(maxsize=16)
def _trajectory_runner(cfg: SimConfig, num_steps: int, snapshot_every: int):
    """Compiled trajectory scan, cached per (cfg, steps, cadence) — a fresh
    jit per call would re-trace the whole scan every time (measured ~19s of
    pure tracing overhead per datagen call)."""
    if _use_batched_pallas(cfg):
        vstep = functools.partial(step, cfg.replace(backend="pallas"))
    else:
        vstep = jax.vmap(functools.partial(step, _batched_cfg(cfg)))

    @jax.jit
    def run(state, sources):
        zeros = jax.tree.map(jnp.zeros_like, sources)

        def src_at(k):
            return jax.tree.map(
                lambda s, z: jnp.where(k == 0, s, z), sources, zeros
            )

        if not snapshot_every:
            def body(carry, k):
                return vstep(carry, src_at(k)), None

            final, _ = jax.lax.scan(body, state, jnp.arange(num_steps))
            return final, None

        # Snapshots accumulate into a (num_snaps, ...) carry buffer via
        # dynamic_update_slice — peak memory scales with num_snaps, not
        # num_steps (a per-step stacked scan output would be prohibitive
        # for long runs: 1024 sims x 256^2 x 1000 steps ~ 270 GB).
        num_snaps = num_steps // snapshot_every
        buf0 = jnp.zeros(
            (max(num_snaps, 1),) + state.dens.shape, state.dens.dtype
        )

        def body(carry, k):
            st, buf = carry
            st = vstep(st, src_at(k))
            idx = (k + 1) // snapshot_every - 1
            buf = jax.lax.cond(
                ((k + 1) % snapshot_every == 0) & (idx < num_snaps),
                lambda b: jax.lax.dynamic_update_slice(
                    b, st.dens[None], (idx,) + (0,) * st.dens.ndim
                ),
                lambda b: b,
                buf,
            )
            return (st, buf), None

        (final, buf), _ = jax.lax.scan(
            body, (state, buf0), jnp.arange(num_steps)
        )
        return final, buf[:num_snaps]

    return run
