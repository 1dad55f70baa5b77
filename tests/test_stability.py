"""The stability check the reference never implemented
(``FluidSequential.c:309`` — commented-out ``checkStability(u, v)``)."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import SimConfig, reference_init, step
from fluidsimulationcuda_tpu.core.state import FluidState
from fluidsimulationcuda_tpu.utils import (
    check_stability,
    is_stable,
)


def _cfg(**kw):
    return SimConfig(n=30, jacobi_iters=4, backend="reference", **kw)


def test_reference_trajectory_is_stable():
    cfg = _cfg()
    state, sources = reference_init(jax.random.key(0), cfg)
    state = jax.jit(lambda s, src: step(cfg, s, src))(state, sources)
    rep = check_stability(cfg, state)
    assert bool(rep.finite)
    assert float(rep.max_displacement) >= 0.0
    # displacement bound matches the audited definition dt*N*max speed
    want = cfg.dt * cfg.n * max(
        float(jnp.max(jnp.abs(state.u))), float(jnp.max(jnp.abs(state.v)))
    )
    np.testing.assert_allclose(float(rep.max_displacement), want, rtol=1e-6)


def test_nan_detected():
    cfg = _cfg()
    state, _ = reference_init(jax.random.key(0), cfg)
    bad = FluidState(
        dens=state.dens.at[3, 3].set(jnp.nan), u=state.u, v=state.v
    )
    rep = check_stability(cfg, bad)
    assert not bool(rep.finite)
    assert not is_stable(cfg, bad)


def test_window_violation_detected():
    cfg = _cfg(max_courant=1)
    state, _ = reference_init(jax.random.key(0), cfg)
    # a velocity spike that backtraces > 1 cell
    spike = 2.5 / (cfg.dt * cfg.n)
    fast = FluidState(dens=state.dens, u=state.u.at[5, 5].set(spike),
                      v=state.v)
    rep = check_stability(cfg, fast)
    assert bool(rep.finite)
    assert float(rep.max_displacement) > cfg.max_courant
    assert not is_stable(cfg, fast)
    # the same state is fine under a wide-enough window
    assert is_stable(dataclasses.replace(cfg, max_courant=4), fast)


def test_jit_and_3d():
    cfg = SimConfig(n=14, ndim=3, backend="reference", jacobi_iters=2)
    state, _ = reference_init(jax.random.key(1), cfg)
    rep = jax.jit(lambda s: check_stability(cfg, s))(state)
    assert bool(rep.finite)
    assert rep.max_speed.shape == ()
