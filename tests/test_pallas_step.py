"""Step-level fused kernels (kernels/pallas_step.py) vs their composition.

Interpret mode on CPU; the compiled twin runs in ``dev/validate_tpu.py``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu.kernels import pallas_ops, pallas_step


@pytest.fixture(autouse=True)
def _interpret():
    prev = pallas_ops.INTERPRET
    pallas_ops.INTERPRET = True
    yield
    pallas_ops.INTERPRET = prev


def _vel_pair(n, seed=0, scale=1.0):
    side = n + 2
    k1, k2 = jax.random.split(jax.random.key(seed))
    u = jax.random.uniform(k1, (side, side), jnp.float32, -1, 1) * scale
    v = jax.random.uniform(k2, (side, side), jnp.float32, -1, 1) * scale
    # Ghost ring as the previous projection would leave it (modes 1/2).
    from fluidsimulationcuda_tpu.ops.boundary import embed_interior

    return embed_interior(1, u[1:-1, 1:-1]), embed_interior(2, v[1:-1, 1:-1])


def _composed(u, v, n, iters, dt, cmax):
    u2 = pallas_ops.advect_shift(1, u, u, v, dt, n, cmax=cmax)
    v2 = pallas_ops.advect_shift(2, v, u, v, dt, n, cmax=cmax)
    return pallas_ops.fused_project(u2, v2, n, iters)


@pytest.mark.parametrize("iters,cmax", [(6, 1), (6, 2), (3, 1)])
def test_advect_project_matches_composition(iters, cmax):
    n = 126
    u, v = _vel_pair(n, seed=1)
    assert pallas_step.advect_project_supported(n + 2, iters, cmax)
    uo, vo = pallas_step.fused_advect_project(u, v, n, iters, 0.016,
                                              cmax=cmax)
    uw, vw = _composed(u, v, n, iters, 0.016, cmax)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(uw),
                               rtol=0, atol=1e-6, err_msg="u")
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vw),
                               rtol=0, atol=1e-6, err_msg="v")


def test_advect_project_large_displacement_clamps_like_composition():
    """Out-of-window displacements must clamp identically to the unfused
    kernels (same windowed semantics, same clamp).  Tolerance is the
    backtrace FMA-contraction class, not bitwise: the unfused kernel's
    strip-range reductions (round-3 term skipping) give XLA different
    fusion opportunities for ``x = j - dt0*u``, and a 1-ulp shift in x
    flips j0 on knife-edge clamped cells (same class test_pallas_ops
    accepts vs the jnp spec)."""
    n = 126
    u, v = _vel_pair(n, seed=3, scale=40.0)  # multi-cell displacement
    uo, vo = pallas_step.fused_advect_project(u, v, n, 6, 0.016, cmax=2)
    uw, vw = _composed(u, v, n, 6, 0.016, 2)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(uw),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vw),
                               rtol=1e-4, atol=1e-4)


def test_full_pallas_step_matches_reference():
    """Full pallas step vs the jnp reference step.  (The fused tail is NOT
    wired by default — measured slower, see pallas_step module doc — so
    this pins the composed path; the fused kernel is covered above.)"""
    import functools

    from fluidsimulationcuda_tpu import (
        SimConfig, reference_init, step,
    )

    cfg_p = SimConfig(n=126, jacobi_iters=6, backend="pallas", max_courant=2)
    cfg_r = cfg_p.replace(backend="reference", advect_mode="windowed")
    state, sources = reference_init(jax.random.key(5), cfg_p)
    got = jax.jit(functools.partial(step, cfg_p))(state, sources)
    want = jax.jit(functools.partial(step, cfg_r))(state, sources)
    for name in ("dens", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-5, atol=1e-5, err_msg=name,
        )
