"""3-D Pallas volume kernels vs the jnp 3-D ops (interpret mode).

Differential suite for ``kernels/pallas_ops_3d.py`` — per-op parity against
``ops/three_d.py`` and a full-step parity through the 3-D model dispatch.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import SimConfig
from fluidsimulationcuda_tpu.kernels import pallas_ops
from fluidsimulationcuda_tpu.ops import three_d as o3


@pytest.fixture(autouse=True)
def _interpret_mode():
    prev = pallas_ops.INTERPRET
    pallas_ops.INTERPRET = True
    yield
    pallas_ops.INTERPRET = prev


N = 22
SIDE = N + 2


def vol(rng, lo=-1.0, hi=1.0):
    return jnp.asarray(
        rng.uniform(lo, hi, (SIDE, SIDE, SIDE)).astype(np.float32)
    )


@pytest.mark.slow
def test_jacobi3_matches_diffuse3(rng):
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    x, x0 = vol(rng), vol(rng)
    for b in (0, 1, 2, 3):
        ref = o3.diffuse3(b, x, x0, 0.3, 2.8, 7)
        got = o3.set_bnd3(b, k3.fused_jacobi3(b, x, x0, 0.3, 2.8, 7))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5,
            err_msg=f"b={b}",
        )


def test_jacobi3_zero_init_matches_pressure3(rng):
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    div = vol(rng)
    ref = o3.pressure_solve3(div, 6)
    got = o3.set_bnd3(
        0, k3.fused_jacobi3(0, div, div, 1.0, 6.0, 6, zero_init=True)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_jacobi3_plan_calibrated():
    """The planner must keep the hardware-probed winners: tz=16/K=4 at
    production sides (dev/bench_r3l_jacobi3.py, 256³: 202 µs/sweep vs the
    round-2 DMA-metric plan's 270), every plan's modeled VMEM need inside
    the verified 96MB ceiling, and tz capped at 16 (tz=32 measured 326
    µs/sweep — too few strips to keep the DMA pipeline full)."""
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3
    from fluidsimulationcuda_tpu.kernels import pallas_sharded_3d as p3

    for side in (128, 192, 256):
        tz, K = k3._jacobi3_plan(side, 10)
        assert (tz, K) == (16, 4), (side, tz, K)
        assert k3._jacobi3_need(tz, K, side, 2) <= k3._VMEM3_CEIL
    # single-sweep callers still plan viably
    tz, K = k3._jacobi3_plan(256, 1)
    assert tz == 16 and K == 1
    # slab twin on a production-shaped slab (256³ over 8 chips): the
    # bigger 258-plane need tips K=4 just over the ceiling; K=3 at its
    # ~83MB cap is inside the verified pass range (>=76MB compiles)
    assert p3.jacobi3_slab_plan(32, 258, 20) == (16, 3)
    # halo depth never exceeds the slab
    tz, K = p3.jacobi3_slab_plan(4, 258, 20)
    assert K + 1 <= 4


def test_jacobi3_multi_chunk(rng):
    """iters > per-round-trip K forces chunking."""
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    x, x0 = vol(rng), vol(rng)
    ref = o3.diffuse3(1, x, x0, 0.3, 2.8, 9)
    got = o3.set_bnd3(1, k3.fused_jacobi3(1, x, x0, 0.3, 2.8, 9, max_fused=4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_jacobi3_cheby_matches_spec(rng):
    """Chebyshev chain kernel vs the jnp spec (``ops/chebyshev.py``),
    both diffusion (raw-guess first-sweep quirk) and zero-init pressure."""
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3
    from fluidsimulationcuda_tpu.ops.chebyshev import (
        cheby_diffuse3, cheby_pressure_solve3,
    )

    x, x0 = vol(rng), vol(rng)
    for b in (0, 1):
        ref = cheby_diffuse3(b, x, x0, 0.3, 2.8, 8, 0.95)
        got = o3.set_bnd3(
            b, k3.fused_jacobi3(b, x, x0, 0.3, 2.8, 8, cheby_rho=0.95)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5, err_msg=f"b={b}")
    div = vol(rng)
    ref = cheby_pressure_solve3(div, 8, 0.99)
    got = o3.set_bnd3(0, k3.fused_jacobi3(0, div, div, 1.0, 6.0, 8,
                                          zero_init=True, cheby_rho=0.99))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_jacobi3_cheby_cross_call_carry(rng):
    """Forcing the chain through several HBM round-trips (max_fused=3 ->
    3+3+2 calls) must match the jnp spec exactly like the one-shot chain:
    the x_{k-1} carry across calls is the whole point of the chain
    kernel's second output."""
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3
    from fluidsimulationcuda_tpu.ops.chebyshev import cheby_diffuse3

    x, x0 = vol(rng), vol(rng)
    ref = cheby_diffuse3(1, x, x0, 0.3, 2.8, 8, 0.9)
    got = o3.set_bnd3(
        1, k3.fused_jacobi3(1, x, x0, 0.3, 2.8, 8, cheby_rho=0.9,
                            max_fused=3)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_cheby_chain_plan_override_pinned():
    """The measured chain-plan override (dev/bench_r5c_plans3_focus.py)
    must stay pinned to the probed winner — silent drift of the table is
    a perf regression at the 3-D compensated pressure solve — and only
    listed entries may diverge from the analytic planner."""
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    assert k3._CHEBY_CHAIN_PLAN_MEASURED[(256, 12)] == (8, 3)
    for (side, iters), (tz, K) in k3._CHEBY_CHAIN_PLAN_MEASURED.items():
        # every override must itself be a VMEM-feasible chain plan
        assert side % tz == 0
        assert k3._jacobi3_need(tz, K, side, 3, 2) <= k3._VMEM3_CEIL


def test_divergence3_and_gradient3(rng):
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    u, v, w, p = vol(rng), vol(rng), vol(rng), vol(rng)
    ref = o3.divergence3(u, v, w, N)
    got = o3.set_bnd3(0, k3.divergence3_p(u, v, w, N))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)
    ru, rv, rw = o3.apply_pressure_gradient3(u, v, w, p, N)
    gu, gv, gw = k3.gradient3_p(u, v, w, p, N)
    for r, g, b in ((ru, gu, 1), (rv, gv, 2), (rw, gw, 3)):
        np.testing.assert_allclose(
            np.asarray(o3.set_bnd3(b, g)), np.asarray(r), rtol=0, atol=1e-5
        )


@pytest.mark.parametrize("disp", [(0.4, -0.3, 0.2), (1.7, 1.7, -1.7),
                                  (9.0, -9.0, 9.0)])
@pytest.mark.slow
def test_advect3_shift_matches_windowed(rng, disp):
    """Constant displacements spanning the window incl. clamped regime."""
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    d0 = o3.set_bnd3(0, vol(rng, 0.0, 1.0))
    dt = 0.016
    dt0 = dt * N
    u = jnp.full((SIDE,) * 3, np.float32(-disp[0] / dt0))
    v = jnp.full((SIDE,) * 3, np.float32(-disp[1] / dt0))
    w = jnp.full((SIDE,) * 3, np.float32(-disp[2] / dt0))
    ref = o3.advect3_windowed(0, d0, u, v, w, dt, N, cmax=2)
    got = o3.set_bnd3(0, k3.advect3_shift(0, d0, u, v, w, dt, N, cmax=2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_advect3_random_velocities(rng):
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    d0 = o3.set_bnd3(0, vol(rng, 0.0, 1.0))
    u, v, w = vol(rng), vol(rng), vol(rng)
    ref = o3.advect3_windowed(0, d0, u, v, w, 0.016, N, cmax=2)
    got = o3.set_bnd3(0, k3.advect3_shift(0, d0, u, v, w, 0.016, N, cmax=2))
    # atol 3e-6: XLA may contract the backtrace FMA differently in the two
    # programs; a 1-ulp coordinate at a cell boundary picks the adjacent
    # (zero-weight) cell, leaving ulp-scale value differences.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-6)


@pytest.mark.slow
def test_advect3_fused_self_advection(rng):
    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3

    u, v, w = vol(rng), vol(rng), vol(rng)
    au, av, aw = k3.advect3_shift_fused((1, 2, 3), (u, v, w), u, v, w,
                                        0.016, N, cmax=2, self_advect=True)
    for b, got, d0 in ((1, au, u), (2, av, v), (3, aw, w)):
        ref = o3.advect3_windowed(b, d0, u, v, w, 0.016, N, cmax=2)
        np.testing.assert_allclose(
            np.asarray(o3.set_bnd3(b, got)), np.asarray(ref),
            rtol=0, atol=3e-6, err_msg=f"b={b}",  # 1-ulp backtrace noise
        )


@pytest.mark.slow
def test_step3_pallas_matches_jnp(rng):
    """Full 3-D step through the model dispatch: pallas backend == jnp."""
    from fluidsimulationcuda_tpu.core.state import FluidState, Sources
    from fluidsimulationcuda_tpu.models.stable_fluids_3d import step3

    cfg_p = SimConfig(n=N, ndim=3, jacobi_iters=5, backend="pallas",
                      max_courant=2)
    cfg_r = cfg_p.replace(backend="reference")
    k = jax.random.split(jax.random.key(0), 4)
    shape = (SIDE,) * 3
    src = Sources(
        dens=jax.random.uniform(k[0], shape, jnp.float32),
        u=jax.random.uniform(k[1], shape, jnp.float32, -1, 1) * 0.1,
        v=jax.random.uniform(k[2], shape, jnp.float32, -1, 1) * 0.1,
        w=jax.random.uniform(k[3], shape, jnp.float32, -1, 1) * 0.1,
    )
    zeros = jnp.zeros(shape, jnp.float32)
    state = FluidState(dens=zeros, u=zeros, v=zeros, w=zeros)
    sp = functools.partial(step3, cfg_p)(state, src)
    sr = functools.partial(step3, cfg_r)(state, src)
    for name in ("dens", "u", "v", "w"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp, name)), np.asarray(getattr(sr, name)),
            rtol=0, atol=2e-5, err_msg=name,
        )


@pytest.mark.slow
def test_step3_chebyshev_pallas_matches_jnp(rng):
    """3-D perf-mode pressure (chebyshev) through the model dispatch:
    pallas chain kernel == jnp spec at the step level."""
    from fluidsimulationcuda_tpu.core.state import FluidState, Sources
    from fluidsimulationcuda_tpu.models.stable_fluids_3d import step3

    cfg_p = SimConfig(n=N, ndim=3, jacobi_iters=5, backend="pallas",
                      max_courant=2, pressure_solver="chebyshev",
                      cheby_iters=6, cheby_rho=0.95)
    cfg_r = cfg_p.replace(backend="reference")
    k = jax.random.split(jax.random.key(1), 4)
    shape = (SIDE,) * 3
    src = Sources(
        dens=jax.random.uniform(k[0], shape, jnp.float32),
        u=jax.random.uniform(k[1], shape, jnp.float32, -1, 1) * 0.1,
        v=jax.random.uniform(k[2], shape, jnp.float32, -1, 1) * 0.1,
        w=jax.random.uniform(k[3], shape, jnp.float32, -1, 1) * 0.1,
    )
    zeros = jnp.zeros(shape, jnp.float32)
    state = FluidState(dens=zeros, u=zeros, v=zeros, w=zeros)
    sp = functools.partial(step3, cfg_p)(state, src)
    sr = functools.partial(step3, cfg_r)(state, src)
    for name in ("dens", "u", "v", "w"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp, name)), np.asarray(getattr(sr, name)),
            rtol=0, atol=2e-5, err_msg=name,
        )


@pytest.mark.slow
def test_step3_compensated_pallas_matches_jnp(rng):
    """3-D compensated mode (velocity + density diffusion on Chebyshev,
    pressure on a raised Chebyshev sweep count — the 3-D twin of the 2-D
    default perf mode, dev/bench_r3s_3dcomp.py): all five solves route the
    chain kernels; pallas == jnp spec at the step level."""
    from fluidsimulationcuda_tpu.core.state import FluidState, Sources
    from fluidsimulationcuda_tpu.models.stable_fluids_3d import step3

    cfg_p = SimConfig(n=N, ndim=3, jacobi_iters=5, backend="pallas",
                      max_courant=2, pressure_solver="chebyshev",
                      diffusion_solver="chebyshev", cheby_iters=4,
                      cheby_press_iters=6, cheby_rho=0.9)
    cfg_r = cfg_p.replace(backend="reference")
    k = jax.random.split(jax.random.key(3), 4)
    shape = (SIDE,) * 3
    src = Sources(
        dens=jax.random.uniform(k[0], shape, jnp.float32),
        u=jax.random.uniform(k[1], shape, jnp.float32, -1, 1) * 0.1,
        v=jax.random.uniform(k[2], shape, jnp.float32, -1, 1) * 0.1,
        w=jax.random.uniform(k[3], shape, jnp.float32, -1, 1) * 0.1,
    )
    zeros = jnp.zeros(shape, jnp.float32)
    state = FluidState(dens=zeros, u=zeros, v=zeros, w=zeros)
    sp = functools.partial(step3, cfg_p)(state, src)
    sr = functools.partial(step3, cfg_r)(state, src)
    for name in ("dens", "u", "v", "w"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp, name)), np.asarray(getattr(sr, name)),
            rtol=0, atol=2e-5, err_msg=name,
        )


@pytest.mark.slow
def test_step3_chebyshev_dens_pallas_matches_jnp(rng):
    """3-D density-only Chebyshev (``diffusion_solver="chebyshev-dens"``)
    through the model dispatch: the dens solve runs the chain kernel with
    the raw-guess first sweep; pallas == jnp spec at the step level."""
    from fluidsimulationcuda_tpu.core.state import FluidState, Sources
    from fluidsimulationcuda_tpu.models.stable_fluids_3d import step3

    cfg_p = SimConfig(n=N, ndim=3, jacobi_iters=5, backend="pallas",
                      max_courant=2, diffusion_solver="chebyshev-dens",
                      cheby_dens_iters=4, cheby_rho=0.95)
    cfg_r = cfg_p.replace(backend="reference")
    k = jax.random.split(jax.random.key(2), 4)
    shape = (SIDE,) * 3
    src = Sources(
        dens=jax.random.uniform(k[0], shape, jnp.float32),
        u=jax.random.uniform(k[1], shape, jnp.float32, -1, 1) * 0.1,
        v=jax.random.uniform(k[2], shape, jnp.float32, -1, 1) * 0.1,
        w=jax.random.uniform(k[3], shape, jnp.float32, -1, 1) * 0.1,
    )
    zeros = jnp.zeros(shape, jnp.float32)
    state = FluidState(dens=zeros, u=zeros, v=zeros, w=zeros)
    sp = functools.partial(step3, cfg_p)(state, src)
    sr = functools.partial(step3, cfg_r)(state, src)
    for name in ("dens", "u", "v", "w"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp, name)), np.asarray(getattr(sr, name)),
            rtol=0, atol=2e-5, err_msg=name,
        )
