"""3-D extension: property tests + NumPy cross-check of the core ops.

The reference is strictly 2-D, so there is no oracle to transcribe; the 3-D
spec is checked against independent NumPy computations and physics
properties.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import SimConfig, reference_init
from fluidsimulationcuda_tpu.models.stable_fluids_3d import make_step_fn_3d
from fluidsimulationcuda_tpu.ops import three_d as o3


def _vol(key, n, scale=1.0):
    return (
        jax.random.uniform(jax.random.key(key), (n + 2,) * 3, jnp.float32, -1, 1)
        * scale
    )


@pytest.mark.parametrize("b", [0, 1, 2, 3])
def test_embed_faces_and_interior(b):
    n = 6
    interior = np.asarray(_vol(0, n))[1:-1, 1:-1, 1:-1]
    x = np.asarray(o3.embed_interior3(b, jnp.asarray(interior)))
    np.testing.assert_array_equal(x[1:-1, 1:-1, 1:-1], interior)
    sx = -1.0 if b == 1 else 1.0
    sy = -1.0 if b == 2 else 1.0
    sz = -1.0 if b == 3 else 1.0
    np.testing.assert_allclose(x[1:-1, 1:-1, 0], sx * interior[:, :, 0])
    np.testing.assert_allclose(x[1:-1, 1:-1, -1], sx * interior[:, :, -1])
    np.testing.assert_allclose(x[1:-1, 0, 1:-1], sy * interior[:, 0, :])
    np.testing.assert_allclose(x[0, 1:-1, 1:-1], sz * interior[0, :, :])
    # edge = mean of its two adjacent faces
    np.testing.assert_allclose(
        x[0, 0, 1:-1], 0.5 * (x[1, 0, 1:-1] + x[0, 1, 1:-1]), rtol=1e-6
    )
    # corner = mean of its three adjacent faces
    np.testing.assert_allclose(
        x[0, 0, 0], (x[1, 0, 0] + x[0, 1, 0] + x[0, 0, 1]) / 3.0, rtol=1e-6
    )


def test_diffuse3_matches_numpy():
    n = 6
    x0 = _vol(1, n)
    xi = _vol(2, n)
    alpha, beta = 0.3, 1 + 6 * 0.3
    got = np.asarray(o3.diffuse3(0, xi, x0, alpha, beta, 3))

    x = np.asarray(xi)
    rhs = np.asarray(x0)[1:-1, 1:-1, 1:-1]
    for _ in range(3):
        neigh = (
            (x[1:-1, 1:-1, :-2] + x[1:-1, 1:-1, 2:])
            + (x[1:-1, :-2, 1:-1] + x[1:-1, 2:, 1:-1])
            + (x[:-2, 1:-1, 1:-1] + x[2:, 1:-1, 1:-1])
        )
        inner = (rhs + np.float32(alpha) * neigh) / np.float32(beta)
        x = np.asarray(o3.embed_interior3(0, jnp.asarray(inner)))
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-6)


def test_advect3_zero_velocity_identity():
    n = 6
    d0 = _vol(3, n)
    z = jnp.zeros_like(d0)
    out = np.asarray(o3.advect3(0, d0, z, z, z, 0.016, n))
    np.testing.assert_array_equal(out[1:-1, 1:-1, 1:-1], np.asarray(d0)[1:-1, 1:-1, 1:-1])


def test_advect3_uniform_shift():
    """Constant velocity of exactly one cell per step shifts the volume."""
    n = 8
    d0 = _vol(4, n)
    dt = 0.016
    vel = 1.0 / (dt * n)  # backtrace displacement of exactly 1 cell in x
    u = jnp.full_like(d0, vel)
    z = jnp.zeros_like(d0)
    out = np.asarray(o3.advect3(0, d0, u, z, z, dt, n))
    # skip x=1: its backtrace hits the 0.5 clamp (FluidSequential.c:117-127
    # semantics) and blends the wall ghost instead of shifting.
    want = np.asarray(d0)[1:-1, 1:-1, 1:-2]
    np.testing.assert_allclose(out[1:-1, 1:-1, 2:-1], want, rtol=1e-4, atol=1e-5)


def test_project3_reduces_divergence():
    n = 16
    c = np.arange(n + 2, dtype=np.float32) / (n + 1) * 2 * np.pi
    zz, yy, xx = np.meshgrid(c, c, c, indexing="ij")
    u = jnp.asarray(np.sin(xx) * np.cos(yy), jnp.float32)
    v = jnp.asarray(np.cos(yy) * np.sin(zz), jnp.float32)
    w = jnp.asarray(np.sin(zz) * np.cos(xx), jnp.float32)
    div0 = np.asarray(o3.divergence3(u, v, w, n))[3:-3, 3:-3, 3:-3]
    gu, gv, gw = o3.project3(u, v, w, n, 600)
    div1 = np.asarray(o3.divergence3(gu, gv, gw, n))[3:-3, 3:-3, 3:-3]
    assert np.abs(div1).mean() < 0.15 * np.abs(div0).mean()


@pytest.mark.slow
def test_step3_runs_and_stays_finite():
    cfg = SimConfig(n=10, jacobi_iters=6, ndim=3, backend="reference")
    state, sources = reference_init(jax.random.key(5), cfg)
    step = make_step_fn_3d(cfg)
    s = step(state, sources)
    for _ in range(5):
        s = step(s, jax.tree.map(jnp.zeros_like, sources))
    for f in (s.dens, s.u, s.v, s.w):
        assert np.isfinite(np.asarray(f)).all()
    assert np.asarray(s.dens).min() > -1e-5


@pytest.mark.slow
def test_advect3_windowed_matches_exact_inside_window():
    n = 10
    d0, u, v, w = _vol(6, n), _vol(7, n, 1.0), _vol(8, n, 1.0), _vol(9, n, 1.0)
    a = np.asarray(o3.advect3(0, d0, u, v, w, 0.016, n))
    b = np.asarray(o3.advect3_windowed(0, d0, u, v, w, 0.016, n, cmax=2))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_advect3_windowed_clamps_finite():
    n = 8
    d0 = _vol(10, n)
    big = jnp.full_like(d0, 50.0)
    out = np.asarray(o3.advect3_windowed(0, d0, big, big, big, 0.016, n, cmax=2))
    assert np.isfinite(out).all()
    assert out.max() <= np.asarray(d0).max() + 1e-6


@pytest.mark.slow
def test_step_audited3_matches_step3_and_bounds_displacement():
    """The audited 3-D step must return the identical next state as step3
    plus a positive, finite displacement below the window in the stable
    regime (the cubic-cost window can then shrink to it)."""
    from fluidsimulationcuda_tpu.models.stable_fluids_3d import (
        step3, step_audited3,
    )

    cfg = SimConfig(n=14, jacobi_iters=4, ndim=3, backend="reference",
                    max_courant=3)
    state, sources = reference_init(jax.random.key(5), cfg)
    want = step3(cfg, state, sources)
    got, disp = step_audited3(cfg, state, sources)
    for name in ("dens", "u", "v", "w"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )
    d = float(disp)
    assert np.isfinite(d) and 0.0 < d < cfg.max_courant


def test_chebyshev_dens_3d_velocity_bit_parity():
    """3-D ``diffusion_solver="chebyshev-dens"``: velocity trajectory
    bit-identical to parity (density is passive), density solved by the
    cheby chain (``ops.chebyshev.cheby_diffuse3``) and finite."""
    kw = dict(n=10, jacobi_iters=6, ndim=3, backend="reference")
    cfg_j = SimConfig(**kw)
    cfg_d = SimConfig(diffusion_solver="chebyshev-dens", cheby_dens_iters=4,
                      **kw)
    state, sources = reference_init(jax.random.key(6), cfg_j)
    fj, fd = make_step_fn_3d(cfg_j), make_step_fn_3d(cfg_d)
    s_j, s_d = state, state
    zeros = jax.tree.map(jnp.zeros_like, sources)
    for k in range(3):
        src = sources if k == 0 else zeros
        s_j, s_d = fj(s_j, src), fd(s_d, src)
    np.testing.assert_array_equal(np.asarray(s_j.u), np.asarray(s_d.u))
    np.testing.assert_array_equal(np.asarray(s_j.v), np.asarray(s_d.v))
    np.testing.assert_array_equal(np.asarray(s_j.w), np.asarray(s_d.w))
    dens = np.asarray(s_d.dens)
    assert np.isfinite(dens).all()
    assert np.abs(dens - np.asarray(s_j.dens)).max() > 0


def test_sharded_3d_solver_support():
    """Sharded 3-D accepts every 3-D solver (jacobi/chebyshev variants)
    and still rejects the 2-D-only mg/cg pressure solvers."""
    from fluidsimulationcuda_tpu.parallel.mesh import make_mesh
    from fluidsimulationcuda_tpu.parallel.sharded3d import (
        make_sharded_step_fn_3d,
    )

    mesh = make_mesh(jax.devices()[:2], (2, 1))
    cfg = SimConfig(n=14, ndim=3, backend="reference",
                    diffusion_solver="chebyshev-dens")
    make_sharded_step_fn_3d(cfg, mesh)  # accepted since round 3
    cfg = cfg.replace(diffusion_solver="chebyshev",
                      pressure_solver="chebyshev")
    make_sharded_step_fn_3d(cfg, mesh)
    with pytest.raises(ValueError, match="2-D solvers"):
        make_sharded_step_fn_3d(
            cfg.replace(pressure_solver="multigrid"), mesh)
