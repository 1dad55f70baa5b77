"""Differential tests: Pallas kernels vs jnp reference ops.

Run in Pallas interpreter mode on CPU (bit-identical semantics to the Mosaic
compilation path at the JAX level); the same kernels execute compiled on TPU.
Covers strip tiling (side > single-strip threshold is emulated by patching
the strip picker), wall strips, boundary modes, multi-round-trip solves, and
the masked-shift advection window.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import ops
from fluidsimulationcuda_tpu.kernels import pallas_ops

pallas_ops.INTERPRET = True

TOL = dict(rtol=1e-6, atol=1e-6)


def _grid(key, side, scale=1.0):
    return (
        jax.random.uniform(jax.random.key(key), (side, side), jnp.float32, -1, 1)
        * scale
    )


@pytest.fixture
def strip_mode(monkeypatch):
    """Force multi-strip tiling even on small grids so the halo/window logic
    is exercised without 2048² interpreter runs."""

    def pick(side):
        for tm in (16, 8):
            if side % tm == 0 and side > tm:
                return tm
        return side

    monkeypatch.setattr(pallas_ops, "_pick_tm", pick)


@pytest.mark.parametrize("b", [0, 1, 2])
@pytest.mark.parametrize("iters", [1, 3, 20, 23])
def test_fused_jacobi_single_strip(b, iters):
    side = 64
    x, x0 = _grid(0, side), _grid(1, side)
    want = ops.diffuse(b, x, x0, 0.42, 2.68, iters)
    got = pallas_ops.fused_jacobi(b, x, x0, 0.42, 2.68, iters)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@pytest.mark.parametrize("b", [0, 1, 2])
@pytest.mark.parametrize("iters", [1, 2, 5])
def test_fused_jacobi_strips(strip_mode, b, iters):
    side = 64  # 4 strips of 16
    x, x0 = _grid(2, side), _grid(3, side)
    want = ops.diffuse(b, x, x0, 0.3, 2.2, iters)
    got = pallas_ops.fused_jacobi(b, x, x0, 0.3, 2.2, iters)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


def test_fused_jacobi_multi_roundtrip(strip_mode):
    """iters > max_fused splits into several kernel calls."""
    side = 32
    x, x0 = _grid(4, side), _grid(5, side)
    want = ops.diffuse(1, x, x0, 0.1, 1.4, 11)
    got = pallas_ops.fused_jacobi(1, x, x0, 0.1, 1.4, 11, max_fused=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


def test_fused_jacobi_src_fold_chained(strip_mode):
    """src_dt with iters > max_fused: every chunk's rhs must carry dt*src.
    Regression — the in-kernel fold only reaches the first chunk, so
    chained calls must materialize the rhs instead (the VMEM margin clamp
    can force chaining below the caller's max_fused request, e.g. 20 -> 7
    at 8192²; sweeps 8-20 then ran against an rhs missing the source)."""
    side = 64
    src, base = _grid(40, side, 0.5), _grid(41, side)
    dt = 0.016
    rhs = base + jnp.float32(dt) * src
    want = pallas_ops.fused_jacobi(1, src, rhs, 0.1, 1.4, 12, max_fused=20)
    got = pallas_ops.fused_jacobi(1, src, base, 0.1, 1.4, 12, max_fused=5,
                                  src_dt=dt)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pressure_solve_zero_init(strip_mode):
    side = 32
    div = _grid(6, side, 0.01)
    want = ops.pressure_solve(div, 8)
    got = pallas_ops.fused_jacobi(0, div, div, 1.0, 4.0, 8, zero_init=True,
                                  max_fused=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


@pytest.mark.parametrize("b", [0, 1, 2])
def test_advect(strip_mode, b):
    side = 64
    n = side - 2
    d0 = _grid(7, side)
    # displacement well inside the cmax=4 window: |dt*n*u| <= 0.016*62*2 ~ 2
    u = _grid(8, side, 2.0)
    v = _grid(9, side, 2.0)
    want = ops.advect(b, d0, u, v, 0.016, n)
    got = pallas_ops.advect_shift(b, d0, u, v, 0.016, n, cmax=4)
    # XLA FMA-contracts the backtrace (x = j - dt0*u) differently across
    # compilation contexts: a 1-ulp shift in x moves the bilinear weights by
    # ~4e-6.  Same class of difference the reference accepted between CUDA
    # and CPU (~1e-6, document/main.tex:349).
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=2e-5
    )


def test_advect_zero_velocity_identity(strip_mode):
    side = 32
    n = side - 2
    d0 = _grid(10, side)
    z = jnp.zeros_like(d0)
    got = pallas_ops.advect_shift(0, d0, z, z, 0.016, n, cmax=2)
    np.testing.assert_array_equal(
        np.asarray(got)[1:-1, 1:-1], np.asarray(d0)[1:-1, 1:-1]
    )


def test_advect_window_clamp_is_bounded(strip_mode):
    """Velocities beyond the window produce clamped (still finite, in-range)
    results rather than garbage."""
    side = 32
    n = side - 2
    d0 = _grid(11, side)
    big = jnp.full((side, side), 100.0, jnp.float32)
    got = np.asarray(pallas_ops.advect_shift(0, d0, big, big, 0.016, n, cmax=2))
    assert np.isfinite(got).all()
    assert got.min() >= np.asarray(d0).min() - 1e-6
    assert got.max() <= np.asarray(d0).max() + 1e-6


@pytest.mark.parametrize("fn_pair", ["divergence", "gradient"])
def test_div_grad(strip_mode, fn_pair):
    side = 64
    n = side - 2
    u, v, p = _grid(12, side), _grid(13, side), _grid(14, side)
    if fn_pair == "divergence":
        want = ops.divergence(u, v, n)
        got = pallas_ops.divergence_p(u, v, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)
    else:
        wu, wv = ops.apply_pressure_gradient(u, v, p, n)
        gu, gv = pallas_ops.gradient_p(u, v, p, n)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), **TOL)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), **TOL)


@pytest.mark.slow
def test_full_step_pallas_backend(strip_mode):
    """End-to-end: one full step through the pallas OpSet vs reference."""
    from fluidsimulationcuda_tpu import SimConfig, reference_init
    from fluidsimulationcuda_tpu.models.stable_fluids_2d import step

    cfg_ref = SimConfig(n=30, jacobi_iters=6, backend="reference")
    cfg_pal = cfg_ref.replace(backend="pallas", max_courant=2)
    state, sources = reference_init(jax.random.key(15), cfg_ref)
    want = step(cfg_ref, state, sources)
    got = step(cfg_pal, state, sources)
    for name in ("dens", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            err_msg=name,
            rtol=1e-5,
            atol=2e-5,  # FMA-contraction ulp noise in advection; see above
        )


@pytest.mark.parametrize("scale", [0.5, 20.0])
def test_windowed_jnp_matches_pallas_in_and_out_of_window(strip_mode, scale):
    """ops.advect_windowed is the jnp spec of the Pallas masked-shift
    gather: they must agree BOTH when the displacement fits the window and
    when the window clamp engages (scale=20 -> multi-cell displacement)."""
    side = 64
    n = side - 2
    d0 = _grid(20, side)
    u = _grid(21, side, scale)
    v = _grid(22, side, scale)
    want = ops.advect_windowed(1, d0, u, v, 0.016, n, cmax=3)
    got = pallas_ops.advect_shift(1, d0, u, v, 0.016, n, cmax=3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=2e-5
    )


def test_windowed_equals_exact_when_inside(strip_mode):
    side = 64
    n = side - 2
    d0, u, v = _grid(23, side), _grid(24, side, 1.0), _grid(25, side, 1.0)
    a = ops.advect(0, d0, u, v, 0.016, n)
    b = ops.advect_windowed(0, d0, u, v, 0.016, n, cmax=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_fast_math_close_to_exact(strip_mode):
    side = 64
    x, x0 = _grid(30, side), _grid(31, side)
    exact = pallas_ops.fused_jacobi(1, x, x0, 0.42, 2.68, 20)
    fast = pallas_ops.fused_jacobi(1, x, x0, 0.42, 2.68, 20, fast=True)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(exact), rtol=1e-4, atol=1e-5
    )


def test_supports_rejects_non_8_divisible_side():
    """side % 8 != 0 has no viable advect strip; supports() must gate it
    so backend='auto' falls back instead of raising mid-step."""
    from fluidsimulationcuda_tpu.kernels import pallas_ops as po
    from fluidsimulationcuda_tpu import SimConfig

    assert not po.supports(SimConfig(n=256))   # side 258
    assert po.supports(SimConfig(n=254))       # side 256
    assert po.supports(SimConfig(n=2046))      # side 2048 (headline)
    assert po.supports(SimConfig(n=8190))      # side 8192 (reference config)


@pytest.mark.slow
@pytest.mark.parametrize("iters,cmax", [(6, 2), (5, 1), (20, 1)])
def test_fused_dens_advect(strip_mode, iters, cmax):
    """Whole density pair (diffuse_src -> advect) fused in one kernel must
    match the two-kernel composition, including wall strips and the
    corner-as-gather-source case."""
    side = 96  # 6 strips of 16; wr = 16 + 2*ceil8(iters+1+cmax) <= side
    n = side - 2
    src, base = _grid(20, side, 0.5), _grid(21, side)
    u = _grid(22, side, 1.5)
    v = _grid(23, side, 1.5)
    alpha, beta, dt = 0.37, 1.0 + 4 * 0.37, 0.016
    d = pallas_ops.fused_jacobi(0, src, base + dt * src, alpha, beta, iters)
    want = pallas_ops.advect_shift(0, d, u, v, dt, n, cmax=cmax)
    got = pallas_ops.fused_dens_advect(0, src, base, u, v, alpha, beta,
                                       iters, dt, n, cmax=cmax)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=2e-5
    )


@pytest.mark.slow
def test_fused_dens_advect_batched(strip_mode):
    side, nb = 96, 2
    n = side - 2
    src = jnp.stack([_grid(30, side, 0.5), _grid(31, side, 0.5)])
    base = jnp.stack([_grid(32, side), _grid(33, side)])
    u = jnp.stack([_grid(34, side, 1.5), _grid(35, side, 1.5)])
    v = jnp.stack([_grid(36, side, 1.5), _grid(37, side, 1.5)])
    alpha, beta, dt, iters = 0.25, 2.0, 0.016, 7
    d = pallas_ops.fused_jacobi(0, src, base + dt * src, alpha, beta, iters)
    want = jnp.stack([
        pallas_ops.advect_shift(0, d[i], u[i], v[i], dt, n, cmax=2)
        for i in range(nb)
    ])
    got = pallas_ops.fused_dens_advect(0, src, base, u, v, alpha, beta,
                                       iters, dt, n, cmax=2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=2e-5
    )


def test_fused_dens_supported_gates():
    # whole-grid strip -> unsupported (separate kernels already fast)
    assert not pallas_ops.fused_dens_supported(128, 20, 2)
    # headline config: strips of 128, margin 24 -> supported
    assert pallas_ops.fused_dens_supported(2048, 20, 2)
    # window deeper than the grid -> unsupported
    assert not pallas_ops.fused_dens_supported(2048, 900, 2)


# ---------------------------------------------------------------------------
# bf16 storage mode (f32 compute in VMEM; non-parity, documented)
# ---------------------------------------------------------------------------


def _grid16(key, side, scale=1.0):
    return _grid(key, side, scale).astype(jnp.bfloat16)


def test_bf16_supports_gate():
    from fluidsimulationcuda_tpu.core.config import SimConfig

    assert pallas_ops.supports(SimConfig(n=126, dtype=jnp.bfloat16))
    assert pallas_ops.supports(SimConfig(n=2046, dtype=jnp.bfloat16))
    # side 136 is 8- but not 16-divisible -> bf16 rejected, f32 accepted
    assert not pallas_ops.supports(SimConfig(n=134, dtype=jnp.bfloat16))
    assert pallas_ops.supports(SimConfig(n=134))


@pytest.mark.slow
@pytest.mark.parametrize("iters", [3, 20])
def test_bf16_jacobi_tracks_f32(strip_mode, iters):
    """bf16 storage Jacobi must track the f32 solve to storage precision:
    sweeps run f32, only the HBM round-trips (and the rhs restage) round."""
    side = 64
    x, x0 = _grid(40, side), _grid(41, side)
    want = pallas_ops.fused_jacobi(0, x, x0, 0.42, 2.68, iters)
    got = pallas_ops.fused_jacobi(
        0, x.astype(jnp.bfloat16), x0.astype(jnp.bfloat16), 0.42, 2.68, iters
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.02
    )


def test_bf16_advect_matches_windowed_reference(strip_mode):
    """Same bf16 inputs through the kernel and the jnp windowed op: both
    gather with f32 coordinates from the same bf16 field, so they must
    agree to f32 arithmetic noise (NOT just bf16 tolerance)."""
    side = 64
    n = side - 2
    d0 = _grid16(42, side)
    u = _grid16(43, side, 1.5)
    v = _grid16(44, side, 1.5)
    want = ops.advect_windowed(0, d0, u, v, 0.08, n, 2)
    got = pallas_ops.advect_shift(0, d0, u, v, 0.08, n, cmax=2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_bf16_projection_tracks_f32(strip_mode):
    """bf16 projection vs the f32 projection of the SAME (bf16-rounded)
    inputs: the pressure sweeps run f32 either way, so the only extra error
    is the bf16 rounding of the outputs (~4e-3 on O(1) velocities)."""
    side = 64
    n = side - 2
    u = _grid16(45, side, 1.0)
    v = _grid16(46, side, 1.0)
    uo, vo = pallas_ops.fused_project(u, v, n, 20)
    uo32, vo32 = pallas_ops.fused_project(
        u.astype(jnp.float32), v.astype(jnp.float32), n, 20
    )
    assert uo.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(uo, np.float32), np.asarray(uo32), atol=1e-2, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(vo, np.float32), np.asarray(vo32), atol=1e-2, rtol=0
    )


@pytest.mark.slow
def test_bf16_full_step_differential_and_finite():
    """Whole bf16 pallas step (interpret mode): finite fields; the KERNEL
    bf16 trajectory must track the jnp bf16 trajectory tightly (both do f32
    compute over bf16 storage, so any gap is a kernel bug); and the bf16
    trajectory stays within bf16-accumulation distance of f32 (a loose
    sanity bound — the divergence from f32 is inherent storage rounding,
    measured identical for both backends)."""
    from fluidsimulationcuda_tpu import SimConfig, reference_init, step
    from fluidsimulationcuda_tpu.core.state import zero_sources

    def run(cfg, steps=3):
        s, src = reference_init(jax.random.key(7), cfg)
        z = zero_sources(cfg)
        for k in range(steps):
            s = step(cfg, s, src if k == 0 else z)
        return s

    base = dict(n=126, jacobi_iters=8, max_courant=2)
    s_p16 = run(SimConfig(**base, backend="pallas", dtype=jnp.bfloat16))
    s_r16 = run(SimConfig(**base, backend="reference", dtype=jnp.bfloat16,
                          advect_mode="windowed"))
    s_p32 = run(SimConfig(**base, backend="pallas"))

    def rl2(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)

    assert np.isfinite(np.asarray(s_p16.dens, np.float32)).all()
    assert np.isfinite(np.asarray(s_p16.u, np.float32)).all()
    assert rl2(s_p16.dens, s_r16.dens) < 0.01   # kernel vs jnp, same storage
    assert rl2(s_p16.u, s_r16.u) < 0.02
    assert rl2(s_p16.dens, s_p32.dens) < 0.15   # inherent bf16 drift bound


@pytest.mark.slow
@pytest.mark.parametrize("iters", [3, 20])
def test_fused_jacobi_pair_matches_two_singles(strip_mode, iters):
    """The batched u+v pair kernel (per-slab boundary signs) must match two
    independent solves bit-for-bit — same sweeps, only the BC sign source
    differs."""
    side = 64
    s1, s2 = _grid(50, side, 0.5), _grid(51, side, 0.5)
    b1, b2 = _grid(52, side), _grid(53, side)
    a, be, dt = 0.42, 1.0 + 4 * 0.42, 0.016
    w1 = pallas_ops.fused_jacobi(1, s1, b1, a, be, iters, src_dt=dt)
    w2 = pallas_ops.fused_jacobi(2, s2, b2, a, be, iters, src_dt=dt)
    g1, g2 = pallas_ops.fused_jacobi_pair(1, 2, s1, s2, b1, b2, a, be,
                                          iters, src_dt=dt)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(w2))


@pytest.mark.slow
def test_fused_jacobi_pair_batched(strip_mode):
    side, nb = 64, 3
    s1 = jnp.stack([_grid(60 + i, side, 0.5) for i in range(nb)])
    s2 = jnp.stack([_grid(70 + i, side, 0.5) for i in range(nb)])
    b1 = jnp.stack([_grid(80 + i, side) for i in range(nb)])
    b2 = jnp.stack([_grid(90 + i, side) for i in range(nb)])
    a, be = 0.3, 2.2
    w1 = pallas_ops.fused_jacobi(1, s1, b1, a, be, 5)
    w2 = pallas_ops.fused_jacobi(2, s2, b2, a, be, 5)
    g1, g2 = pallas_ops.fused_jacobi_pair(1, 2, s1, s2, b1, b2, a, be, 5)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(w2))
