"""Multigrid pressure solver (the reference's stated future work,
document/main.tex:356) — optional, non-parity, mesh-independent convergence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import SimConfig, make_step_fn, reference_init, ops
from fluidsimulationcuda_tpu.ops import multigrid as mg
from fluidsimulationcuda_tpu.ops.boundary import embed_interior


def _div(n, seed=0, amp=0.01):
    rng = np.random.default_rng(seed)
    return embed_interior(
        0, jnp.asarray(rng.uniform(-amp, amp, (n, n)).astype(np.float32))
    )


def _resnorm(p, div):
    return np.abs(np.asarray(mg.residual(p, div))[1:-1, 1:-1]).max()


@pytest.mark.slow
@pytest.mark.parametrize("n", [64, 128])
def test_vcycle_converges_fast(n):
    div = _div(n)
    r0 = _resnorm(jnp.zeros_like(div), div)
    p1 = mg.mg_pressure_solve(div, cycles=1)
    p3 = mg.mg_pressure_solve(div, cycles=3)
    assert _resnorm(p1, div) < 0.25 * r0          # >4x per cycle
    assert _resnorm(p3, div) < 0.02 * r0


@pytest.mark.slow
def test_two_cycles_beat_twenty_jacobi():
    n = 128
    div = _div(n, seed=1)
    p_mg = mg.mg_pressure_solve(div, cycles=2)
    p_j = ops.pressure_solve(div, 20)
    assert _resnorm(p_mg, div) < 0.5 * _resnorm(p_j, div)


def test_mg_levels():
    assert mg.mg_levels(128) == 4   # 128 -> 64 -> 32 -> 16 -> 8
    assert mg.mg_levels(2046) == 1  # 2046 -> 1023 (odd)
    assert mg.mg_levels(96) == 3    # 96 -> 48 -> 24 -> 12 (stop: 6 < 8)


@pytest.mark.slow
def test_step_with_multigrid_projection_runs_and_projects_better():
    cfg_j = SimConfig(n=64, jacobi_iters=20, backend="reference")
    cfg_m = cfg_j.replace(pressure_solver="multigrid", mg_cycles=2)
    state, sources = reference_init(jax.random.key(2), cfg_j)
    s_j = make_step_fn(cfg_j)(state, sources)
    s_m = make_step_fn(cfg_m)(state, sources)
    for f in (s_m.dens, s_m.u, s_m.v):
        assert np.isfinite(np.asarray(f)).all()
    # After a full step the residual divergence is dominated by the
    # collocated wide/compact stencil mismatch (see test_ops_vs_oracle), so
    # both solvers land on the same floor — assert comparability here; the
    # solver-level tests above prove the convergence advantage.
    dj = np.abs(np.asarray(ops.divergence(s_j.u, s_j.v, cfg_j.n))[8:-8, 8:-8])
    dm = np.abs(np.asarray(ops.divergence(s_m.u, s_m.v, cfg_m.n))[8:-8, 8:-8])
    assert dm.mean() < 1.2 * dj.mean()
