"""Round-3 multigrid fast path: scatter-free prolongation, deep padded
hierarchy, Pallas fine-level smoother."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu.kernels import pallas_ops
from fluidsimulationcuda_tpu.ops.multigrid import (
    _prolong,
    mg_pressure_solve,
    mg_pressure_solve_fast,
    residual,
)


def _prolong_reference(ec: np.ndarray) -> np.ndarray:
    """Literal 9/3/3/1 cell-centered prolongation, scalar loops."""
    nc = ec.shape[0] - 2
    nf = 2 * nc
    out = np.zeros((nf + 2, nf + 2), np.float32)
    for i in range(nf):
        for j in range(nf):
            a, b = i // 2 + 1, j // 2 + 1
            vi = a - 1 if i % 2 == 0 else a + 1
            vj = b - 1 if j % 2 == 0 else b + 1
            out[i + 1, j + 1] = (
                9 * ec[a, b] + 3 * ec[vi, b] + 3 * ec[a, vj] + ec[vi, vj]
            ) / 16.0
    # copy-BC ghost ring
    out[0, 1:-1] = out[1, 1:-1]
    out[-1, 1:-1] = out[-2, 1:-1]
    out[1:-1, 0] = out[1:-1, 1]
    out[1:-1, -1] = out[1:-1, -2]
    out[0, 0] = 0.5 * (out[0, 1] + out[1, 0])
    out[0, -1] = 0.5 * (out[0, -2] + out[1, -1])
    out[-1, 0] = 0.5 * (out[-1, 1] + out[-2, 0])
    out[-1, -1] = 0.5 * (out[-1, -2] + out[-2, -1])
    return out


def test_prolong_matches_scalar_reference():
    rng = np.random.default_rng(0)
    ec = rng.standard_normal((10, 10)).astype(np.float32)
    # well-defined ghosts (copy BC), as the caller guarantees
    from fluidsimulationcuda_tpu.ops.boundary import embed_interior

    ec = np.asarray(embed_interior(0, jnp.asarray(ec[1:-1, 1:-1])))
    got = np.asarray(_prolong(jnp.asarray(ec)))
    want = _prolong_reference(ec)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n", [126, 130])  # 130: odd 65 at level 2 -> pad
def test_fast_cycle_beats_jacobi20_residual(n):
    """The perf-mode bar (VERDICT round 2): post-solve residual of the fast
    mg cycle must be <= the 20-sweep Jacobi solve's on the same rhs.  Use a
    rough rhs (not near the f32 noise floor)."""
    from fluidsimulationcuda_tpu.ops.boundary import embed_interior
    from fluidsimulationcuda_tpu.ops.diffuse import diffuse

    rng = np.random.default_rng(3)
    div = embed_interior(
        0, jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    )
    p20 = diffuse(0, jnp.zeros_like(div), div, 1.0, 4.0, 20)
    r20 = float(jnp.abs(residual(p20, div)[1:-1, 1:-1]).max())
    pmg = mg_pressure_solve_fast(div, cycles=2, pallas_smoother=False)
    rmg = float(jnp.abs(residual(pmg, div)[1:-1, 1:-1]).max())
    assert rmg <= r20, (rmg, r20)


def test_fast_residual_tracks_plain():
    """Fast and plain cycles share components but differ in coarsest-level
    schedule (plain adds pre-smooths at level 0) — exact equality is not
    expected; contraction quality must be comparable."""
    from fluidsimulationcuda_tpu.ops.boundary import embed_interior

    n = 128  # 128 -> 64 -> 32 -> 16, all even
    rng = np.random.default_rng(5)
    div = embed_interior(
        0, jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    )
    a = mg_pressure_solve(div, cycles=1)
    b = mg_pressure_solve_fast(div, cycles=1, pallas_smoother=False)
    ra = float(jnp.abs(residual(a, div)[1:-1, 1:-1]).max())
    rb = float(jnp.abs(residual(b, div)[1:-1, 1:-1]).max())
    assert rb <= 2.0 * ra, (rb, ra)


def test_pallas_smoother_matches_jnp_smoother():
    prev = pallas_ops.INTERPRET
    pallas_ops.INTERPRET = True
    try:
        from fluidsimulationcuda_tpu.ops.boundary import embed_interior

        n = 126
        rng = np.random.default_rng(7)
        div = embed_interior(
            0, jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        )
        a = mg_pressure_solve_fast(div, cycles=1, pallas_smoother=False)
        b = mg_pressure_solve_fast(div, cycles=1, pallas_smoother=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)
    finally:
        pallas_ops.INTERPRET = prev


def test_step_mg_path_engages_pallas_smoother(monkeypatch):
    """Regression for the round-3 review finding: ``_make_project`` keyed
    its pallas_smoother sentinel on ``ops.advect_project`` — which is None
    on EVERY opset (a deliberately-unwired capability) — so ``step()`` with
    backend='pallas', pressure_solver='multigrid' silently smoothed through
    the ~10x-slower jnp ``_smooth``.  Pin the discriminator: a pallas opset
    must reach ``_smooth_pallas``."""
    prev = pallas_ops.INTERPRET
    pallas_ops.INTERPRET = True
    try:
        from fluidsimulationcuda_tpu.core.config import SimConfig
        from fluidsimulationcuda_tpu.core.state import reference_init
        from fluidsimulationcuda_tpu.models.stable_fluids_2d import step
        from fluidsimulationcuda_tpu.ops import multigrid

        calls = []
        real = multigrid._smooth_pallas

        def spy(p, div, sweeps, **kw):
            calls.append(sweeps)
            return real(p, div, sweeps, **kw)

        monkeypatch.setattr(multigrid, "_smooth_pallas", spy)
        cfg = SimConfig(n=126, backend="pallas", pressure_solver="multigrid",
                        mg_cycles=1)
        state, sources = reference_init(jax.random.key(3), cfg)
        step(cfg, state, sources)  # trace is enough: the spy records calls
        assert calls, "pallas opset never reached the Pallas mg smoother"
    finally:
        pallas_ops.INTERPRET = prev
