"""Scenario library + PNG rendering."""
import numpy as np
import pytest

import jax

from fluidsimulationcuda_tpu import SimConfig, make_step_fn, zero_sources
from fluidsimulationcuda_tpu.models.scenarios import SCENARIOS


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenarios_run_stable(name):
    cfg = SimConfig(n=30, jacobi_iters=6, backend="reference")
    state, sources, continuous = SCENARIOS[name](jax.random.key(0), cfg)
    step = make_step_fn(cfg)
    zeros = zero_sources(cfg)
    for k in range(10):
        src = sources if (continuous or k == 0) else zeros
        state = step(state, src)
    d = np.asarray(state.dens)
    assert np.isfinite(d).all()
    assert np.abs(np.asarray(state.u)).max() < 50
    if name != "reference":
        assert d.max() > 0  # dye actually entered the domain


def test_plume_3d_runs_stable():
    from fluidsimulationcuda_tpu.models.stable_fluids_3d import make_step_fn_3d

    cfg = SimConfig(n=14, ndim=3, jacobi_iters=4, backend="reference")
    state, sources, continuous = SCENARIOS["plume"](jax.random.key(0), cfg)
    assert continuous and state.dens.ndim == 3 and sources.w is not None
    step = make_step_fn_3d(cfg)
    for _ in range(5):
        state = step(state, sources)
    d = np.asarray(state.dens)
    assert np.isfinite(d).all() and d.max() > 0


def test_2d_only_scenarios_reject_ndim3():
    cfg = SimConfig(n=14, ndim=3, jacobi_iters=4)
    for name in ("vortex-pair", "jets"):
        with pytest.raises(ValueError, match="2-D only"):
            SCENARIOS[name](jax.random.key(0), cfg)


@pytest.mark.slow
def test_png_render(tmp_path):
    cfg = SimConfig(n=30, jacobi_iters=6, backend="reference")
    state, sources, _ = SCENARIOS["vortex-pair"](jax.random.key(1), cfg)
    state = make_step_fn(cfg)(state, sources)
    from fluidsimulationcuda_tpu.utils.viz import save_density_png, save_velocity_png

    p1 = save_density_png(str(tmp_path / "d.png"), state.dens)
    p2 = save_velocity_png(str(tmp_path / "v.png"), state.u, state.v)
    import os

    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000
