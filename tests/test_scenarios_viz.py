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
