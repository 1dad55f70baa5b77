"""Golden-state fixtures (SURVEY.md §7.2).

Frozen oracle outputs at 32²/128² — the systematic version of the
reference's small-grid print-diff methodology (SURVEY.md §4).  These guard
the oracle itself against silent regressions: if the oracle and the engine
drifted together, the live differential tests would not notice, but these
would."""
import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from fluidsimulationcuda_tpu.oracle import numpy_ref as oracle
from fluidsimulationcuda_tpu import SimConfig
from fluidsimulationcuda_tpu.core.state import FluidState, Sources
from fluidsimulationcuda_tpu.models.stable_fluids_2d import make_step_fn
from fluidsimulationcuda_tpu import zero_sources

GOLDEN = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "golden", "*.npz")))


def _run_oracle(z, steps, n, iters):
    dens = np.zeros_like(z["dens_src"])
    u = np.zeros_like(dens)
    v = np.zeros_like(dens)
    zero = np.zeros_like(dens)
    for k in range(steps):
        src = (
            (z["dens_src"], z["u_src"], z["v_src"]) if k == 0
            else (zero, zero, zero)
        )
        dens, u, v = oracle.step(
            dens, u, v, *src, dt=0.016, visc=0.0025, diff=0.1, n=n, iters=iters
        )
    return dens, u, v


@pytest.mark.parametrize("path", GOLDEN, ids=[os.path.basename(p) for p in GOLDEN])
def test_oracle_reproduces_golden_exactly(path):
    with np.load(path) as z:
        dens, u, v = _run_oracle(z, int(z["steps"]), int(z["n"]), int(z["iters"]))
        np.testing.assert_array_equal(dens, z["dens"])
        np.testing.assert_array_equal(u, z["u"])
        np.testing.assert_array_equal(v, z["v"])


@pytest.mark.parametrize("path", GOLDEN, ids=[os.path.basename(p) for p in GOLDEN])
def test_engine_matches_golden(path):
    with np.load(path) as z:
        n, steps, iters = int(z["n"]), int(z["steps"]), int(z["iters"])
        cfg = SimConfig(n=n, jacobi_iters=iters, backend="reference")
        state = FluidState(
            dens=jnp.zeros((n + 2, n + 2), jnp.float32),
            u=jnp.zeros((n + 2, n + 2), jnp.float32),
            v=jnp.zeros((n + 2, n + 2), jnp.float32),
        )
        sources = Sources(
            dens=jnp.asarray(z["dens_src"]),
            u=jnp.asarray(z["u_src"]),
            v=jnp.asarray(z["v_src"]),
        )
        step = make_step_fn(cfg)
        zeros = zero_sources(cfg)
        for k in range(steps):
            state = step(state, sources if k == 0 else zeros)
        np.testing.assert_allclose(np.asarray(state.dens), z["dens"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.u), z["u"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.v), z["v"], atol=1e-5)
