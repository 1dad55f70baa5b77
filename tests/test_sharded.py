"""Multi-chip correctness: sharded step vs single-device step.

Runs on 8 virtual CPU devices (conftest).  The sharded path must reproduce
the single-chip numerics exactly up to float reassociation noise — the same
criterion the reference applied between its CUDA variants and the sequential
solver (document/main.tex:349).
"""
import numpy as np
import pytest

import jax

from fluidsimulationcuda_tpu import (
    SimConfig,
    make_step_fn,
    reference_init,
    zero_sources,
)
from fluidsimulationcuda_tpu.parallel.mesh import make_mesh
from fluidsimulationcuda_tpu.parallel.sharded import make_sharded_step_fn, shard_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 devices (virtual CPU mesh)"
)


def _run(step_fn, state, sources, zeros, steps):
    s = state
    for k in range(steps):
        s = step_fn(s, sources if k == 0 else zeros)
    return s


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2), (8, 1), (1, 8)])
def test_sharded_matches_single_device(mesh_shape):
    cfg = SimConfig(n=30, jacobi_iters=10, backend="reference")  # side 32
    state, sources = reference_init(jax.random.key(0), cfg)
    zeros = zero_sources(cfg)

    want = _run(make_step_fn(cfg), state, sources, zeros, 3)

    mesh = make_mesh(jax.devices()[: mesh_shape[0] * mesh_shape[1]], mesh_shape)
    step = make_sharded_step_fn(cfg, mesh)
    got = _run(
        step, shard_state(state, mesh), shard_state(sources, mesh),
        shard_state(zeros, mesh), 3,
    )

    for name in ("dens", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            rtol=1e-6,
            atol=1e-6,
            err_msg=name,
        )


def test_sharded_rejects_bad_mesh():
    cfg = SimConfig(n=29, backend="reference")  # side 31: prime
    mesh = make_mesh(jax.devices()[:2], (2, 1))
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_step_fn(cfg, mesh)


def test_sharded_output_stays_sharded():
    cfg = SimConfig(n=30, jacobi_iters=4, backend="reference")
    mesh = make_mesh(jax.devices()[:4], (2, 2))
    state, sources = reference_init(jax.random.key(1), cfg)
    step = make_sharded_step_fn(cfg, mesh)
    out = step(shard_state(state, mesh), shard_state(sources, mesh))
    assert len(out.dens.sharding.device_set) == 4
