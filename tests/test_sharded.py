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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_output_stays_sharded():
    cfg = SimConfig(n=30, jacobi_iters=4, backend="reference")
    mesh = make_mesh(jax.devices()[:4], (2, 2))
    state, sources = reference_init(jax.random.key(1), cfg)
    step = make_sharded_step_fn(cfg, mesh)
    out = step(shard_state(state, mesh), shard_state(sources, mesh))
    assert len(out.dens.sharding.device_set) == 4


def test_sharded_windowed_advect_matches_jnp_windowed():
    """Sharded windowed advection (halo exchange, no all-gather) must match
    the single-device jnp spec ops.advect_windowed — including when the
    window clamp engages."""
    import functools
    from fluidsimulationcuda_tpu import ops
    from fluidsimulationcuda_tpu.parallel import sharded as sh
    from jax.sharding import PartitionSpec as P

    n, cmax = 30, 3
    key = jax.random.key(9)
    mk = lambda k, s=1.0: jax.random.uniform(
        jax.random.key(k), (n + 2, n + 2), dtype="float32", minval=-1, maxval=1) * s
    for scale in (1.0, 30.0):  # in-window and clamped
        d0, u, v = mk(1), mk(2, scale), mk(3, scale)
        want = ops.advect_windowed(1, d0, u, v, 0.016, n, cmax)

        mesh = make_mesh(jax.devices()[:4], (2, 2))
        f = jax.jit(jax.shard_map(
            functools.partial(
                sh._advect_local_windowed, 1, dtim=0.016, n=n, px=2, py=2,
                cmax=cmax,
            ),
            mesh=mesh, in_specs=(P("x", "y"),) * 3, out_specs=P("x", "y"),
        ))
        got = f(d0, u, v)
        # FMA-contraction differs between the shard_map and single-device
        # compilations (1-ulp backtrace shift -> ~4e-6 weight noise).
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


@pytest.mark.slow
def test_sharded_step_windowed_mode_runs():
    cfg = SimConfig(n=30, jacobi_iters=6, backend="reference", max_courant=3)
    mesh = make_mesh(jax.devices()[:4], (2, 2))
    state, sources = reference_init(jax.random.key(12), cfg)
    step = make_sharded_step_fn(cfg, mesh, advect_mode="windowed")
    out = step(shard_state(state, mesh), shard_state(sources, mesh))
    assert np.isfinite(np.asarray(out.dens)).all()


def test_sharded_windowed_rejects_too_small_shards():
    """Windowed advection needs >= max_courant+1 rows/cols per shard."""
    devs = jax.devices()[:4]
    mesh = make_mesh(devs)  # default row layout: 4x1
    # side=8 over a 4x1 mesh -> 2 rows per shard < max_courant+1 = 5
    cfg = SimConfig(n=6, jacobi_iters=2, backend="reference", max_courant=4)
    with pytest.raises(ValueError, match="windowed advection"):
        make_sharded_step_fn(cfg, mesh, advect_mode="windowed")
