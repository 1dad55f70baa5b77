"""Pallas kernels inside shard_map (interpret mode, virtual CPU mesh).

The sharded-pallas step must match (a) the sharded-jnp step with windowed
advection and (b) the single-device jnp windowed step — the chip-level
differential suite for ``kernels/pallas_sharded.py``.
"""
import functools

import numpy as np
import pytest

import jax

from fluidsimulationcuda_tpu import SimConfig, reference_init
from fluidsimulationcuda_tpu.kernels import pallas_ops
from fluidsimulationcuda_tpu.models.stable_fluids_2d import step
from fluidsimulationcuda_tpu.parallel.mesh import make_mesh
from fluidsimulationcuda_tpu.parallel.sharded import (
    make_sharded_step_fn,
    shard_state,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    prev = pallas_ops.INTERPRET
    pallas_ops.INTERPRET = True
    yield
    pallas_ops.INTERPRET = prev


def _run_pair(cfg, mesh_shape, steps=1):
    mesh = make_mesh(jax.devices()[: mesh_shape[0] * mesh_shape[1]],
                     shape=mesh_shape)
    state, sources = reference_init(jax.random.key(0), cfg)
    sst, ssrc = shard_state(state, mesh), shard_state(sources, mesh)
    fp = make_sharded_step_fn(cfg, mesh, advect_mode="windowed",
                              shard_backend="pallas")
    fj = make_sharded_step_fn(
        cfg.replace(backend="reference"), mesh, advect_mode="windowed",
        shard_backend="reference",
    )
    zp, zj = sst, sst
    src = ssrc
    zero = jax.tree.map(lambda a: None if a is None else a * 0, ssrc)
    for k in range(steps):
        zp = fp(zp, src)
        zj = fj(zj, src)
        src = zero
    return zp, zj


@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 1), (2, 1), (1, 1)])
def test_sharded_pallas_matches_sharded_jnp(mesh_shape):
    cfg = SimConfig(n=62, jacobi_iters=6, backend="pallas", max_courant=2)
    out_p, out_j = _run_pair(cfg, mesh_shape)
    for name in ("dens", "u", "v"):
        a = np.asarray(getattr(out_p, name))
        b = np.asarray(getattr(out_j, name))
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_sharded_pallas_multi_chunk_jacobi():
    """iters > fuse_sweeps forces multiple halo-exchange chunks."""
    cfg = SimConfig(n=62, jacobi_iters=9, fuse_sweeps=4, backend="pallas",
                    max_courant=2)
    out_p, out_j = _run_pair(cfg, (4, 1))
    for name in ("dens", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_p, name)),
            np.asarray(getattr(out_j, name)),
            rtol=0, atol=1e-6, err_msg=name,
        )


@pytest.mark.slow
def test_sharded_pallas_multi_step_vs_single_device():
    """3 steps sharded-pallas == 3 steps single-device jnp windowed."""
    cfg = SimConfig(n=30, jacobi_iters=4, backend="pallas", max_courant=2)
    out_p, _ = _run_pair(cfg, (4, 1), steps=3)
    cfg_ref = cfg.replace(backend="reference", advect_mode="windowed")
    state, sources = reference_init(jax.random.key(0), cfg_ref)
    sstep = functools.partial(step, cfg_ref)
    zero = jax.tree.map(lambda a: None if a is None else a * 0, sources)
    s = sstep(state, sources)
    s = sstep(s, zero)
    s = sstep(s, zero)
    for name in ("dens", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_p, name)),
            np.asarray(getattr(s, name)),
            rtol=0, atol=2e-5, err_msg=name,
        )


@pytest.mark.slow
def test_sharded_pallas_fast_math_runs():
    cfg = SimConfig(n=30, jacobi_iters=4, backend="pallas", max_courant=2,
                    fast_math=True)
    out_p, _ = _run_pair(cfg, (2, 1))
    assert np.isfinite(np.asarray(out_p.dens)).all()


@pytest.mark.slow
def test_sharded_pallas_2d_mesh_flattens():
    """A (2, 2) device mesh takes the slab path by row-flattening: same
    devices re-meshed (4, 1), bit-identical to the explicit row mesh and
    matching the sharded-jnp step on the original 2-D mesh."""
    cfg = SimConfig(n=62, jacobi_iters=4, backend="pallas", max_courant=2)
    state, sources = reference_init(jax.random.key(0), cfg)

    mesh2d = make_mesh(jax.devices()[:4], shape=(2, 2))
    f2d = make_sharded_step_fn(cfg, mesh2d, advect_mode="windowed",
                               shard_backend="pallas")
    assert f2d.shard_backend == "pallas"
    assert (f2d.mesh.shape["x"], f2d.mesh.shape["y"]) == (4, 1)
    out2d = f2d(shard_state(state, mesh2d), shard_state(sources, mesh2d))

    mesh_row = make_mesh(jax.devices()[:4], shape=(4, 1))
    frow = make_sharded_step_fn(cfg, mesh_row, advect_mode="windowed",
                                shard_backend="pallas")
    want = frow(shard_state(state, mesh_row),
                shard_state(sources, mesh_row))
    for name in ("dens", "u", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out2d, name)),
            np.asarray(getattr(want, name)), err_msg=name)

    fj = make_sharded_step_fn(cfg.replace(backend="reference"), mesh2d,
                              advect_mode="windowed",
                              shard_backend="reference")
    ref = fj(shard_state(state, mesh2d), shard_state(sources, mesh2d))
    for name in ("dens", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(out2d, name)),
            np.asarray(getattr(ref, name)),
            rtol=1e-5, atol=1e-5, err_msg=name)


def test_sharded_pallas_rejects_unflattenable_mesh():
    # side 36 over 8 devices: 36 % 8 != 0 — flattening cannot apply.
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
    cfg = SimConfig(n=34, jacobi_iters=4, backend="pallas")
    with pytest.raises(ValueError, match="row slabs"):
        make_sharded_step_fn(cfg, mesh, advect_mode="windowed",
                             shard_backend="pallas")


def test_sharded_pallas_rejects_exact_advect():
    mesh = make_mesh(jax.devices()[:2], shape=(2, 1))
    cfg = SimConfig(n=30, jacobi_iters=4, backend="pallas")
    with pytest.raises(ValueError, match="windowed"):
        make_sharded_step_fn(cfg, mesh, advect_mode="exact",
                             shard_backend="pallas")


@pytest.mark.slow
def test_sharded_auto_uses_jnp_for_reference_backend():
    """shard_backend='auto' with cfg.backend='reference' stays on jnp and
    still runs (no pallas requirement leakage)."""
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    cfg = SimConfig(n=30, jacobi_iters=4, backend="reference")
    state, sources = reference_init(jax.random.key(1), cfg)
    sst, ssrc = shard_state(state, mesh), shard_state(sources, mesh)
    out = make_sharded_step_fn(cfg, mesh, advect_mode="windowed",
                               shard_backend="auto")(sst, ssrc)
    assert np.isfinite(np.asarray(out.dens)).all()
