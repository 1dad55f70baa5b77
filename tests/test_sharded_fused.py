"""Fused projection / density slab kernels inside shard_map (interpret
mode, virtual CPU mesh).

The fused kernels replace three-kernel compositions (and their separate
halo exchanges) with one kernel per phase; the differential contract is
bit-level parity with the sharded-jnp step, which itself is parity-tested
against the single-device oracle chain.
"""
import numpy as np
import pytest

import jax

from fluidsimulationcuda_tpu import SimConfig, reference_init
from fluidsimulationcuda_tpu.kernels import pallas_ops, pallas_sharded as ps
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


def test_fused_paths_engage_at_depth():
    # n=126 over 4 shards: m=32 rows >= K=16 for iters=6 — both fusions
    # must be selected on this shape (guards against silently composing).
    side, m, it, cmax = 128, 32, 6, 2
    assert ps.project_slab_supported(m, side, it)
    assert ps.dens_slab_supported(m, side, it, cmax)
    # m=8 shards cannot host the K=16 exchange: must decline.
    assert not ps.project_slab_supported(8, 64, it)
    assert not ps.dens_slab_supported(8, 64, it, cmax)


@pytest.mark.slow
def test_sharded_pallas_fused_matches_sharded_jnp():
    cfg = SimConfig(n=126, jacobi_iters=6, backend="pallas", max_courant=2)
    mesh = make_mesh(jax.devices()[:4], shape=(4, 1))
    state, sources = reference_init(jax.random.key(0), cfg)
    sst, ssrc = shard_state(state, mesh), shard_state(sources, mesh)
    fp = make_sharded_step_fn(cfg, mesh, advect_mode="windowed",
                              shard_backend="pallas")
    fj = make_sharded_step_fn(
        cfg.replace(backend="reference"), mesh, advect_mode="windowed",
        shard_backend="reference",
    )
    out_p = fp(sst, ssrc)
    out_j = fj(sst, ssrc)
    for name in ("dens", "u", "v"):
        a = np.asarray(getattr(out_p, name))
        b = np.asarray(getattr(out_j, name))
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-6, err_msg=name)


def test_split_jacobi_slab_matches_concat():
    # The split-operand kernel (capability, not wired — measured no gain
    # on hardware, see parallel/sharded.py note) must stay bit-identical
    # to the concat path.
    import jax.numpy as jnp

    m, side, K, s = 32, 128, 16, 6
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (m, side)), jnp.float32)
    rhs = jnp.asarray(rng.uniform(-1, 1, (m, side)), jnp.float32)
    xt = jnp.asarray(rng.uniform(-1, 1, (K, side)), jnp.float32)
    xb = jnp.asarray(rng.uniform(-1, 1, (K, side)), jnp.float32)
    rt = jnp.asarray(rng.uniform(-1, 1, (K, side)), jnp.float32)
    rb = jnp.asarray(rng.uniform(-1, 1, (K, side)), jnp.float32)
    flags = jnp.array([1, 1, 0], jnp.int32)
    a = ps.fused_jacobi_slab_split(
        1, x, xt, xb, rhs, rt, rb, flags, m=m, K=K, alpha=0.2, beta=1.8,
        sweeps=s,
    )
    bx = jnp.concatenate([xt, x, xb], axis=0)
    br = jnp.concatenate([rt, rhs, rb], axis=0)
    c = ps.fused_jacobi_slab(
        1, bx, br, flags, m=m, K=K, alpha=0.2, beta=1.8, sweeps=s,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_fused_project_slab_matches_composition():
    # Direct kernel differential: fused projection vs the composed
    # divergence + jacobi + gradient slab path on the same extended slabs,
    # single shard (wall flags both set) — bit-exact by construction
    # (/4 == *0.25 for f32).
    import jax.numpy as jnp

    n, it = 126, 6
    side = n + 2
    m = side
    rng = np.random.default_rng(42)
    u = jnp.asarray(rng.uniform(-1, 1, (side, side)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, (side, side)), jnp.float32)
    flags = jnp.array([1, 1, 0], jnp.int32)
    K = ps.project_slab_margin(it)
    z = jnp.zeros((K, side), jnp.float32)
    ue = jnp.concatenate([z, u, z], axis=0)
    ve = jnp.concatenate([z, v, z], axis=0)
    uf, vf = ps.fused_project_slab(ue, ve, flags, n=n, iters=it, m=m, K=K)

    z8 = jnp.zeros((8, side), jnp.float32)
    div = ps.divergence_slab(u, v, z8, z8, flags, n)
    K2 = pallas_ops._ceil8(it + 1)
    z2 = jnp.zeros((K2, side), jnp.float32)
    div_ext = jnp.concatenate([z2, div, z2], axis=0)
    p = ps.fused_jacobi_slab(0, div_ext, div_ext, flags, m=m, K=K2,
                             alpha=1.0, beta=4.0, sweeps=it, zero_init=True)
    uc, vc = ps.gradient_slab(u, v, p, z8, z8, flags, n)
    np.testing.assert_array_equal(np.asarray(uf), np.asarray(uc))
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vc))
