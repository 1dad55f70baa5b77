"""On-TPU validation of the sharded-pallas 3-D path (compiled Mosaic).

1-device-mesh shard_map z-slab step vs the unsharded 3-D pallas step:
parity and throughput ratio.  Run: python dev/validate_sharded3d_tpu.py
[n] [iters] (default 254 = 256³, 20).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import SimConfig, reference_init
from fluidsimulationcuda_tpu.models.stable_fluids_3d import make_step_fn_3d
from fluidsimulationcuda_tpu.parallel.mesh import make_mesh
from fluidsimulationcuda_tpu.parallel.sharded3d import (
    make_sharded_step_fn_3d,
    shard_state_3d,
)
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache


def slope(step, state, src, reps_lo=2, reps_hi=8):
    def run(reps):
        s = state
        for _ in range(reps):
            s = step(s, src)
        float(jnp.asarray(s.dens).ravel()[0])  # scalar readback syncs
    run(1)
    def timed(reps):
        t0 = time.perf_counter()
        run(reps)
        return time.perf_counter() - t0
    timed(reps_lo)
    t_lo = min(timed(reps_lo) for _ in range(2))
    t_hi = min(timed(reps_hi) for _ in range(2))
    return (t_hi - t_lo) / (reps_hi - reps_lo)


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 254
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = SimConfig(n=n, ndim=3, jacobi_iters=iters, backend="pallas",
                    max_courant=1)
    mesh = make_mesh(jax.devices()[:1], shape=(1, 1))
    state, src = reference_init(jax.random.key(0), cfg)

    base = make_step_fn_3d(cfg)
    out_b = base(state, src)
    jax.block_until_ready(out_b)

    sh = make_sharded_step_fn_3d(cfg, mesh, advect_mode="windowed",
                                 shard_backend="pallas")
    assert sh.shard_backend == "pallas"
    sst = shard_state_3d(state, mesh)
    ssrc = shard_state_3d(src, mesh)
    out_s = sh(sst, ssrc)
    jax.block_until_ready(out_s)

    for f in ("dens", "u", "v", "w"):
        d = float(
            jnp.max(jnp.abs(getattr(out_s, f) - getattr(out_b, f)))
        )
        finite = bool(jnp.all(jnp.isfinite(getattr(out_s, f))))
        print(f"parity {f}: max|d| = {d:.3e}  (finite={finite})")

    cells = n ** 3
    t_b = slope(base, state, src)
    t_s = slope(sh, sst, ssrc)
    print(f"unsharded pallas 3-D: {t_b*1e3:.2f} ms/step "
          f"({cells/t_b/1e6:.0f} Mcell/s)")
    print(f"1-mesh shard_map pallas 3-D: {t_s*1e3:.2f} ms/step "
          f"({cells/t_s/1e6:.0f} Mcell/s)")
    print(f"ratio: {t_b/t_s*100:.1f}% of unsharded throughput")

    # Lane 2: the 3-D compensated perf mode through the slab CHAIN
    # kernels (fused_cheby3_slab segments, x_{k-1} carried across
    # exchanges) vs the unsharded chain — the compiled-Mosaic twin of
    # tests/test_sharded_3d.py::test_sharded_pallas_3d_cheby_*.
    ccfg = cfg.replace(pressure_solver="chebyshev",
                       diffusion_solver="chebyshev", cheby_rho=0.85,
                       cheby_iters=10, cheby_press_iters=12,
                       fast_math=True)
    base_c = make_step_fn_3d(ccfg)
    out_bc = base_c(state, src)
    jax.block_until_ready(out_bc)
    sh_c = make_sharded_step_fn_3d(ccfg, mesh, advect_mode="windowed",
                                   shard_backend="pallas")
    assert sh_c.shard_backend == "pallas"
    out_sc = sh_c(sst, ssrc)
    jax.block_until_ready(out_sc)
    for f in ("dens", "u", "v", "w"):
        d = float(
            jnp.max(jnp.abs(getattr(out_sc, f) - getattr(out_bc, f)))
        )
        finite = bool(jnp.all(jnp.isfinite(getattr(out_sc, f))))
        print(f"compensated parity {f}: max|d| = {d:.3e} "
              f"(finite={finite})")
    t_bc = slope(base_c, state, src)
    t_sc = slope(sh_c, sst, ssrc)
    print(f"unsharded compensated 3-D: {t_bc*1e3:.2f} ms/step "
          f"({cells/t_bc/1e6:.0f} Mcell/s)")
    print(f"1-mesh shard_map compensated 3-D: {t_sc*1e3:.2f} ms/step "
          f"({cells/t_sc/1e6:.0f} Mcell/s)")
    print(f"ratio: {t_bc/t_sc*100:.1f}% of unsharded throughput")


if __name__ == "__main__":
    main()
