"""On-TPU validation of the sharded-pallas path (compiled Mosaic).

1×1-mesh shard_map pallas step vs the unsharded pallas step at the headline
config: parity (windowed semantics on both sides) and throughput ratio.
Run on the real chip: ``python dev/validate_sharded_tpu.py [n] [iters]``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from fluidsimulationcuda_tpu import SimConfig, reference_init
from fluidsimulationcuda_tpu.models.stable_fluids_2d import make_step_fn
from fluidsimulationcuda_tpu.parallel.mesh import make_mesh
from fluidsimulationcuda_tpu.parallel.sharded import (
    make_sharded_step_fn,
    shard_state,
)
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
from fluidsimulationcuda_tpu.utils.timing import wallclock


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2046
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = SimConfig(n=n, jacobi_iters=iters, backend="pallas",
                    advect_mode="windowed")
    mesh = make_mesh(jax.devices()[:1], shape=(1, 1))
    state, sources = reference_init(jax.random.key(0), cfg)

    base = make_step_fn(cfg)
    out_b = base(state, sources)
    jax.block_until_ready(out_b)

    sst, ssrc = shard_state(state, mesh), shard_state(sources, mesh)
    sh = make_sharded_step_fn(cfg, mesh, advect_mode="windowed",
                              shard_backend="pallas")
    out_s = sh(sst, ssrc)
    jax.block_until_ready(out_s)

    for name in ("dens", "u", "v"):
        a = np.asarray(getattr(out_b, name))
        b = np.asarray(getattr(out_s, name))
        d = np.abs(a - b).max()
        print(f"parity {name}: max|d| = {d:.3e}  (finite={np.isfinite(b).all()})")

    # Sharded audit (round 3): the pmax-reduced displacement lets the
    # sharded path assert the exact-gather regime like the single-chip
    # bench does.
    auditor = make_sharded_step_fn(cfg, mesh, advect_mode="windowed",
                                   shard_backend="pallas", audited=True)
    _, disp = auditor(sst, ssrc)
    d = float(disp)
    print(f"sharded audited displacement: {d:.3f} cells "
          f"({'exact' if d < cfg.max_courant else 'CLAMPED'} for "
          f"cmax={cfg.max_courant})")

    t_base = wallclock(base, state, sources, reps=3, chain=8)
    t_sh = wallclock(sh, sst, ssrc, reps=3, chain=8)
    cells = (n + 2) ** 2
    print(f"unsharded pallas: {t_base*1e3:.2f} ms/step "
          f"({cells/t_base/1e6:.0f} Mcell/s)")
    print(f"1x1 shard_map pallas: {t_sh*1e3:.2f} ms/step "
          f"({cells/t_sh/1e6:.0f} Mcell/s)")
    print(f"ratio: {t_base/t_sh*100:.1f}% of unsharded throughput")

    # Default perf mode through the slab kernels (one-call cheby pressure
    # / fused projection with the three-term combine, plus the
    # chebyshev-dens one-call diffusion solve), compiled Mosaic vs the
    # unsharded step — interpret-mode CI cannot see lowering bugs in the
    # w-scheduled read-modify-write.
    cfg_c = cfg.replace(pressure_solver="chebyshev",
                        diffusion_solver="chebyshev-dens", fast_math=True)
    base_c = make_step_fn(cfg_c)
    out_bc = base_c(state, sources)
    jax.block_until_ready(out_bc)
    sh_c = make_sharded_step_fn(cfg_c, mesh, advect_mode="windowed",
                                shard_backend="pallas")
    out_sc = sh_c(sst, ssrc)
    jax.block_until_ready(out_sc)
    for name in ("dens", "u", "v"):
        a = np.asarray(getattr(out_bc, name))
        b = np.asarray(getattr(out_sc, name))
        d = np.abs(a - b).max()
        print(f"cheby parity {name}: max|d| = {d:.3e} "
              f"(finite={np.isfinite(b).all()})")
    t_shc = wallclock(sh_c, sst, ssrc, reps=3, chain=8)
    print(f"1x1 shard_map pallas chebyshev: {t_shc*1e3:.2f} ms/step "
          f"({cells/t_shc/1e6:.0f} Mcell/s)")

    # The SHIPPED default perf mode (compensated diffusion swap: all
    # solves cheby-10 @ rho=0.9, pressure 14 sweeps) through the slab
    # kernels — the sharded twin of bench.py's default second JSON line.
    cfg_k = cfg.replace(pressure_solver="chebyshev",
                        diffusion_solver="chebyshev", cheby_iters=10,
                        cheby_press_iters=14, cheby_rho=0.9,
                        fast_math=True)
    base_k = make_step_fn(cfg_k)
    out_bk = base_k(state, sources)
    jax.block_until_ready(out_bk)
    sh_k = make_sharded_step_fn(cfg_k, mesh, advect_mode="windowed",
                                shard_backend="pallas")
    out_sk = sh_k(sst, ssrc)
    jax.block_until_ready(out_sk)
    for name in ("dens", "u", "v"):
        a = np.asarray(getattr(out_bk, name))
        b = np.asarray(getattr(out_sk, name))
        d = np.abs(a - b).max()
        print(f"compensated parity {name}: max|d| = {d:.3e} "
              f"(finite={np.isfinite(b).all()})")
    t_bk = wallclock(base_k, state, sources, reps=3, chain=8)
    t_sk = wallclock(sh_k, sst, ssrc, reps=3, chain=8)
    print(f"unsharded compensated: {t_bk*1e3:.2f} ms/step "
          f"({cells/t_bk/1e6:.0f} Mcell/s)")
    print(f"1x1 shard_map pallas compensated: {t_sk*1e3:.2f} ms/step "
          f"({cells/t_sk/1e6:.0f} Mcell/s, "
          f"{t_bk/t_sk*100:.1f}% of unsharded)")


if __name__ == "__main__":
    main()
