"""Per-op slope timing of the 3-D step on hardware: where do the 83 ms at
256³ actually go?  Run: python dev/bench_3d_ops.py [n] [iters] [cmax]."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import SimConfig, reference_init
from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3
from fluidsimulationcuda_tpu.models.stable_fluids_3d import (
    make_step_fn_3d, _Ops3,
)
from fluidsimulationcuda_tpu.ops import three_d as o3
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

import time


def slope(fn, args, reps_lo=2, reps_hi=8):
    """Marginal seconds per call via two run lengths (relay-safe: the fixed
    sync latency cancels in the difference; a scalar readback syncs)."""
    def run(reps):
        out = None
        for _ in range(reps):
            out = fn(*args)
        leaves = jax.tree.leaves(out)
        # scalar readback actually syncs through the relay
        float(jnp.asarray(leaves[0]).ravel()[0])
    run(1)  # warm compile
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
    cmax = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cfg = SimConfig(n=n, ndim=3, jacobi_iters=iters, backend="pallas",
                    max_courant=cmax)
    state, src = reference_init(jax.random.key(0), cfg)
    u, v, w, dens = state.u + 0.01, state.v + 0.01, state.w + 0.01, src.dens
    cells = n ** 3

    step = make_step_fn_3d(cfg)
    s = slope(step, (state, src))
    print(f"full step:            {s*1e3:8.2f} ms  ({cells/s/1e6:.0f} Mcell/s)")

    ops = _Ops3(cfg)
    assert ops.pallas, "pallas 3-D path not selected"

    t = slope(jax.jit(lambda a, b: k3.fused_jacobi3(1, a, b, 0.1, 1.6, iters)),
              (u, v))
    print(f"fused_jacobi3 ({iters}it): {t*1e3:8.2f} ms")

    t = slope(jax.jit(lambda a, b: o3.set_bnd3(1, a) + 0 * b[0, 0, 0]), (u, v))
    print(f"set_bnd3:             {t*1e3:8.2f} ms")

    t = slope(jax.jit(lambda d, a, b, c: k3.advect3_shift(
        0, d, a, b, c, cfg.dt, n, cmax=cmax)), (dens, u, v, w))
    print(f"advect3_shift:        {t*1e3:8.2f} ms")

    t = slope(jax.jit(lambda a, b, c: k3.advect3_shift_fused(
        (1, 2, 3), (a, b, c), a, b, c, cfg.dt, n, cmax=cmax,
        self_advect=True)), (u, v, w))
    print(f"advect3 triple:       {t*1e3:8.2f} ms")

    t = slope(jax.jit(lambda a, b, c: k3.divergence3_p(a, b, c, n)),
              (u, v, w))
    print(f"divergence3_p:        {t*1e3:8.2f} ms")

    t = slope(jax.jit(lambda a, b, c, p: k3.gradient3_p(a, b, c, p, n)),
              (u, v, w, dens))
    print(f"gradient3_p:          {t*1e3:8.2f} ms")

    def proj(a, b, c):
        return ops.project(a, b, c, iters)

    t = slope(jax.jit(proj), (u, v, w))
    print(f"project (composed):   {t*1e3:8.2f} ms")

    def dif(a, b):
        return ops.diffuse(1, a, b, 0.1, 1.6, iters)

    t = slope(jax.jit(dif), (u, v))
    print(f"diffuse (k3+bnd):     {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
