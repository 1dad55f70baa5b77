"""Round-3s2: pick the 3-D compensated pressure count AT 256³.

The 128³-tuned point (rho=0.85, k_d=10, k_p=8) fails the 256³ live
divergence bar by 5% (bench.py --ndim 3: 3.90e-5 vs 3.72e-5) while both
residual bars pass — the compensation dial (k_p) needs one more notch at
the bigger size.  Div falls monotonically in k_p (r3s pass 1), so probe
k_p = 10, 12 at 256³ directly and take the fewest sweeps WITH margin.

Run: python dev/bench_r3s2_3dcomp_256.py [steps]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fluidsimulationcuda_tpu import SimConfig, reference_init  # noqa: E402
from fluidsimulationcuda_tpu.models.stable_fluids_3d import (  # noqa: E402
    make_step_fn_3d,
)
from fluidsimulationcuda_tpu.ops import three_d as o3  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base = SimConfig(n=254, ndim=3, jacobi_iters=20, backend="pallas",
                     max_courant=2)
    state0, sources = reference_init(jax.random.key(0), base)
    drive = jax.tree.map(lambda s: 0.05 * s, sources)

    @jax.jit
    def div_inf(s):
        return jnp.max(jnp.abs(o3.divergence3(s.u, s.v, s.w, base.n)))

    def worst_div(cfg):
        f = make_step_fn_3d(cfg)
        s, worst = state0, 0.0
        for _ in range(steps):
            s = f(s, drive)
            worst = max(worst, float(div_inf(s)))
        return worst

    def time_step(cfg):
        cfg = dataclasses.replace(cfg, max_courant=1)
        f = make_step_fn_3d(cfg)
        state = f(state0, sources)
        zeros = jax.tree.map(jnp.zeros_like, sources)

        def run(k):
            s = state
            for _ in range(k):
                s = f(s, zeros)
            float(s.dens.ravel()[0])

        run(1)

        def t(k):
            t0 = time.perf_counter()
            run(k)
            return time.perf_counter() - t0

        t(3)
        t_lo = min(t(3) for _ in range(2))
        t_hi = min(t(10) for _ in range(2))
        return (t_hi - t_lo) / 7

    bar = worst_div(base)
    print(f"jacobi-20 divergence bar at 256^3, {steps} forced steps: "
          f"{bar:.3e}", flush=True)
    for k_p in (10, 12):
        c = dataclasses.replace(
            base, diffusion_solver="chebyshev", pressure_solver="chebyshev",
            cheby_rho=0.85, cheby_iters=10, cheby_press_iters=k_p,
            fast_math=True)
        d = worst_div(c)
        sec = time_step(c)
        print(f"k_p={k_p}: max|div| {d:.3e} ({d / bar:.2f}x bar, "
              f"{'PASS' if d <= bar else 'fail'}); "
              f"{sec * 1e3:.1f} ms/step "
              f"({c.num_cells / sec / 1e6:.0f} Mcell/s)", flush=True)


if __name__ == "__main__":
    main()
