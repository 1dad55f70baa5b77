"""Round-3r: ship-readiness check for the compensated diffusion swap.

r3q found two decay-trajectory PASS points for diffusion=chebyshev with
pressure compensation (rho=0.9, k_d=10, k_p in {14, 16}).  The frontier
lesson (r3n) is that knife-edge points flip across trajectories, so a
candidate ships only if it passes BOTH bars on the continuous-forcing
twin too, with margin, and actually times faster than the current
default perf mode (chebyshev-10 pressure + chebyshev-10 dens,
1917 Mcell/s).  This measures, per candidate:

  decay:   (a) max|div| vs jacobi-20 bar, (b) velocity residual ratio
  forcing: (a'), (b') same bars on the forcing-x0.05 trajectory
  dens:    (c) density residual ratio on the forcing twin (the swap puts
           density on cheby-k_d at the candidate rho as well)
  speed:   slope-timed ms/step at 2048^2 vs the chebyshev+dens default

Run: python dev/bench_r3r_ship.py [n] [steps]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from bench import (  # noqa: E402
    audit_diffusion_residual, audit_divergence, audit_dens_residual,
    bench_step, inject_exact,
)
from fluidsimulationcuda_tpu import SimConfig  # noqa: E402
from fluidsimulationcuda_tpu.core.state import reference_init  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2046
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = SimConfig(n=n, jacobi_iters=20, backend="pallas", max_courant=1)
    state, _ = inject_exact(cfg)
    # forcing twin: sustained displacement — needs the wider window
    fcfg = dataclasses.replace(cfg, max_courant=2)
    _, sources = reference_init(jax.random.key(0), fcfg)
    drive = jax.tree.map(lambda s: 0.05 * s, sources)
    fstate, _ = inject_exact(fcfg)

    bar_d = audit_divergence(cfg, state, steps)
    bar_f = audit_divergence(fcfg, fstate, steps, drive=drive)
    print(f"decay div bar {bar_d:.3e}; forcing div bar {bar_f:.3e}")

    # current default perf mode timing for comparison
    base = dataclasses.replace(cfg, pressure_solver="chebyshev",
                               diffusion_solver="chebyshev-dens",
                               fast_math=True)
    t0 = bench_step(base, steps=steps)
    print(f"default perf mode (cheby-8 press + cheby-10 dens): "
          f"{t0 * 1e3:.3f} ms/step = {cfg.num_cells / t0 / 1e6:.0f} Mcell/s")

    for k_p in (14, 16):
        c = dataclasses.replace(
            cfg, diffusion_solver="chebyshev", pressure_solver="chebyshev",
            cheby_rho=0.9, cheby_iters=10, cheby_press_iters=k_p,
            fast_math=True)
        fc = dataclasses.replace(c, max_courant=2)
        dd = audit_divergence(c, state, steps)
        rd, _ = audit_diffusion_residual(c, state, min(8, steps))
        df = audit_divergence(fc, fstate, steps, drive=drive)
        rf, _ = audit_diffusion_residual(fc, fstate, min(8, steps))
        # density bar: audit_dens_residual compares cheby_dens_iters to
        # jacobi-20; in "chebyshev" mode density runs cheby_iters, so pin
        # cheby_dens_iters = cheby_iters for the check.
        rden, _ = audit_dens_residual(
            dataclasses.replace(c, cheby_dens_iters=c.cheby_iters),
            fstate, min(8, steps))
        t = bench_step(c, steps=steps)
        print(f"k_p={k_p} (58+{2*(k_p-14)} sweeps): "
              f"decay div {dd:.3e} ({dd / bar_d:.2f}x bar) resid {rd:.3f} | "
              f"forcing div {df:.3e} ({df / bar_f:.2f}x bar) "
              f"resid {rf:.3f} dens {rden:.3f} | "
              f"{t * 1e3:.3f} ms/step = "
              f"{cfg.num_cells / t / 1e6:.0f} Mcell/s", flush=True)


if __name__ == "__main__":
    main()
