"""Round-4a: re-probe the compensated operating point at 8192²/40it.

The 2-D cross-call Chebyshev carry (round 4, ``pallas_ops.fused_jacobi``)
makes the compensated perf mode *traceable* at the reference's own
headline config (8192², 40 Jacobi iters — ``project/report.txt:45-46``):
a solve past the per-call clamp (7 sweeps at 8192²) chains kernel calls
carrying x_{k-1} across the junction.  Traceable is not validated: the
operating points are size-coupled (the 3-D work proved (rho, k_d, k_p)
transfer across neither size nor dimensionality), so this sweep re-runs
the round-3q frontier AT 8192²/40it against the jacobi-40 parity bars:

  (a) post-projection max|div| <= the parity jacobi-40 step's;
  (b) per-solve velocity-diffusion residual ratio <= 1 vs jacobi-40.

The winner must then pass the density bar too (bench.py runs all three
live).  Budget note: parity = 5 solves x 40 sweeps = 200 sweeps/step;
a (k_d, k_p) point costs 3*k_d + 2*k_p sweeps + ~5 junction round-trips.

Run: python dev/bench_r4a_frontier8k.py [n] [steps] [quick]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import (  # noqa: E402
    audit_divergence, inject_exact,
)
from fluidsimulationcuda_tpu.utils.validate import (  # noqa: E402
    audit_diffusion_residual_twin,
)
from fluidsimulationcuda_tpu import SimConfig  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8190
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    if len(sys.argv) > 3 and sys.argv[3] == "quick":
        points = [(0.9, 10, 14)]
    elif len(sys.argv) > 3:
        # explicit "rho,k_d,k_p;rho,k_d,k_p;..." triples
        points = [tuple(float(v) for v in p.split(","))
                  for p in sys.argv[3].split(";")]
        points = [(rho, int(kd), int(kp)) for rho, kd, kp in points]
    else:
        points = [(rho, kd, kp) for rho in (0.85, 0.9, 0.95)
                  for kd in (10, 12) for kp in (12, 14, 16)]
    cfg = SimConfig(n=n, jacobi_iters=40, backend="pallas", max_courant=1)
    state, _ = inject_exact(cfg)
    bar = audit_divergence(cfg, state, steps)
    print(f"parity jacobi-40 divergence bar @ {n + 2}^2: {bar:.3e}",
          flush=True)
    print(f"{'rho':>5} {'k_d':>4} {'k_p':>4} {'sweeps':>6} {'max|div|':>10} "
          f"{'div_ok':>6} {'resid':>6} {'resid_ok':>8}")
    for rho, k_d, k_p in points:
        total = 3 * k_d + 2 * k_p
        c = dataclasses.replace(
            cfg, diffusion_solver="chebyshev",
            pressure_solver="chebyshev", cheby_rho=rho,
            cheby_iters=k_d, cheby_press_iters=k_p,
            fast_math=True)
        d = audit_divergence(c, state, steps)
        # FORCED twin (round-4 lesson: the decay velocities are extinct
        # at this alpha — a decay-residual ratio compares ~1e-34
        # denormals and both over- and under-reports; the first probes
        # of this script did exactly that)
        r, _ = audit_diffusion_residual_twin(c, state, min(8, steps))
        mark = " <-- PASS" if (d <= bar and r <= 1.0) else ""
        print(f"{rho:>5} {k_d:>4} {k_p:>4} {total:>6} {d:>10.3e} "
              f"{str(d <= bar):>6} {r:>6.3f} {str(r <= 1.0):>8}"
              f"{mark}", flush=True)


if __name__ == "__main__":
    main()
