"""Round-3n: map the diffusion-swap validation frontier.

A perf-mode diffusion-solver swap must pass TWO bars on the parity
trajectory (bench.py):

  (a) post-projection max|divergence| <= the parity Jacobi-20 step's
      (catches mid-frequency content the divergence derivative weights);
  (b) per-solve diffusion residual <= the parity Jacobi-20 solve's
      (catches under-solving — plain truncated Jacobi-k<20 passes (a)
      trivially but fails this one).

This sweeps Chebyshev rho x iters over both bars.  Measured result
(2048^2 headline trajectory, v5e, 2026-08):

  - the bars are ADVERSARIAL: low rho / few sweeps passes (a) and fails
    (b); high rho passes (b) and fails (a);
  - the joint feasible set at half the sweeps is a knife edge — the
    single passing point (rho=0.8, k=12 coupled) clears both bars by
    <0.1%, and flips to failing when the pressure solver is swapped to
    Jacobi-20 (div 1.956e-6 vs the 1.943e-6 bar);
  - decoupling pressure/diffusion rho does not open the set: with
    press=jacobi-20, diff-cheby(0.75,12) passes (a) at resid 1.004 and
    diff-cheby(0.8,12) passes (b) at div 1.956e-6 — straddling, never
    inside.

Conclusion (docs/PERFORMANCE.md finding 15): the diffusion solves stay
Jacobi-20 in the default perf mode; only the pressure solves (validated
by (a) alone, which is their whole job) take Chebyshev.

Run: python dev/bench_r3n_frontier.py [n] [steps]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import (  # noqa: E402
    audit_diffusion_residual, audit_divergence, inject_exact,
)
from fluidsimulationcuda_tpu import SimConfig  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2046
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = SimConfig(n=n, jacobi_iters=20, backend="pallas", max_courant=1)
    state, _ = inject_exact(cfg)
    bar = audit_divergence(cfg, state, steps)
    print(f"parity jacobi-{cfg.jacobi_iters} divergence bar: {bar:.3e}")
    print(f"{'rho':>6} {'k':>3} {'max|div|':>10} {'div_ok':>6} "
          f"{'resid':>6} {'resid_ok':>8}")
    for rho in (0.5, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95):
        for k in (10, 12, 14):
            c = dataclasses.replace(
                cfg, diffusion_solver="chebyshev",
                pressure_solver="chebyshev", cheby_rho=rho, cheby_iters=k,
                fast_math=True)
            d = audit_divergence(c, state, steps)
            r, _ = audit_diffusion_residual(c, state, min(8, steps))
            print(f"{rho:>6} {k:>3} {d:>10.3e} {str(d <= bar):>6} "
                  f"{r:>6.3f} {str(r <= 1.0):>8}")


if __name__ == "__main__":
    main()
