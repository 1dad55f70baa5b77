"""Round-3q: can extra PRESSURE sweeps buy the velocity diffusion swap?

The r3n frontier showed the two perf-mode bars are adversarial for a
velocity diffusion-solver swap at EQUAL sweep counts: Chebyshev diffusion
passes its residual bar only at rho >= ~0.85, where the extra
mid-frequency content in the diffused velocity fails the divergence bar.
But that content is precisely what the pressure projection removes — so
this sweep decouples the counts (``cheby_press_iters``, round-3 config
knob) and asks whether (k_d diffusion sweeps, k_p pressure sweeps) with
3*k_d + 2*k_p < 70 clears BOTH bars on the decay trajectory:

  (a) post-projection max|div| <= the parity jacobi-20 step's;
  (b) per-solve velocity-diffusion residual ratio <= 1 vs jacobi-20.

70 = the default perf mode's budget (2x jacobi-20 velocity diffusion +
2x cheby-10 pressure + cheby-10 density).  A passing point below ~60
would raise the 1917 Mcell/s default line; the winner must then also
pass both bars on the continuous-forcing twin before shipping
(bench.py --forcing).

Run: python dev/bench_r3q_compensated.py [n] [steps]
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
    print(f"parity jacobi-20 divergence bar: {bar:.3e}")
    print(f"{'rho':>5} {'k_d':>4} {'k_p':>4} {'sweeps':>6} {'max|div|':>10} "
          f"{'div_ok':>6} {'resid':>6} {'resid_ok':>8}")
    for rho in (0.85, 0.9, 0.95, 0.99):
        for k_d in (10, 12):
            for k_p in (10, 12, 14, 16):
                total = 3 * k_d + 2 * k_p
                c = dataclasses.replace(
                    cfg, diffusion_solver="chebyshev",
                    pressure_solver="chebyshev", cheby_rho=rho,
                    cheby_iters=k_d, cheby_press_iters=k_p,
                    fast_math=True)
                d = audit_divergence(c, state, steps)
                r, _ = audit_diffusion_residual(c, state, min(8, steps))
                mark = " <-- PASS" if (d <= bar and r <= 1.0
                                       and total < 70) else ""
                print(f"{rho:>5} {k_d:>4} {k_p:>4} {total:>6} {d:>10.3e} "
                      f"{str(d <= bar):>6} {r:>6.3f} {str(r <= 1.0):>8}"
                      f"{mark}", flush=True)


if __name__ == "__main__":
    main()
