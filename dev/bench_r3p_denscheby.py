"""Round-3 probe: Chebyshev on the DENSITY diffusion solve only.

The velocity-diffusion swap is a mapped dead end (dev/bench_r3n_frontier.py:
the divergence and residual bars are adversarial — no (rho, k) clears both).
But that coupling is velocity-specific: the density solve feeds NO
divergence, so a dens-only swap leaves the velocity trajectory bit-identical
and needs to clear ONE bar — the solve-residual ratio vs the parity
Jacobi-20 density solve, with the step's real inputs (guess = the raw
source buffer, ``FluidSequential.c:182``; rhs = dens + dt*src).

Note the dens solve's conditioning differs from velocity's by 40x:
alpha = dt*DIFF*N^2 (DIFF=0.1) vs dt*VIS*N^2 (VIS=0.0025) — the frontier
map does NOT transfer; this measures it directly on the headline
trajectory.

Usage: python dev/bench_r3p_denscheby.py [--n 2046] [--steps 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import inject_exact  # noqa: E402

from fluidsimulationcuda_tpu import SimConfig, zero_sources  # noqa: E402
from fluidsimulationcuda_tpu.models.stable_fluids_2d import step  # noqa: E402
from fluidsimulationcuda_tpu.ops.chebyshev import cheby_diffuse  # noqa: E402
from fluidsimulationcuda_tpu.ops.diffuse import diffuse  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2046)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--forcing", type=float, default=0.0,
                    help="scale the reference random sources and fire them "
                         "every step (the decay trajectory's density is "
                         "~1e-34 by the steady state — its residual bar is "
                         "vacuous; forcing keeps density real)")
    ap.add_argument("--cmax", type=int, default=1)
    args = ap.parse_args()

    cfg = SimConfig(n=args.n, jacobi_iters=20, backend="auto",
                    max_courant=args.cmax)
    alpha = cfg.diffusion_alpha_diff
    beta = 1.0 + 4.0 * alpha
    print(f"dens solve: alpha={alpha:.1f} beta={beta:.1f} "
          f"(velocity alpha={cfg.diffusion_alpha_visc:.1f})", file=sys.stderr)

    state, _ = inject_exact(cfg)
    if args.forcing:
        from fluidsimulationcuda_tpu import reference_init

        _, sources = reference_init(jax.random.key(0), cfg)
        drive = jax.tree.map(lambda s: args.forcing * s, sources)
    else:
        drive = zero_sources(cfg)
    step_fn = jax.jit(functools.partial(step, cfg))

    grid = [(8, 0.99), (8, 0.995), (10, 0.99), (10, 0.995), (10, 0.999),
            (12, 0.995), (12, 0.999)]

    @jax.jit
    def resids(dens):
        # Step's real solve inputs: rhs = guess = dens + dt*src
        # (dens_step: add_source then SWAP+diffuse).
        rhs = dens + jnp.float32(cfg.dt) * drive.dens

        def resid(x):
            nb = ((x[1:-1, :-2] + x[1:-1, 2:]) + x[:-2, 1:-1]) + x[2:, 1:-1]
            r = (jnp.float32(beta) * x[1:-1, 1:-1] - rhs[1:-1, 1:-1]
                 - jnp.float32(alpha) * nb)
            return jnp.max(jnp.abs(r))

        rj = resid(diffuse(0, rhs, rhs, alpha, beta, cfg.jacobi_iters))
        rcs = [resid(cheby_diffuse(0, rhs, rhs, alpha, beta, k, rho))
               for (k, rho) in grid]
        return rj, rcs, jnp.max(jnp.abs(rhs))

    worst = {kr: 0.0 for kr in grid}
    worst_abs = {kr: (0.0, 0.0) for kr in grid}
    scale = 0.0
    for s in range(args.steps):
        rj, rcs, sc = resids(state.dens)
        rj = float(rj)
        scale = max(scale, float(sc))
        for kr, rc in zip(grid, rcs):
            rc = float(rc)
            if rj > 0 and rc / rj > worst[kr]:
                worst[kr] = rc / rj
                worst_abs[kr] = (rc, rj)
        state = step_fn(state, drive)

    print(f"\nsup|rhs| scale over the trajectory: {scale:.3e}")
    print(f"worst residual ratio (cheby / jacobi-20) over {args.steps} "
          f"steps of the trajectory:")
    for kr in grid:
        k, rho = kr
        rc, rj = worst_abs[kr]
        verdict = "PASS" if worst[kr] <= 1.0 else "fail"
        print(f"  k={k:>2} rho={rho:<6}: ratio {worst[kr]:.3f} "
              f"({rc:.3e} vs {rj:.3e})  {verdict}")


if __name__ == "__main__":
    main()
