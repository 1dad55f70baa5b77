"""Round-3s: does the COMPENSATED diffusion swap validate in 3-D?

2-D shipped `--perf-solver compensated` (all solves Chebyshev-10 at
rho=0.9, pressure raised to 14 sweeps): the diffusion swap's extra
mid-frequency divergence is exactly what pressure sweeps remove
(dev/bench_r3q_compensated.py).  The 3-D step is even more
diffusion-dominated (3 velocity solves of 3.73 ms each at 256³ vs a
1.97 ms cheby-8 pressure chain), so the same decoupling should pay
MORE there — but "should" is not a measurement, and the 2-D frontier
work proved these bars can be adversarial in non-obvious ways.

Protocol (the 2-D bars lifted to 3-D, same trajectory-twin method):
  (a) post-projection max|div3| over a FORCED trajectory <= the
      jacobi-20 parity step's on the same trajectory (forcing because
      the 3-D decay transient's velocities collapse to sub-mcell
      scales — the decay bar would compare noise);
  (b) per-solve velocity-diffusion residual ratio <= 1 vs jacobi-20
      (7-point stencil residual, zero-guess solve from the trajectory's
      own velocity fields);
  (c) density residual ratio <= 1 on the same forced trajectory.

Then times the winning point's full step at 256³ (decay trajectory,
audited cmax=1 — BASELINE config 5's own measurement conditions).

Run: python dev/bench_r3s_3dcomp.py [n] [steps]   (default 126, 12)
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
from fluidsimulationcuda_tpu.ops.chebyshev import cheby_diffuse3  # noqa: E402


def forced_trajectory(cfg, steps, forcing=0.05):
    """(states, drive): the trajectory the bars are computed over."""
    state, sources = reference_init(jax.random.key(0), cfg)
    drive = jax.tree.map(lambda s: forcing * s, sources)
    step = make_step_fn_3d(cfg)
    states = []
    for _ in range(steps):
        state = step(state, drive)
        states.append(state)
    return states, drive


def max_div(cfg, states):
    @jax.jit
    def d(s):
        return jnp.max(jnp.abs(o3.divergence3(s.u, s.v, s.w, cfg.n)))

    return max(float(d(s)) for s in states)


def resid_ratios(cfg, states, drive):
    """Worst (velocity, density) diffusion-residual ratios cheby/jacobi
    across the trajectory (zero-guess solves from the trajectory's own
    fields, the 2-D audit_diffusion_residual method in 3-D)."""
    a_v = cfg.diffusion_alpha_visc
    b_v = 1.0 + 6.0 * a_v
    a_d = cfg.diffusion_alpha_diff
    b_d = 1.0 + 6.0 * a_d

    @jax.jit
    def ratios(u, dens, ddens):
        def resid(x, rhs, alpha, beta):
            c = x[1:-1, 1:-1, 1:-1]
            nb = (x[1:-1, 1:-1, :-2] + x[1:-1, 1:-1, 2:]
                  + x[1:-1, :-2, 1:-1] + x[1:-1, 2:, 1:-1]
                  + x[:-2, 1:-1, 1:-1] + x[2:, 1:-1, 1:-1])
            r = (jnp.float32(beta) * c - rhs[1:-1, 1:-1, 1:-1]
                 - jnp.float32(alpha) * nb)
            return jnp.max(jnp.abs(r))

        zero = jnp.zeros_like(u)
        rj_v = resid(o3.diffuse3(1, zero, u, a_v, b_v, cfg.jacobi_iters),
                     u, a_v, b_v)
        rc_v = resid(cheby_diffuse3(1, zero, u, a_v, b_v, cfg.cheby_iters,
                                    cfg.cheby_rho), u, a_v, b_v)
        rhs_d = dens + jnp.float32(cfg.dt) * ddens
        rj_d = resid(o3.diffuse3(0, rhs_d, rhs_d, a_d, b_d,
                                 cfg.jacobi_iters), rhs_d, a_d, b_d)
        rc_d = resid(cheby_diffuse3(0, rhs_d, rhs_d, a_d, b_d,
                                    cfg.cheby_iters, cfg.cheby_rho),
                     rhs_d, a_d, b_d)
        return rc_v, rj_v, rc_d, rj_d

    wv = wd = 0.0
    for s in states:
        rc_v, rj_v, rc_d, rj_d = map(float, ratios(s.u, s.dens, drive.dens))
        if rj_v > 0:
            wv = max(wv, rc_v / rj_v)
        if rj_d > 0:
            wd = max(wd, rc_d / rj_d)
    return wv, wd


def time_step(cfg, reps_lo=3, reps_hi=10):
    state, sources = reference_init(jax.random.key(0), cfg)
    zeros = jax.tree.map(jnp.zeros_like, sources)
    step = make_step_fn_3d(cfg)
    state = step(state, sources)  # inject + warm compile

    def run(reps):
        s = state
        for _ in range(reps):
            s = step(s, zeros)
        float(s.dens.ravel()[0])

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 126
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    base = SimConfig(n=n, ndim=3, jacobi_iters=20, backend="pallas",
                     max_courant=2)
    states, drive = forced_trajectory(base, steps)
    bar = max_div(base, states)
    print(f"parity jacobi-20 divergence bar over {steps} forced steps "
          f"at {n + 2}^3: {bar:.3e}", flush=True)

    print(f"{'rho':>5} {'k_d':>4} {'k_p':>4} {'sweeps':>6} {'max|div|':>10} "
          f"{'div_ok':>6} {'v_res':>6} {'d_res':>6} {'ok':>4}")
    passing = []
    # Pass 1 (rho 0.85/0.9 x k_d 10 x k_p 10..16): rho=0.85 passed ALL
    # bars at every k_p — 3-D needs LESS compensation than 2-D (k_p=10
    # suffices; rho=0.9 fails v_res 2.46 where 2-D shipped it).  Pass 2
    # probes the cheap edge below that.
    for rho in (0.8, 0.85):
        for k_d in (8, 10):
            for k_p in (8, 10):
                total = 4 * k_d + 2 * k_p  # 3 vel + 1 dens + 2 pressure
                c = dataclasses.replace(
                    base, diffusion_solver="chebyshev",
                    pressure_solver="chebyshev", cheby_rho=rho,
                    cheby_iters=k_d, cheby_press_iters=k_p,
                    fast_math=True)
                sts, _ = forced_trajectory(c, steps)
                d = max_div(c, sts)
                wv, wd = resid_ratios(c, sts, drive)
                ok = d <= bar and wv <= 1.0 and wd <= 1.0
                if ok:
                    passing.append((total, rho, k_d, k_p))
                print(f"{rho:>5} {k_d:>4} {k_p:>4} {total:>6} {d:>10.3e} "
                      f"{str(d <= bar):>6} {wv:>6.3f} {wd:>6.3f} "
                      f"{'PASS' if ok else '':>4}", flush=True)

    if not passing:
        print("no passing point — the 3-D compensated frontier is empty")
        return
    total, rho, k_d, k_p = min(passing)
    print(f"\ncheapest passing point: rho={rho} k_d={k_d} k_p={k_p} "
          f"({total} sweeps vs parity's 120)")
    for label, cfg in (
        ("jacobi-20 parity", dataclasses.replace(base, max_courant=1)),
        ("compensated", dataclasses.replace(
            base, max_courant=1, diffusion_solver="chebyshev",
            pressure_solver="chebyshev", cheby_rho=rho, cheby_iters=k_d,
            cheby_press_iters=k_p, fast_math=True)),
    ):
        big = dataclasses.replace(cfg, n=254)
        sec = time_step(big)
        print(f"256^3 {label}: {sec * 1e3:.1f} ms/step "
              f"({big.num_cells / sec / 1e6:.0f} Mcell/s)", flush=True)


if __name__ == "__main__":
    main()
