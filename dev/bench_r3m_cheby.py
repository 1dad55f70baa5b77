"""Screen Chebyshev semi-iteration as a perf-mode pressure solver.

Question: can Chebyshev-k (k < 20) match plain Jacobi-20's post-projection
max|divergence| on a REAL mid-trajectory state at the headline grid?  The
pressure solves are 40 of the parity step's 100 sweeps, so every sweep
saved at equal validated quality is ~25 µs off the step.

Method (isolated, the right screening before any kernel work): run the
parity pallas step 12 steps from reference init, take the stored velocity,
build div, then solve with each candidate (jnp sweeps, exact spec
semantics) and measure max|div(u', v')| after the gradient subtraction.

Chebyshev over the Jacobi iteration S:  x_{k+1} = w_{k+1} S(x_k) +
(1 - w_{k+1}) x_{k-1},  w_{k+1} = 1/(1 - rho^2 w_k / 4), w_1 = 2,
x_1 = S(x_0).  P_k(1) = 1 (constants untouched — the mode-0 Neumann
nullspace behaves exactly as under Jacobi), and |P_k| <= 1 on [-1, 1] for
any rho in (0,1), so no mode is amplified; rho is a free tuning knob.

Run: python dev/bench_r3m_cheby.py [n] [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu import SimConfig, make_step_fn, zero_sources
from fluidsimulationcuda_tpu.ops.diffuse import jacobi_sweep
from fluidsimulationcuda_tpu.ops.project import (
    apply_pressure_gradient, divergence, pressure_solve,
)
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache


def cheby_pressure(div, iters, rho):
    rhs = div[1:-1, 1:-1]
    one = jnp.float32(1.0)
    xm = jnp.zeros_like(div)
    x = jacobi_sweep(0, xm, rhs, 1.0, 4.0)
    w = 2.0
    for _ in range(1, iters):
        w = 1.0 / (1.0 - 0.25 * rho * rho * w)
        xn = jnp.float32(w) * jacobi_sweep(0, x, rhs, 1.0, 4.0) \
            + (one - jnp.float32(w)) * xm
        xm, x = x, xn
    return x


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2046
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = SimConfig(n=n, jacobi_iters=20, backend="pallas", max_courant=2)

    # Continuous forcing (the bench --forcing drive): the unforced headline
    # transient decays to denormals within ~10 steps, which makes residual
    # comparisons meaningless noise — screen on sustained real velocities.
    from fluidsimulationcuda_tpu import reference_init
    state, sources = reference_init(jax.random.key(0), cfg)
    drive = jax.tree.map(lambda s: 0.05 * s, sources)
    step = make_step_fn(cfg)
    for _ in range(steps):
        state = step(state, drive)
    u, v = state.u, state.v
    float(u[0, 0])  # sync

    @functools.partial(jax.jit, static_argnames=("iters",))
    def resid_jacobi(u, v, iters):
        d = divergence(u, v, n)
        p = pressure_solve(d, iters)
        un, vn = apply_pressure_gradient(u, v, p, n)
        return jnp.max(jnp.abs(divergence(un, vn, n)))

    @functools.partial(jax.jit, static_argnames=("iters", "rho"))
    def resid_cheby(u, v, iters, rho):
        d = divergence(u, v, n)
        p = cheby_pressure(d, iters, rho)
        un, vn = apply_pressure_gradient(u, v, p, n)
        return jnp.max(jnp.abs(divergence(un, vn, n)))

    d0 = float(jnp.max(jnp.abs(divergence(u, v, n))))
    print(f"n={n} after {steps} parity steps: pre-solve max|div| = {d0:.3e}")
    base20 = float(resid_jacobi(u, v, 20))
    print(f"jacobi-20 : {base20:.3e}  (the validation bar)")
    for it in (10, 12, 14, 16, 20):
        r = float(resid_jacobi(u, v, it))
        print(f"jacobi-{it:<2d}: {r:.3e}  ({r/base20:5.2f}x bar)")
    for rho in (0.90, 0.95, 0.97, 0.99, 0.995, 0.999):
        for it in (8, 10, 12, 14, 16, 20):
            r = float(resid_cheby(u, v, it, rho))
            mark = "  <=== passes" if r <= base20 else ""
            print(f"cheby-{it:<2d} rho={rho:5.3f}: {r:.3e}  "
                  f"({r/base20:5.2f}x bar){mark}")

    # --- diffusion solves: residual ||beta*x - rhs - alpha*N(x)||_inf ---
    from fluidsimulationcuda_tpu.ops.diffuse import diffuse

    def cheby_diffuse(b, rhs, alpha, beta, iters, rho):
        rhs_int = rhs[1:-1, 1:-1]
        one = jnp.float32(1.0)
        xm = rhs  # reference semantics: guess = source-augmented field
        x = jacobi_sweep(b, xm, rhs_int, alpha, beta)
        w = 2.0
        for _ in range(1, iters):
            w = 1.0 / (1.0 - 0.25 * rho * rho * w)
            xn = jnp.float32(w) * jacobi_sweep(b, x, rhs_int, alpha, beta) \
                + (one - jnp.float32(w)) * xm
            xm, x = x, xn
        return x

    @functools.partial(jax.jit, static_argnames=("alpha", "beta"))
    def resid_of(x, rhs, alpha, beta):
        nb = ((x[1:-1, :-2] + x[1:-1, 2:]) + x[:-2, 1:-1]) + x[2:, 1:-1]
        r = jnp.float32(beta) * x[1:-1, 1:-1] - rhs[1:-1, 1:-1] \
            - jnp.float32(alpha) * nb
        return jnp.max(jnp.abs(r))

    for name, alpha, rhs in (
        ("visc(u)", cfg.diffusion_alpha_visc, u),
        ("diff(dens)", cfg.diffusion_alpha_diff, state.dens),
    ):
        beta = 1.0 + 4.0 * alpha
        bar = float(resid_of(
            jax.jit(lambda r: diffuse(1, r, r, alpha, beta, 20))(rhs),
            rhs, alpha, beta))
        print(f"--- diffusion {name}: alpha={alpha:.1f} "
              f"jacobi-20 residual {bar:.3e} (bar)")
        for rho in (0.99, 0.995, 0.999, 0.9995):
            for it in (8, 10, 12, 14):
                x = jax.jit(
                    lambda r, it=it, rho=rho: cheby_diffuse(
                        1, r, alpha, beta, it, rho))(rhs)
                rr = float(resid_of(x, rhs, alpha, beta))
                mark = "  <=== passes" if rr <= bar else ""
                print(f"cheby-{it:<2d} rho={rho:6.4f}: {rr:.3e}  "
                      f"({rr/bar:5.2f}x bar){mark}")


if __name__ == "__main__":
    main()
