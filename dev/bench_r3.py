"""Round-3 dev harness: step-level fusion + solver timings on the real TPU.

Measures (2048^2, 20 iters unless noted):
  1. fused_advect_project vs advect_pair + fused_project (the round-3
     parity-track fusion).
  2. whole step, new composition (fusion engaged) vs old.
  3. multigrid / cg pressure solves (jnp) vs the 20-sweep fused Jacobi
     projection — sizing the performance-mode line before building a
     Pallas smoother.
  4. sweep speed-of-light probe: whole-grid fused_jacobi at 512^2 (zero
     strip-margin overhead) per-cell cost vs the strip path at 2048^2.

Timings are chained-dispatch means (reps calls, one scalar sync at the
end) — same convention as dev/bench_jacobi.py.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu import SimConfig, reference_init, step  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_ops as po  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_step as ps  # noqa: E402
from fluidsimulationcuda_tpu.ops.multigrid import mg_pressure_solve, residual  # noqa: E402
from fluidsimulationcuda_tpu.ops.cg import cg_pressure_solve  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0] if hasattr(x, "ravel") else x)


def timeit(name, fn, *args, reps=30):
    try:
        out = fn(*args)
        jax.tree.map(lambda a: sync(a), out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        leaves = jax.tree.leaves(out)
        sync(leaves[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:52s} {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:52s} FAILED {str(e)[:160]}", flush=True)
        return None


def main():
    n, iters, cmax = 2046, 20, 1
    side = n + 2
    print(f"devices={jax.devices()}", flush=True)
    key = jax.random.key(0)
    cfg = SimConfig(n=n, jacobi_iters=iters, backend="pallas",
                    max_courant=cmax)
    state, sources = reference_init(key, cfg)
    # A post-projection-like velocity pair with small displacement.
    u = state.u + 0.01 * jax.random.normal(key, (side, side), jnp.float32)
    v = state.v + 0.01 * jax.random.normal(jax.random.key(1), (side, side),
                                           jnp.float32)

    @jax.jit
    def composed(u, v):
        u2, v2 = po.advect_shift_fused((1, 2), (u, v), u, v, 0.016, n,
                                       cmax=cmax, self_advect=True)
        return po.fused_project(u2, v2, n, iters)

    @jax.jit
    def fused(u, v):
        return ps.fused_advect_project(u, v, n, iters, 0.016, cmax=cmax)

    timeit("advect_pair + fused_project (composed)", composed, u, v)
    timeit("fused_advect_project (one kernel)", fused, u, v)

    # --- whole step, new vs old tail ---
    zeros = jax.tree.map(jnp.zeros_like, sources)

    @jax.jit
    def step_new(s, z):
        return step(cfg, s, z)

    from fluidsimulationcuda_tpu.kernels.dispatch import get_ops
    ops = get_ops(cfg)

    @jax.jit
    def step_old(sta, z):
        # Round-2 composition: advect_pair + separate second projection.
        alpha = cfg.diffusion_alpha_visc
        beta = 1.0 + 4.0 * alpha
        uu = ops.diffuse_src(1, z.u, sta.u, alpha, beta, iters, cfg.dt)
        vv = ops.diffuse_src(2, z.v, sta.v, alpha, beta, iters, cfg.dt)
        uu, vv = ops.project(uu, vv, n, iters)
        uu, vv = ops.advect_pair(1, 2, uu, vv, uu, vv, cfg.dt, n)
        uu, vv = ops.project(uu, vv, n, iters)
        dens = ops.diffuse_advect(0, z.dens, sta.dens, uu, vv,
                                  cfg.diffusion_alpha_diff,
                                  1.0 + 4.0 * cfg.diffusion_alpha_diff,
                                  iters, cfg.dt, n)
        return type(sta)(dens=dens, u=uu, v=vv)

    timeit("full step, round-2 composition", step_old, state, zeros)
    timeit("full step, round-3 (advect+project fused)", step_new, state,
           zeros)

    # --- pressure solves: Jacobi-20 fused projection vs mg / cg ---
    div = po.divergence_p(u, v, n)

    @jax.jit
    def proj_jac(u, v):
        return po.fused_project(u, v, n, iters)

    @functools.partial(jax.jit, static_argnames=("cycles",))
    def mg_solve(div, cycles=2):
        return mg_pressure_solve(div, cycles=cycles)

    @jax.jit
    def cg_solve(div):
        return cg_pressure_solve(div, iters=15)

    timeit("fused_project (div+20 sweeps+grad)", proj_jac, u, v)
    timeit("mg_pressure_solve 2 cycles (jnp)", mg_solve, div)
    timeit("mg_pressure_solve 1 cycle (jnp)",
           functools.partial(mg_solve, cycles=1), div)
    timeit("cg_pressure_solve 15 it (jnp)", cg_solve, div)

    # residual quality on the SAME rhs
    p20 = po.fused_jacobi(0, div, div, 1.0, 4.0, iters, zero_init=True)
    for nm, p in (
        ("jacobi-20", p20),
        ("mg 1 cycle", mg_solve(div, cycles=1)),
        ("mg 2 cycles", mg_solve(div, cycles=2)),
        ("cg 15", cg_solve(div)),
    ):
        r = residual(p, div)
        print(f"residual max|div - A p| {nm:14s} "
              f"{float(jnp.abs(r[1:-1,1:-1]).max()):.3e}", flush=True)

    # --- sweep speed-of-light probe ---
    s512 = jax.random.uniform(jax.random.key(2), (512, 512), jnp.float32)
    f20 = jax.jit(lambda x: po.fused_jacobi(1, x, x, 0.033, 1.13, 20))
    t = timeit("fused_jacobi 20 sweeps, 512^2 whole-grid", f20, s512,
               reps=100)
    if t:
        print(f"  -> {t / 20 * 1e3 / (512 * 512) * 1e3:.3f} ns/cell/sweep",
              flush=True)
    big = jax.random.uniform(jax.random.key(3), (side, side), jnp.float32)
    fbig = jax.jit(lambda x: po.fused_jacobi(1, x, x, 0.033, 1.13, 20))
    t = timeit("fused_jacobi 20 sweeps, 2048^2 strips", fbig, big)
    if t:
        print(f"  -> {t / 20 * 1e3 / (side * side) * 1e3:.3f} ns/cell/sweep",
              flush=True)


if __name__ == "__main__":
    main()
