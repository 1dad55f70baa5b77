"""Round-3u: BASELINE config 4 (batched datagen, 1024 x 256^2) in the
validated perf mode.

The compensated solver swap (cheby-10 diffusion @ rho=0.9 + cheby-14
pressure, `bench.py --perf-solver compensated`) was tuned and validated at
2048^2; the 3-D work showed the bars are SIZE-coupled (k_p especially), so
this script re-validates the bars at the datagen grid size (n=254) before
timing the batched lane:

  1. divergence bar on the BATCHED trajectory: max over batch x steps of
     post-projection |div| for the perf config vs the jacobi-20 parity
     config (the primary pressure-quality bar);
  2. single-sim velocity-diffusion residual + forcing-twin density residual
     at n=254 via bench.py's audit helpers (per-sim numerics — the batch
     dimension does not change them: the batched path runs the same
     batch-polymorphic kernels).

Then slope-times the batched step (batch=1024, zero drive after step 1,
sources folded in step 1 exactly like `generate_trajectories`) for parity
vs perf.  Round-3 parity datagen reference: 749 Mcell/s audited / 798 bare
(docs/PERFORMANCE.md BASELINE config 4).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


from fluidsimulationcuda_tpu import SimConfig  # noqa: E402
from fluidsimulationcuda_tpu.models.batched import (  # noqa: E402
    batched_init, make_batched_step_fn, select_cmax_batched,
)
from fluidsimulationcuda_tpu.ops.project import divergence  # noqa: E402

import bench  # noqa: E402

N = 254
BATCH = 1024
VAL_STEPS = 8


def sync(tree):
    _ = float(jax.tree.leaves(tree)[0].ravel()[0])


def batched_div_max(cfg: SimConfig, state, src, steps: int) -> float:
    """Max over batch x steps of post-projection |divergence|."""
    step_fn = make_batched_step_fn(cfg)
    div = jax.jit(jax.vmap(lambda s: jnp.max(jnp.abs(
        divergence(s.u, s.v, cfg.n)))))
    zeros = jax.tree.map(jnp.zeros_like, src)
    worst = 0.0
    for k in range(steps):
        state = step_fn(state, src if k == 0 else zeros)
        worst = max(worst, float(jnp.max(div(state))))
    return worst


def slope_time(cfg: SimConfig, state, src, k1=4, k2=20, reps=3) -> float:
    step_fn = make_batched_step_fn(cfg)
    zeros = jax.tree.map(jnp.zeros_like, src)

    def run(k):
        s = step_fn(state, src)
        for _ in range(k - 1):
            s = step_fn(s, zeros)
        sync(s)

    def tmin(k):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(k)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tmin(k1)  # warm both call counts
    t1, t2 = tmin(k1), tmin(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    base = SimConfig(n=N, jacobi_iters=20, backend="auto", max_courant=1)
    key = jax.random.key(0)
    cmax, probed = select_cmax_batched(key, base, BATCH)
    base = base.replace(max_courant=cmax)
    print(f"auto cmax={cmax} (probed {probed:.3f} cells)", flush=True)

    state, src = batched_init(key, base, BATCH)
    cells = BATCH * (N + 2) ** 2

    candidates = [
        dict(cheby_rho=0.9, cheby_iters=10, cheby_press_iters=14),
        dict(cheby_rho=0.9, cheby_iters=10, cheby_press_iters=16),
        dict(cheby_rho=0.85, cheby_iters=10, cheby_press_iters=14),
    ]

    div_jac = batched_div_max(base, state, src, VAL_STEPS)
    print(f"jacobi-20 batched max|div| over {VAL_STEPS} steps: "
          f"{div_jac:.3e}", flush=True)

    # Single-sim residual bars at this grid size (bench.py helpers).
    sstate, _ = bench.inject_exact(base)

    chosen = None
    for cand in candidates:
        perf = base.replace(pressure_solver="chebyshev",
                            diffusion_solver="chebyshev",
                            fast_math=True, **cand)
        div_p = batched_div_max(perf, state, src, VAL_STEPS)
        v_ratio, _ = bench.audit_diffusion_residual(perf, sstate,
                                                    VAL_STEPS)
        d_ratio, _ = bench.audit_dens_residual(perf, sstate, VAL_STEPS)
        ok = div_p <= div_jac and v_ratio <= 1.0 and d_ratio <= 1.0
        print(f"{cand}: div {div_p:.3e} ({div_p/div_jac:.2f}x bar) "
              f"v_res {v_ratio:.3f} d_res {d_ratio:.3f} -> "
              f"{'PASS' if ok else 'fail'}", flush=True)
        if ok and chosen is None:
            chosen = perf

    t_par = slope_time(base, state, src)
    print(f"parity datagen: {t_par*1e3:.1f} ms/step = "
          f"{cells/t_par/1e6:.0f} Mcell/s", flush=True)
    if chosen is None:
        print("no candidate passed all three bars at n=254", flush=True)
        return
    t_perf = slope_time(chosen, state, src)
    print(f"perf datagen ({chosen.cheby_rho}, k_d={chosen.cheby_iters}, "
          f"k_p={chosen.press_cheby_iters}): {t_perf*1e3:.1f} ms/step = "
          f"{cells/t_perf/1e6:.0f} Mcell/s ({t_par/t_perf:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
