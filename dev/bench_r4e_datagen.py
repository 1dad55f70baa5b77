"""Round-4e: ONE datagen table (BASELINE config 4), all conditions stated.

Round 3 left config-4 numbers scattered (749 whole-run audited / 798
bare / 910 marginal slope / 1228 perf / 675 wide-window parity) and the
wide-window (cmax=4) lane parity-only.  This script measures the full
2x2 (solver x window) grid under ONE method — marginal slope, batch =
1024 x 256², 20 Jacobi iters, decay trajectory (sources step 1 only) —
and validates the perf point's three bars at this size, so the
PERFORMANCE.md table can carry every cell with its conditions.

Perf point: the 2048²-shipped compensated (rho=0.9, k_d=10, k_p=14),
re-validated at n=254 in r3u (div 0.44x, v-res 0.304 decay / forced
twin re-checked here, dens 0.913).

Run: python dev/bench_r4e_datagen.py
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
from fluidsimulationcuda_tpu.utils.validate import (  # noqa: E402
    audit_dens_residual, audit_diffusion_residual_twin, inject_exact,
)

N = 254
BATCH = 1024
VAL_STEPS = 8


def sync(tree):
    _ = float(jax.tree.leaves(tree)[0].ravel()[0])


def batched_div_max(cfg, state, src, steps):
    step_fn = make_batched_step_fn(cfg)
    div = jax.jit(jax.vmap(lambda s: jnp.max(jnp.abs(
        divergence(s.u, s.v, cfg.n)))))
    zeros = jax.tree.map(jnp.zeros_like, src)
    worst = 0.0
    for k in range(steps):
        state = step_fn(state, src if k == 0 else zeros)
        worst = max(worst, float(jnp.max(div(state))))
    return worst


def slope_time(cfg, state, src, k1=4, k2=20, reps=3):
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

    tmin(k1)
    t1, t2 = tmin(k1), tmin(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    key = jax.random.key(0)
    base = SimConfig(n=N, jacobi_iters=20, backend="auto", max_courant=1)
    cmax_auto, probed = select_cmax_batched(key, base, BATCH)
    print(f"auto cmax={cmax_auto} (probed {probed:.3f} cells)", flush=True)
    state, src = batched_init(key, base, BATCH)
    cells = BATCH * (N + 2) ** 2

    def perf_of(c):
        return c.replace(pressure_solver="chebyshev",
                         diffusion_solver="chebyshev", fast_math=True,
                         cheby_rho=0.9, cheby_iters=10,
                         cheby_press_iters=14)

    # bars once (window-independent; the forced twin widens its own)
    narrow = base.replace(max_courant=cmax_auto)
    div_j = batched_div_max(narrow, state, src, VAL_STEPS)
    div_p = batched_div_max(perf_of(narrow), state, src, VAL_STEPS)
    sstate, _ = inject_exact(narrow)
    v_res, _ = audit_diffusion_residual_twin(perf_of(narrow), sstate,
                                             VAL_STEPS)
    d_res, _ = audit_dens_residual(perf_of(narrow), sstate, VAL_STEPS)
    print(f"bars at n={N}: div {div_p:.3e} vs jacobi {div_j:.3e} "
          f"({div_p / div_j:.2f}x), forced v-res {v_res:.3f}, "
          f"dens {d_res:.3f}", flush=True)

    for cm in (cmax_auto, 4):
        for label, cfg in (("parity", base.replace(max_courant=cm)),
                           ("perf", perf_of(base.replace(max_courant=cm)))):
            t = slope_time(cfg, state, src)
            print(f"{label:>6} cmax={cm}: {t * 1e3:7.1f} ms/step = "
                  f"{cells / t / 1e6:6.0f} Mcell/s (marginal slope, "
                  f"batch {BATCH}, decay)", flush=True)


if __name__ == "__main__":
    main()
