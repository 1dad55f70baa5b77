"""Round-5d: the CG row for the solver-substitution routes table.

The routes table (docs/PERFORMANCE.md) claims measured verdicts on every
solver-substitution route, but ``pressure_solver="cg"`` (ops/cg.py, the
reference's other named future-work solver, document/main.tex:356) only
had correctness tests — no ms/step + bars row.  This measures it the way
the table's other rows were measured: whole-step slope at 2048²/20it on
the decay trajectory, plus the divergence bar (CG replaces only the
pressure solve, so the diffusion/density residual bars don't apply — the
diffusion solver is untouched jacobi).

Also prices the sharded twin note: ``parallel/sharded._cg_local``'s
dot-product reductions need a global psum per iteration (2 reductions ×
cg_iters collectives per solve) — stated, not timed (no real mesh).

Run: python dev/bench_r5d_cg.py [side] [reps]
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from fluidsimulationcuda_tpu import (  # noqa: E402
    SimConfig, make_step_fn, zero_sources,
)
from fluidsimulationcuda_tpu.utils.validate import (  # noqa: E402
    audit_divergence, inject_exact,
)

K1, K2 = 4, 16


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = side - 2
    cfg = SimConfig(n=n, jacobi_iters=20, backend="auto", max_courant=1)
    state, disp = inject_exact(cfg)
    print(f"injected (transient {disp:.2f} cells)", flush=True)

    def slope(c):
        step = make_step_fn(c)
        zeros = zero_sources(c)

        def run(k):
            s = state
            for _ in range(k):
                s = step(s, zeros)
            _ = float(s.dens.ravel()[0])

        def tmin(k):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run(k)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        tmin(K1)
        return (tmin(K2) - tmin(K1)) / (K2 - K1)

    base = slope(cfg)
    print(f"parity jacobi-20: {base * 1e3:7.3f} ms/step "
          f"({cfg.num_cells / base / 1e6:6.0f} Mcell/s)", flush=True)
    for it in (15, 20):
        c = dataclasses.replace(cfg, pressure_solver="cg", cg_iters=it)
        t = slope(c)
        print(f"cg-{it} pressure:  {t * 1e3:7.3f} ms/step "
              f"({cfg.num_cells / t / 1e6:6.0f} Mcell/s, "
              f"{base / t:4.2f}x parity)", flush=True)

    # divergence bar: perf solve no worse than the parity solve
    div_j = audit_divergence(cfg, state, 15)
    for it in (15, 20, 25):
        c = dataclasses.replace(cfg, pressure_solver="cg", cg_iters=it)
        div_c = audit_divergence(c, state, 15)
        print(f"divergence bar (15 steps): cg-{it} {div_c:.3e} vs jacobi "
              f"{div_j:.3e} ({div_c / div_j:.3f}x, "
              f"{'PASS' if div_c <= div_j else 'FAIL'})", flush=True)


if __name__ == "__main__":
    main()
