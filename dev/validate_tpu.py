"""On-hardware validation suite — run on a real TPU (not in CI).

Covers what the CPU test suite cannot: compiled-Mosaic numerics vs the
NumPy oracle, and the headline performance points.  Exits nonzero on any
check failure.

  python dev/validate_tpu.py            # parity + quick perf
  python dev/validate_tpu.py --full     # adds 8192^2 and datagen points
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from fluidsimulationcuda_tpu import (  # noqa: E402
    SimConfig, make_step_fn, reference_init, zero_sources,
)
from fluidsimulationcuda_tpu.oracle import numpy_ref as oracle  # noqa: E402

FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILURES.append(name)


def parity_100_steps():
    cfg = SimConfig(n=126, jacobi_iters=20, backend="pallas", max_courant=4)
    state, sources = reference_init(jax.random.key(42), cfg)
    step = make_step_fn(cfg)
    zeros = zero_sources(cfg)
    s = state
    for k in range(100):
        s = step(s, sources if k == 0 else zeros)
    dens = np.asarray(state.dens)
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    ds, us, vs = map(np.asarray, (sources.dens, sources.u, sources.v))
    z = np.zeros_like(ds)
    for k in range(100):
        src = (ds, us, vs) if k == 0 else (z, z, z)
        dens, u, v = oracle.step(dens, u, v, *src, dt=cfg.dt, visc=cfg.visc,
                                 diff=cfg.diff, n=cfg.n, iters=cfg.jacobi_iters)
    dd = np.abs(np.asarray(s.dens) - dens).max()
    du = np.abs(np.asarray(s.u) - u).max()
    check("parity 100 steps @128^2 (pallas vs oracle)",
          dd < 1e-5 and du < 1e-5, f"dens {dd:.2e} u {du:.2e}")


def perf_point(n, iters, cmax, expect_ms, steps=100):
    cfg = SimConfig(n=n, jacobi_iters=iters, backend="pallas",
                    max_courant=cmax)
    state, sources = reference_init(jax.random.key(0), cfg)
    step = make_step_fn(cfg)
    zeros = zero_sources(cfg)
    s = step(state, sources)
    _ = float(s.dens.ravel()[0])

    def run(k):
        x = s
        t0 = time.perf_counter()
        for _ in range(k):
            x = step(x, zeros)
        _ = float(x.dens.ravel()[0])
        return time.perf_counter() - t0

    short = max(2, steps // 5)
    t1 = min(run(short) for _ in range(2))
    t2 = min(run(steps) for _ in range(2))
    ms = (t2 - t1) / (steps - short) * 1e3
    check(f"perf {n + 2}^2/{iters}it", ms < expect_ms,
          f"{ms:.2f} ms/step (budget {expect_ms})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "run on a TPU"
    parity_100_steps()
    perf_point(2046, 20, 2, expect_ms=6.0)
    if args.full:
        perf_point(8190, 40, 2, expect_ms=200.0, steps=15)
        from fluidsimulationcuda_tpu.models.batched import generate_trajectories

        cfg = SimConfig(n=254, jacobi_iters=20, max_courant=2)
        generate_trajectories(jax.random.key(0), cfg, 64, 5)  # warm compile
        t0 = time.perf_counter()
        final, _ = generate_trajectories(jax.random.key(1), cfg, 64, 20)
        _ = float(final.dens.ravel()[0])
        dt = time.perf_counter() - t0
        check("datagen 64x256^2x20", dt < 5.0, f"{dt:.2f}s")

    print(f"\n{len(FAILURES)} failure(s)")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
