"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): full-step throughput in Mcell-updates/s at 2048²
(n = 2046, padded side 2048 — same padding convention as the reference's
N = 2^13-2, ``FluidSequential.c:6``) with 20 Jacobi iterations.

vs_baseline: the reference GPU (RTX 3050 Laptop) ran 102.6 ms/step at 2^22
cells with 40 Jacobi iters (BASELINE.md scaling table).  Scaling its diffuse
cost to 20 iters (per-sweep 4.61 ms at 2^26 → 0.29 ms at 2^22; 200→100
sweeps) gives ≈ 73.8 ms/step → ≈ 56.8 Mcell-updates/s.  That derived number
is the denominator.

Usage:
  python bench.py                 # headline: 2048², 20 iters
  python bench.py --sweep         # scaling sweep (stderr table)
  python bench.py --n 1022 --iters 40 --steps 20
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax

from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu import (  # noqa: E402
    SimConfig,
    make_step_fn,
    reference_init,
    zero_sources,
)

BASELINE_MCELLS_PER_S = 56.8  # derived above


def _run(step_fn, state, zeros, steps) -> float:
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step_fn(state, zeros)
    # block_until_ready is a no-op through the remote-relay backend; force a
    # real device round-trip.
    _ = float(state.dens.ravel()[0])
    return time.perf_counter() - t0


def max_displacement_cells(cfg: SimConfig, state) -> float:
    """Largest semi-Lagrangian backtrace displacement (cells) in a state —
    the advection gather window is exact while this stays <= cmax - 1
    (clamp semantics: ``FluidSequential.c:117-127``).  Audits the headline's
    exact-regime claim instead of assuming it."""
    import jax.numpy as jnp

    dt0 = cfg.dt * cfg.n

    @jax.jit
    def _m(u, v):
        return jnp.maximum(jnp.abs(u).max(), jnp.abs(v).max()) * dt0

    return float(_m(state.u, state.v))


def bench_step(cfg: SimConfig, steps: int, warmup: int = 3) -> float:
    """Marginal seconds per step, steady state with zero sources (the
    reference's 50-step averaged loop,
    ``optPar/LOOPUNROLLED-Interleaved2.cu:680-727``).

    Measured as the slope between a short and a long run: the remote-relay
    TPU path adds a large fixed sync latency per measurement that a naive
    mean would smear into the result.
    """
    state, sources = reference_init(jax.random.key(0), cfg)
    zeros = zero_sources(cfg)
    step_fn = make_step_fn(cfg)

    state = step_fn(state, sources)  # source-injection step + compile
    disp = max_displacement_cells(cfg, state)
    for _ in range(warmup):
        state = step_fn(state, zeros)
    _ = float(state.dens.ravel()[0])
    disp = max(disp, max_displacement_cells(cfg, state))

    short = max(2, steps // 5)
    t_short = min(_run(step_fn, state, zeros, short) for _ in range(2))
    t_long = min(_run(step_fn, state, zeros, steps) for _ in range(2))
    bench_step.last_max_displacement = disp
    return max((t_long - t_short) / (steps - short), 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2046)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--cmax", type=int, default=2,
                    help="pallas advection gather window (see SimConfig)")
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    print(f"jax {jax.__version__} backend={jax.default_backend()} "
          f"devices={jax.devices()}", file=sys.stderr)

    if args.sweep:
        # Reference scaling study: 2^10 .. 2^24 cells (Slide10/Slide11).
        for side_pow in range(5, 13):
            side = 2 ** side_pow
            cfg = SimConfig(n=side - 2, jacobi_iters=args.iters,
                            backend=args.backend, max_courant=args.cmax)
            # small grids need long runs for the slope to rise above the
            # relay's fixed sync-latency noise
            steps = 400 if side <= 512 else (100 if side <= 2048 else 15)
            sec = bench_step(cfg, steps=steps)
            mcells = cfg.num_cells / sec / 1e6
            print(
                f"{side:>6}² ({cfg.num_cells:>10} cells): "
                f"{sec * 1e3:9.3f} ms/step  {mcells:10.1f} Mcell/s",
                file=sys.stderr,
            )
        return

    cfg = SimConfig(n=args.n, jacobi_iters=args.iters, backend=args.backend,
                    max_courant=args.cmax)
    sec = bench_step(cfg, steps=args.steps)
    mcells = cfg.num_cells / sec / 1e6
    disp = getattr(bench_step, "last_max_displacement", float("nan"))
    exact = disp <= args.cmax - 1
    print(f"{sec * 1e3:.3f} ms/step at {cfg.n + 2}², {args.iters} Jacobi iters; "
          f"max backtrace displacement {disp:.3f} cells "
          f"({'exact' if exact else 'CLAMPED'} regime for cmax={args.cmax})",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"full-step throughput @ {cfg.n + 2}^2, {args.iters} Jacobi iters, advect window +-{args.cmax}",
        "value": round(mcells, 1),
        "unit": "Mcell-updates/s",
        "vs_baseline": round(mcells / BASELINE_MCELLS_PER_S, 2),
        "max_displacement_cells": round(disp, 3),
        "advect_exact_regime": bool(exact),
    }))


if __name__ == "__main__":
    main()
