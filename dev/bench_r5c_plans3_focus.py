"""Round-5c: focused rerun of the winning (tz, K) chain plans with more
reps — ``bench_r5a_plans3.py`` and ``_cheby_slab_ab.py`` disagreed at
mz=128 (1.70 vs 1.83/2.66 ms for the same configs), so the candidate
plans are re-measured head-to-head, interleaved (A,B,A,B... so relay
drift hits both), reps=8.

Run: python dev/bench_r5c_plans3_focus.py
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "dev"))
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.random as jrandom  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_r5a_plans3 import (  # noqa: E402
    scanned, slab_cheby_fn, slab_jacobi_fn, uns_cheby_fn, L1, L2,
)

SIDE = 256
REPS = 8


def interleaved_slopes(named_fns, x, rhs):
    """Slope-time several closures with interleaved reps so slow relay
    drift (thermal, contention) cancels across candidates."""
    built = {name: (scanned(f, L1), scanned(f, L2))
             for name, f in named_fns.items()}
    times = {name: ([], []) for name in named_fns}
    for name, (f1, f2) in built.items():  # warm both lengths
        for f in (f1, f2):
            out = f(x, rhs)
            _ = float(out.ravel()[0])
    for _ in range(REPS):
        for name, (f1, f2) in built.items():
            for i, f in enumerate((f1, f2)):
                t0 = time.perf_counter()
                out = f(x, rhs)
                _ = float(out.ravel()[0])
                times[name][i].append(time.perf_counter() - t0)
    out = {}
    for name, (t1s, t2s) in times.items():
        out[name] = (min(t2s) - min(t1s)) / (L2 - L1)
    return out


def main():
    x = jrandom.normal(jrandom.key(0), (SIDE,) * 3, jnp.float32)
    r = jrandom.normal(jrandom.key(1), (SIDE,) * 3, jnp.float32)

    for iters in (10, 12):
        cands = {f"tz16K2": uns_cheby_fn(SIDE, iters, 16, 2),
                 f"tz8K3": uns_cheby_fn(SIDE, iters, 8, 3),
                 f"tz8K4": uns_cheby_fn(SIDE, iters, 8, 4)}
        res = interleaved_slopes(cands, x, r)
        row = "  ".join(f"{k}={v * 1e3:6.2f}ms" for k, v in res.items())
        print(f"unsharded cheby-{iters} @256^3: {row}", flush=True)

    mz = 128
    xs = jrandom.normal(jrandom.key(2), (mz, SIDE, SIDE), jnp.float32)
    rs = jrandom.normal(jrandom.key(3), (mz, SIDE, SIDE), jnp.float32)
    cands = {f"K{k}": slab_cheby_fn(mz, k, 10) for k in (2, 3, 4)}
    res = interleaved_slopes(cands, xs, rs)
    row = "  ".join(f"{k}={v * 1e3:6.2f}ms" for k, v in res.items())
    print(f"slab cheby-10 mz=128: {row}", flush=True)
    cands = {f"K{k}": slab_jacobi_fn(mz, k, 20) for k in (3, 4)}
    res = interleaved_slopes(cands, xs, rs)
    row = "  ".join(f"{k}={v * 1e3:6.2f}ms" for k, v in res.items())
    print(f"slab jacobi-20 mz=128: {row}", flush=True)


if __name__ == "__main__":
    main()
