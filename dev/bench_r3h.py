"""Round-3h: tune the perf-mode pressure solve at 2048² on hardware.

For each (cycles, pre, post) mg variant: V-cycle cost (slope) and solver
quality — max post-projection |divergence| over a 12-step trajectory vs
the parity Jacobi-20 solve (the bench.py perf-mode validation metric).
"""
import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu import (  # noqa: E402
    SimConfig, make_step_fn, reference_init, zero_sources)
from fluidsimulationcuda_tpu.ops import multigrid as mg  # noqa: E402
from fluidsimulationcuda_tpu.ops.boundary import embed_interior  # noqa: E402
from fluidsimulationcuda_tpu.ops.project import divergence  # noqa: E402
import bench  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0])


def slope(name, op, init, k1=4, k2=24, reps=3):
    def make(k):
        @jax.jit
        def f():
            def body(c, _):
                return op(c), None
            out, _ = jax.lax.scan(body, init, None, length=k)
            return out
        return f

    f1, f2 = make(k1), make(k2)

    def tmin(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f()
            sync(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tmin(f1)
    tmin(f2)
    dt = (tmin(f2) - tmin(f1)) / (k2 - k1) * 1e3
    print(f"{name:56s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    print(f"devices={jax.devices()}", flush=True)
    n = 2046
    cfg = SimConfig(n=n, jacobi_iters=20, backend="pallas", max_courant=1)
    state, _ = bench.inject_exact(cfg)

    key = jax.random.key(0)
    r = jax.random.normal(key, (n + 2, n + 2), jnp.float32)
    r = embed_interior(0, r[1:-1, 1:-1])

    variants = [(1, 2, 2), (1, 1, 1), (2, 1, 1), (2, 2, 2), (1, 2, 1)]
    for cyc, pre, post in variants:
        slope(f"mg_fast bf16-transfers cycles={cyc} pre={pre} post={post}",
              lambda d, c=cyc, a=pre, b=post:
              mg.mg_pressure_solve_fast(d, cycles=c, pre=a, post=b), r)

    # quality: max post-projection |div| over 12 steps of the bench
    # trajectory, per solver config
    def quality(c):
        fn = make_step_fn(c)
        zs = zero_sources(c)

        @jax.jit
        def dmax(s):
            return jnp.max(jnp.abs(divergence(s.u, s.v, c.n)))

        s, worst = state, 0.0
        for _ in range(12):
            s = fn(s, zs)
            worst = max(worst, float(dmax(s)))
        return worst

    print(f"{'jacobi-20 parity':44s} max|div| {quality(cfg):.3e}",
          flush=True)
    for cyc, pre, post in variants:
        c = dataclasses.replace(cfg, pressure_solver="multigrid",
                                mg_cycles=cyc, fast_math=True)
        # pre/post currently fixed at 2/2 in _make_project; only cycles
        # varies through config.  Report cycles variants only.
        if (pre, post) != (2, 2):
            continue
        print(f"{'mg cycles=' + str(cyc) + ' +fast_math':44s} "
              f"max|div| {quality(c):.3e}", flush=True)


if __name__ == "__main__":
    main()
