"""Round-3e: dissect the mg_fast V-cycle — which component eats 6.4 ms?

Each candidate is timed as the slope of a jitted k-application scan
(per-k minima; relay-dispatch immune).  Components at the fine level
(2048) and the full sub-cycle at each level.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu import SimConfig, reference_init  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_ops as po  # noqa: E402
from fluidsimulationcuda_tpu.ops import multigrid as mg  # noqa: E402
from fluidsimulationcuda_tpu.ops.boundary import embed_interior  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0])


def slope(name, op, init, k1=4, k2=20, reps=3):
    try:
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
        tmin(f2)  # warm
        dt = (tmin(f2) - tmin(f1)) / (k2 - k1) * 1e3
        print(f"{name:56s} {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:56s} FAILED {str(e)[:140]}", flush=True)
        return None


def main():
    print(f"devices={jax.devices()}", flush=True)
    key = jax.random.key(0)

    for side in (2048, 1024, 512, 256):
        r = jax.random.normal(key, (side, side), jnp.float32)
        r = embed_interior(0, r[1:-1, 1:-1])
        if side == 2048:
            # fine-level pieces
            slope(f"{side}: smooth pallas 2 sweeps",
                  lambda p: mg._smooth_pallas(p, r, 2), r)
            slope(f"{side}: smooth pallas 2 sweeps zero_init",
                  lambda p: mg._smooth_pallas(p, r, 2, zero_init=True), r)
            slope(f"{side}: smooth jnp 2 sweeps",
                  lambda p: mg._smooth(p, r, 2), r)
            slope(f"{side}: residual", lambda p: mg.residual(p, r), r)
            slope(f"{side}: restrict+prolong roundtrip",
                  lambda p: mg._prolong(mg._restrict(p)), r)
            slope(f"{side}: pad1 roundtrip",
                  lambda p: mg._pad1(p)[:, :-1][:-1, :], r)
        # full cycle from this level down
        slope(f"{side}: mg_fast 1 cycle",
              lambda d: mg.mg_pressure_solve_fast(d, cycles=1), r)
        slope(f"{side}: mg_fast 1 cycle (jnp smoother)",
              lambda d: mg.mg_pressure_solve_fast(d, cycles=1,
                                                  pallas_smoother=False), r)


if __name__ == "__main__":
    main()
