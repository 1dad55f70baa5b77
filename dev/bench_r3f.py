"""Round-3f: measure the strip-local row-range gather skipping
(pl.when-gated row shifts) on hardware.

Targets: advect pair at 2048^2 cmax 1/2/4 (vs r3c's dense numbers:
0.29 / ~0.9 / ~2.8 ms), fused dens at cmax=4, and the batched datagen
config 4 at cmax=4 (dense round-2 baseline: 245 Mcell/s).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu import SimConfig, reference_init  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_ops as po  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0])


def slope(name, op, init, k1=5, k2=33, reps=3):
    try:
        def make(k):
            @jax.jit
            def f():
                def body(c, _):
                    return op(*c), None
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
        print(f"{name:56s} FAILED {str(e)[:160]}", flush=True)
        return None


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices={jax.devices()}", flush=True)
    n = 2046
    side = n + 2

    if which in ("all", "adv"):
        state, _ = reference_init(jax.random.key(0),
                                  SimConfig(n=n, backend="pallas"))
        u, v = state.u, state.v  # small decaying velocities (headline-like)
        # and a strong-flow variant: multi-cell displacement, smooth
        us = 3.5 * u / jnp.abs(u).max()
        vs = 3.5 * v / jnp.abs(v).max()
        for cm in (1, 2, 4):
            slope(f"2048 advect pair cmax={cm} (weak flow)",
                  lambda uu, vv, c=cm: po.advect_shift_fused(
                      (1, 2), (uu, vv), uu, vv, 0.016, n, cmax=c,
                      self_advect=True), (u, v))
        for cm in (4,):
            slope(f"2048 advect pair cmax={cm} (strong flow ~3.5 cells)",
                  lambda uu, vv, c=cm: po.advect_shift_fused(
                      (1, 2), (uu, vv), uu, vv, 0.11, n, cmax=c,
                      self_advect=True), (us, vs))
        d0 = state.dens
        for cm in (1, 4):
            slope(f"2048 fused dens cmax={cm}",
                  lambda dd, uu, c=cm: (po.fused_dens_advect(
                      0, dd, dd, uu, v, 0.3, 2.2, 20, 0.016, n, cmax=c),
                      uu), (d0, u))

    if which in ("all", "datagen"):
        from fluidsimulationcuda_tpu.models.batched import (
            generate_trajectories,
        )

        for cm in (1, 4):
            cfg = SimConfig(n=254, backend="pallas", max_courant=cm)
            t0 = time.perf_counter()
            out = generate_trajectories(
                jax.random.key(7), cfg, 1024, 20,
                snapshot_every=20, auto_cmax=False,
            )
            sync(jax.tree.leaves(out)[0])
            t1 = time.perf_counter()
            cells = 1024 * 256 * 256 * 20
            # second run: compile-warm
            t0 = time.perf_counter()
            out = generate_trajectories(
                jax.random.key(8), cfg, 1024, 20,
                snapshot_every=20, auto_cmax=False,
            )
            sync(jax.tree.leaves(out)[0])
            t1 = time.perf_counter()
            print(f"datagen 1024x256^2x20 cmax={cm}: {t1 - t0:.3f} s = "
                  f"{cells / (t1 - t0) / 1e6:.0f} Mcell/s", flush=True)


if __name__ == "__main__":
    main()
