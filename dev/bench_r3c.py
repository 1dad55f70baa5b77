"""Round-3c: 8192^2 sag + performance-mode (multigrid/fast_math) timings.

Slope method fixed vs r3b: time(k) = min over reps of a k-application scan,
slope = (T(k2) - T(k1)) / (k2 - k1) — per-k minima, immune to single relay
hiccups that made r3b's per-rep differences go negative.
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
from fluidsimulationcuda_tpu.ops.multigrid import (  # noqa: E402
    mg_pressure_solve_fast, residual,
)


def sync(x):
    _ = float(x.ravel()[0])


def slope(name, op, init_pair, k1=3, k2=9, reps=3):
    try:
        def make(k):
            @jax.jit
            def f():
                def body(c, _):
                    return op(*c), None
                out, _ = jax.lax.scan(body, init_pair, None, length=k)
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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices={jax.devices()}", flush=True)

    if which in ("all", "perf"):
        # ---- performance-mode at 2048^2 ----
        n, iters = 2046, 20
        side = n + 2
        cfg = SimConfig(n=n, jacobi_iters=iters, backend="pallas",
                        max_courant=1)
        state, _ = reference_init(jax.random.key(0), cfg)
        u = state.u + 0.01 * jax.random.normal(jax.random.key(1),
                                               (side, side), jnp.float32)
        v = state.v + 0.01 * jax.random.normal(jax.random.key(2),
                                               (side, side), jnp.float32)
        div = po.divergence_p(u, v, n)

        slope("2048: fused_project (jacobi-20)",
              lambda uu, vv: po.fused_project(uu, vv, n, iters), (u, v))
        slope("2048: mg_fast 1 cycle (pallas smoother)",
              lambda d, x: (mg_pressure_solve_fast(d, cycles=1), x),
              (div, u))
        slope("2048: mg_fast 2 cycles (pallas smoother)",
              lambda d, x: (mg_pressure_solve_fast(d, cycles=2), x),
              (div, u))

        # residual quality on a rough rhs (not a near-solved field)
        rough = jax.random.normal(jax.random.key(3), (side, side),
                                  jnp.float32)
        from fluidsimulationcuda_tpu.ops.boundary import embed_interior
        rough = embed_interior(0, rough[1:-1, 1:-1])
        p20 = po.fused_jacobi(0, rough, rough, 1.0, 4.0, iters,
                              zero_init=True)
        r20 = float(jnp.abs(residual(p20, rough)[1:-1, 1:-1]).max())
        for cyc in (1, 2):
            pm = jax.jit(functools.partial(mg_pressure_solve_fast,
                                           cycles=cyc))(rough)
            rm = float(jnp.abs(residual(pm, rough)[1:-1, 1:-1]).max())
            print(f"rough-rhs residual: jacobi-20 {r20:.3e}  "
                  f"mg-{cyc} {rm:.3e}", flush=True)

        # full step: parity vs mg vs fast_math
        zeros = jax.tree.map(jnp.zeros_like,
                             reference_init(jax.random.key(0), cfg)[1])

        def stepper(c):
            return lambda s, z: (step(c, s, z), z)

        slope("2048 step: parity (jacobi, exact expr)",
              lambda s, z: (step(cfg, s, z), z), (state, zeros))
        slope("2048 step: fast_math",
              stepper(cfg.replace(fast_math=True)), (state, zeros))
        slope("2048 step: multigrid (2 cycles)",
              stepper(cfg.replace(pressure_solver="multigrid")),
              (state, zeros))
        slope("2048 step: multigrid 1 cycle",
              stepper(cfg.replace(pressure_solver="multigrid",
                                  mg_cycles=1)), (state, zeros))
        slope("2048 step: mg-1 + fast_math",
              stepper(cfg.replace(pressure_solver="multigrid", mg_cycles=1,
                                  fast_math=True)), (state, zeros))

    if which in ("all", "adv"):
        # ---- advect strip-height retune (r3b found tm=128 1.7x faster
        # than the round-2 tm=32 cap at cmax=1) ----
        n, side = 2046, 2048
        state, _ = reference_init(jax.random.key(0),
                                  SimConfig(n=n, backend="pallas"))
        u, v = state.u, state.v
        orig = po._ADVECT_TM
        for cmax_t in (1, 2, 4):
            for cap in (32, 64, 128, 256):
                po._ADVECT_TM = cap
                po._advect_call.clear_cache()
                slope(f"advect pair cmax={cmax_t} tm_cap={cap}",
                      lambda uu, vv, c=cmax_t: po.advect_shift_fused(
                          (1, 2), (uu, vv), uu, vv, 0.016, n, cmax=c,
                          self_advect=True), (u, v))
        po._ADVECT_TM = orig
        po._advect_call.clear_cache()

    if which in ("all", "big"):
        # ---- 8192^2 ----
        n8, it8 = 8190, 40
        side8 = n8 + 2
        cfg8 = SimConfig(n=n8, jacobi_iters=it8, backend="pallas",
                         max_courant=1)
        state8, _ = reference_init(jax.random.key(5), cfg8)
        u8, v8 = state8.u, state8.v
        slope("8192: jacobi 40 sweeps", lambda uu, vv: (
            po.fused_jacobi(1, uu, uu, 0.033, 1.13, it8), vv), (u8, v8),
            k1=2, k2=5)
        slope("8192: fused_project 40", lambda uu, vv: po.fused_project(
            uu, vv, n8, it8), (u8, v8), k1=2, k2=5)
        slope("8192: advect pair (falls back to 2 singles)",
              lambda uu, vv: po.advect_shift_fused(
                  (1, 2), (uu, vv), uu, vv, 0.016, n8, cmax=1,
                  self_advect=True), (u8, v8), k1=2, k2=5)
        slope("8192: advect single", lambda uu, vv: (
            po.advect_shift(1, uu, uu, vv, 0.016, n8, cmax=1), vv),
            (u8, v8), k1=2, k2=5)
        zeros8 = jax.tree.map(jnp.zeros_like,
                              reference_init(jax.random.key(5), cfg8)[1])
        slope("8192 step: parity 40it",
              lambda s, z: (step(cfg8, s, z), z), (state8, zeros8),
              k1=2, k2=5)


if __name__ == "__main__":
    main()
