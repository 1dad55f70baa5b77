"""Round-3d: mg-cycle component profile + 8192^2 with the retuned planners.

Longer scans (k2 up to 33) and reps=4: the relay shows ±0.2 ms noise on
short slopes (r3b/r3c disagreed 2x on sub-ms ops).
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
from fluidsimulationcuda_tpu.ops import multigrid as mg  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0])


def slope(name, op, init, k1=3, k2=15, reps=4):
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

        tmin(f1); tmin(f2)
        dt = (tmin(f2) - tmin(f1)) / (k2 - k1) * 1e3
        print(f"{name:56s} {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:56s} FAILED {str(e)[:140]}", flush=True)
        return None


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices={jax.devices()}", flush=True)

    if which in ("all", "mg"):
        n = 2046
        side = n + 2
        key = jax.random.key(3)
        div = jax.random.normal(key, (side, side), jnp.float32)
        from fluidsimulationcuda_tpu.ops.boundary import embed_interior
        div = embed_interior(0, div[1:-1, 1:-1])
        p0 = jnp.zeros_like(div)

        slope("mg: pallas smooth 2 sweeps @2048",
              lambda p, d: (mg._smooth_pallas(p, d, 2), d), (p0, div))
        slope("mg: jnp smooth 2 sweeps @2048",
              lambda p, d: (mg._smooth(p, d, 2), d), (p0, div))
        slope("mg: residual @2048",
              lambda p, d: (mg.residual(p, d), d), (p0, div))
        slope("mg: restrict @2048",
              lambda p, d: (p + jnp.sum(mg._restrict(d)) * 1e-30, d),
              (p0, div))

        rc = mg._restrict(div)  # 1025-side
        slope("mg: jnp smooth 2 sweeps @1025",
              lambda p, d: (mg._smooth(p, d, 2), d),
              (jnp.zeros_like(rc), rc))
        slope("mg: prolong 1025->2048",
              lambda p, e: (p, mg._prolong(e)[: e.shape[0], : e.shape[0]]),
              (rc, rc))
        rc2 = mg._restrict(mg._pad1(rc))  # 514-side
        slope("mg: sub-cycle below 1025 (cycle at 514)",
              lambda p, d: (mg.mg_pressure_solve_fast(
                  d, cycles=1, pallas_smoother=False), d),
              (jnp.zeros_like(rc2), rc2))
        slope("mg: full fast cycle @2048 (pallas fine)",
              lambda p, d: (mg.mg_pressure_solve_fast(d, cycles=1), d),
              (p0, div))

    if which in ("all", "adv"):
        n, side = 2046, 2048
        state, _ = reference_init(jax.random.key(0),
                                  SimConfig(n=n, backend="pallas"))
        u, v = state.u, state.v
        for cap in (16, 32, 64):
            po._ADVECT_TM = cap
            po._advect_call.clear_cache()
            slope(f"2048 advect pair cmax=1 tm={cap} (careful)",
                  lambda uu, vv: po.advect_shift_fused(
                      (1, 2), (uu, vv), uu, vv, 0.016, n, cmax=1,
                      self_advect=True), (u, v), k1=5, k2=33)
        po._ADVECT_TM = 32
        po._advect_call.clear_cache()

    if which in ("all", "big"):
        n8, it8 = 8190, 40
        cfg8 = SimConfig(n=n8, jacobi_iters=it8, backend="pallas",
                         max_courant=1)
        state8, _ = reference_init(jax.random.key(5), cfg8)
        u8, v8 = state8.u, state8.v
        from fluidsimulationcuda_tpu.kernels.dispatch import get_ops
        ops8 = get_ops(cfg8)
        print("fused_project_supported(8192,40):",
              po.fused_project_supported(8192, it8),
              " (expect False -> composition)", flush=True)
        slope("8192: project via ops.project (new gate)",
              lambda uu, vv: ops8.project(uu, vv, n8, it8), (u8, v8),
              k1=2, k2=6)
        slope("8192: advect pair (new budget)",
              lambda uu, vv: po.advect_shift_fused(
                  (1, 2), (uu, vv), uu, vv, 0.016, n8, cmax=1,
                  self_advect=True), (u8, v8), k1=2, k2=6)
        slope("8192: advect single (new budget)",
              lambda uu, vv: (po.advect_shift(1, uu, uu, vv, 0.016, n8,
                                              cmax=1), vv),
              (u8, v8), k1=2, k2=6)
        zeros8 = jax.tree.map(jnp.zeros_like,
                              reference_init(jax.random.key(5), cfg8)[1])
        slope("8192 step: parity 40it (retuned)",
              lambda s, z: (step(cfg8, s, z), z), (state8, zeros8),
              k1=2, k2=6)
        cfg8b = cfg8.replace(jacobi_iters=20)
        slope("8192 step: parity 20it (retuned)",
              lambda s, z: (step(cfg8b, s, z), z), (state8, zeros8),
              k1=2, k2=6)

        # jacobi tm=256 experiment: raised budgets
        po._SWEEP_BUDGET, sb = 70 * 2**20, po._SWEEP_BUDGET
        po._SWEEP_KERNEL_CAP, sk = 96 * 2**20, po._SWEEP_KERNEL_CAP
        po._fused_jacobi_call.clear_cache()
        print("pick_tm(8192) with 70MB budget:", po._pick_tm(8192),
              flush=True)
        slope("8192: jacobi 40 sweeps, raised budget",
              lambda uu, vv: (po.fused_jacobi(1, uu, uu, 0.033, 1.13, it8),
                              vv), (u8, v8), k1=2, k2=6)
        po._SWEEP_BUDGET, po._SWEEP_KERNEL_CAP = sb, sk
        po._fused_jacobi_call.clear_cache()


if __name__ == "__main__":
    main()
