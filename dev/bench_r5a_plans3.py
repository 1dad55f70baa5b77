"""Round-5a: chain-aware (tz, K) plan A/B for the 3-D Chebyshev chains.

The per-sweep cost model in ``_jacobi3_plan``/``jacobi3_slab_plan``
amortizes the DMA term over K but prices neither the junction (extra
pad + dispatch + both-iterates write between chained calls) nor the
VMEM-pressure cliff near the 96MB cap, so for CHAINED solves it can pick
a junction-heavy plan: at 256³ the cheby chain (nin=3/nout=2) plans
(tz=16, K=2) = 5 segments per 10-sweep solve, while
``dev/_cheby_slab_ab.py`` measured the slab chain at mz=128 running 36%
faster with K=4 (tz=8, 3 segments).

This probe measures the full (tz, K) grid for:
  1. the UNSHARDED cheby chain at 256³ (iters 10 and 12 — the 3-D
     compensated mode's diffusion/pressure solves), via
     ``_fused_jacobi3_cheby_call`` with explicit plans;
  2. the SLAB cheby chain at mz ∈ {254, 128, 64, 32} x 256² (the
     junction-tax shapes), via ``fused_cheby3_slab``;
  3. the SLAB jacobi chain at the same shapes (iters=20).

Output feeds the measured-plan override tables in ``pallas_ops_3d`` /
``pallas_sharded_3d``.

Run: python dev/bench_r5a_plans3.py [side] [reps]
"""
import sys
import time

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as o3  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_sharded_3d as p3  # noqa: E402
from fluidsimulationcuda_tpu.ops.chebyshev import cheby_omegas  # noqa: E402

RHO = 0.85
L1, L2 = 2, 8


def scanned(f, length):
    @jax.jit
    def run(x, rhs):
        def body(c, _):
            return f(c, rhs), None

        out, _ = jax.lax.scan(body, x, None, length=length)
        return out

    return run


def make_tmin(reps):
    def tmin(f, *args):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(out.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return tmin


def make_slope(reps):
    tmin = make_tmin(reps)

    def slope(f, x, rhs):
        f1, f2 = scanned(f, L1), scanned(f, L2)
        tmin(f1, x, rhs), tmin(f2, x, rhs)
        return (tmin(f2, x, rhs) - tmin(f1, x, rhs)) / (L2 - L1)

    return slope


def uns_cheby_fn(side, iters, tz, K):
    ws_all = [None] + [float(w) for w in cheby_omegas(RHO, iters)]

    def run(x, rhs):
        xm, done = None, 0
        while done < iters:
            s = min(K, iters - done)
            ws = tuple(ws_all[done:done + s])
            last = done + s >= iters
            res = o3._fused_jacobi3_cheby_call(
                0, x, xm, rhs, 1.0, 6.0, ws, tz, side, False, False,
                xm is not None, not last)
            if last:
                x = res
            else:
                x, xm = res
            done += s
        return x

    return run


def slab_cheby_fn(mz, K, iters):
    H = K + 1
    ws_all = [None] + [float(w) for w in cheby_omegas(RHO, iters)]
    flags = jnp.array([1, 1, 0], jnp.int32)

    def _ext(x):
        return jnp.pad(x, ((H, H), (0, 0), (0, 0)))

    def run(x, rhs):
        rhs_ext = _ext(rhs)
        xm, done = None, 0
        while done < iters:
            s = min(K, iters - done)
            ws = tuple(ws_all[done:done + s])
            last = done + s >= iters
            res = p3.fused_cheby3_slab(
                0, _ext(x), _ext(xm) if xm is not None else None,
                rhs_ext, flags, mz=mz, H=H, alpha=1.0, beta=6.0, ws=ws,
                carry_in=xm is not None, carry_out=not last)
            if last:
                x = res
            else:
                x, xm = res
            done += s
        return x

    return run


def slab_jacobi_fn(mz, K, iters):
    H = K + 1
    flags = jnp.array([1, 1, 0], jnp.int32)

    def _ext(x):
        return jnp.pad(x, ((H, H), (0, 0), (0, 0)))

    def run(x, rhs):
        rhs_ext = _ext(rhs)
        x_out = x
        remaining = iters
        while remaining > 0:
            s = min(K, remaining)
            x_out = p3.fused_jacobi3_slab(
                0, _ext(x_out), rhs_ext, flags, mz=mz, H=H, alpha=1.0,
                beta=6.0, sweeps=s)
            remaining -= s
        return x_out

    return run


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    slope = make_slope(reps)

    x = jax.random.normal(jax.random.key(0), (side, side, side), jnp.float32)
    r = jax.random.normal(jax.random.key(1), (side, side, side), jnp.float32)

    print("== unsharded cheby chain plans at "
          f"{side}^3 (current plan: "
          f"{o3._jacobi3_plan(side, 10, nin=3, nout=2)}) ==", flush=True)
    for iters in (10, 12):
        for tz in (16, 8):
            for K in (2, 3, 4, 5):
                need = o3._jacobi3_need(tz, K, side, 3, 2)
                if need > o3._VMEM3_CEIL:
                    continue
                try:
                    t = slope(uns_cheby_fn(side, iters, tz, K), x, r)
                    print(f"  iters={iters} tz={tz:>2} K={K}: "
                          f"{t * 1e3:7.2f} ms/solve "
                          f"({t / (side ** 3 * iters) * 1e12:6.3f} ps/cs)",
                          flush=True)
                except Exception as e:
                    print(f"  iters={iters} tz={tz:>2} K={K}: FAILED "
                          f"{str(e)[:80]}", flush=True)

    for mz in (254, 128, 64, 32):
        xs = jax.random.normal(jax.random.key(2), (mz, side, side),
                               jnp.float32)
        rs = jax.random.normal(jax.random.key(3), (mz, side, side),
                               jnp.float32)
        print(f"== slab chains mz={mz} (current plans: jac "
              f"{p3.jacobi3_slab_plan(mz, side, 20)}, cheby "
              f"{p3.cheby3_slab_plan(mz, side, 20)}) ==", flush=True)
        for K in (2, 3, 4, 5):
            if K + 1 > mz:
                continue
            try:
                tc = slope(slab_cheby_fn(mz, K, 10), xs, rs)
                tj = slope(slab_jacobi_fn(mz, K, 20), xs, rs)
                print(f"  K={K}: cheby-10 {tc * 1e3:7.2f} ms "
                      f"({tc / (mz * side * side * 10) * 1e12:6.3f} ps/cs)"
                      f", jacobi-20 {tj * 1e3:7.2f} ms "
                      f"({tj / (mz * side * side * 20) * 1e12:6.3f} ps/cs)",
                      flush=True)
            except Exception as e:
                print(f"  K={K}: FAILED {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
