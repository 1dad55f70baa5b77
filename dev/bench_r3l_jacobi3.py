"""Probe the 3-D fused-Jacobi plan space at 256³ on hardware.

Hypothesis: `_jacobi3_plan` minimizes wz/(tz*K) — a DMA-amortization
metric — but the sweep is compute-bound, so the real cost driver is the
compute redundancy wz/tz (every window re-sweeps its full wz planes for
tz output planes).  The round-2 plan (tz=8, K=5, wz=20) carries 2.5x
redundant compute; larger tz under a bigger VMEM budget should approach
1.25x.  Run: python dev/bench_r3l_jacobi3.py [side] [iters]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache


def slope(fn, args, reps_lo=2, reps_hi=8):
    def run(reps):
        out = None
        for _ in range(reps):
            out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    run(1)
    def timed(reps):
        t0 = time.perf_counter()
        run(reps)
        return time.perf_counter() - t0
    timed(reps_lo)
    t_lo = min(timed(reps_lo) for _ in range(2))
    t_hi = min(timed(reps_hi) for _ in range(2))
    return (t_hi - t_lo) / (reps_hi - reps_lo)


def chained(b, x_init, x0, alpha, beta, iters, tz, K, side, zero_init):
    x = x_init
    first = True
    remaining = iters
    while remaining > 0:
        s = min(remaining, K)
        x = k3._fused_jacobi3_call(
            b, x, x0, float(alpha), float(beta), s, tz, side,
            zero_init and first, False,
        )
        first = False
        remaining -= s
    return x


def main():
    enable_compilation_cache()
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    key = jax.random.key(0)
    x = jax.random.normal(key, (side, side, side), jnp.float32)
    rhs = jax.random.normal(jax.random.key(1), x.shape, jnp.float32)

    pb = side * side * 4 / 2**20
    print(f"side={side} iters={iters} plane={pb:.2f} MB")
    for zero_init in (False, True):
        nb = 4 if zero_init else 6
        print(f"--- zero_init={zero_init} ({nb}wz+2tz buffers) ---")
        ref = None
        for tz in (8, 16, 32, 64):
            if side % tz:
                continue
            for K in (1, 2, 3, 4, 5, 8, 10):
                if K > iters:
                    continue
                wz = tz + 2 * (K + 1)
                if wz > side:
                    continue
                bufs = (nb * wz + 2 * tz) * pb
                # calibrated need model: bufs + ~1.25*K*wz Mosaic sweep
                # temporaries (fit to the 256^3 pass/fail boundary)
                need = bufs + 1.25 * K * wz * pb + 4
                mb = min(need, 96)
                if need > 96:  # over the verified ceiling
                    print(f"tz={tz:3d} K={K:2d} wz={wz:3d} SKIP "
                          f"(need~{need:.0f}MB)")
                    continue
                try:
                    fn = jax.jit(
                        lambda a, b, tz=tz, K=K, zi=zero_init: chained(
                            1, a, b, 0.1, 1.6, iters, tz, K, side, zi))
                    out = fn(x, rhs)
                    if ref is None:
                        ref = out
                        err = 0.0
                    else:
                        err = float(jnp.max(jnp.abs(out - ref)))
                    t = slope(fn, (x, rhs))
                    print(f"tz={tz:3d} K={K:2d} wz={wz:3d} "
                          f"red={wz/tz:5.2f} vmem~{mb:5.0f}MB  "
                          f"{t*1e3:7.2f} ms ({t/iters*1e6:6.1f} us/sweep)"
                          f"  maxdiff={err:.2e}")
                except Exception as e:
                    print(f"tz={tz:3d} K={K:2d} wz={wz:3d} FAIL: "
                          f"{str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
