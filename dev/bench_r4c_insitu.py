"""Round-4c: margin-matched in-situ per-sweep cost of the REAL fused kernel.

The round-3 roofline's 25.1 us/sweep was the 40-vs-20 marginal — but the
fused window margin grows with the sweep count (margin = ceil8(k+1): 24
rows at k=20, 48 at k=40), so that marginal mixes the extra sweeps with
extra margin rows for ALL sweeps.  The r4b body probe (14.46 us pure
4-roll body on margin-free windows; lane roll ~2.8 us, sublane roll
~3.6 us, combine 1.75 us near VPU issue peak) says the true body is much
cheaper.  This probe times the real ``fused_jacobi`` at iters pairs that
land in the SAME margin bucket (ceil8(k+1) equal), isolating the in-situ
per-sweep cost with window size held fixed:

  (14, 13): margin 16 both     (20, 17): margin 24 both
  cheby vs plain at (14, 13)   fast_math at (14, 13)

Run: python dev/bench_r4c_insitu.py [side] [reps]
"""
import sys
import time

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fluidsimulationcuda_tpu.kernels import pallas_ops as po  # noqa: E402


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    length = 150
    a = jax.random.normal(jax.random.key(0), (side, side), jnp.float32)

    def make(iters, **kw):
        @jax.jit
        def f(x):
            def body(c, _):
                return po.fused_jacobi(1, c, c, 1.0, 4.0, iters, **kw), None

            out, _ = jax.lax.scan(body, x, None, length=length)
            return out

        return f

    def tmin(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(a)
            _ = float(out.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marginal(label, k_lo, k_hi, **kw):
        f1, f2 = make(k_lo, **kw), make(k_hi, **kw)
        tmin(f1), tmin(f2)
        dt = (tmin(f2) - tmin(f1)) / (k_hi - k_lo) / length * 1e6
        print(f"{label:50s} {dt:7.2f} us/sweep", flush=True)

    st = po._sub(jnp.float32)
    # wide margin-matched pairs: ceil8(k+1) equal within each pair, and
    # the sweep delta (7-8) is large enough to clear relay timing noise
    for k_lo, k_hi in ((24, 31), (40, 47)):
        m1 = po._ceil_t(k_lo + 1, st)
        m2 = po._ceil_t(k_hi + 1, st)
        assert m1 == m2, (k_lo, k_hi, m1, m2)
    print(f"side={side}, margin-matched pairs, scan x{length}", flush=True)
    marginal("plain jacobi (24 vs 31, margin 32)", 24, 31)
    marginal("plain jacobi (40 vs 47, margin 48)", 40, 47)
    marginal("chebyshev rho=0.9 (24 vs 31)", 24, 31, cheby_rho=0.9)
    marginal("fast_math (24 vs 31)", 24, 31, fast=True)
    # the round-3 headline marginal for comparison (margin grows 24->48)
    marginal("40-vs-20 marginal (the r3 roofline number)", 20, 40)


if __name__ == "__main__":
    main()
