"""Round-4d: the sharded-3D junction-tax curve at real slab shapes.

The round-3 multi-chip table measured the sharded 3-D kernels at 77% of
unsharded on the 1x1 mesh and DEFENDED the gap with untested arithmetic
("real slabs shrink the junction tax proportionally").  The planner
already says why the 1x1 mesh is the worst case: mz=254 (the full
interior, 2x127) admits only tz∈{2,1} strips, forcing a (tz=2, K=2)
plan — 10 halo-exchange junctions per 20-sweep solve — while real slab
heights (mz=128/64/32, the 2/4/8-shard shapes) are 16-divisible and
plan (tz=16, K=4).

This probe MEASURES the curve on the single chip: the exact chunked
slab solves the sharded step runs (``parallel/sharded3d.diffuse`` /
``diffuse_cheby``, pz=1 halos — zero-filled, as on the 1x1 mesh; the
ppermute itself is the one term a single chip cannot price, stated), at
mz ∈ {254, 128, 64, 32} x 256² planes, reported as per-cell-sweep cost
against the unsharded ``fused_jacobi3`` at 256³.

Run: python dev/bench_r4d_slab3.py [side] [reps]
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

ITERS = 20
CHEBY = 10
RHO = 0.85


def _ext(x, H):
    return jnp.pad(x, ((H, H), (0, 0), (0, 0)))


def make_slab_jacobi(mz, side, flags):
    _, K = p3.jacobi3_slab_plan(mz, side, min(20, ITERS))
    H = K + 1

    def run(x, rhs):
        rhs_ext = _ext(rhs, H)
        remaining = ITERS
        while remaining > 0:
            s = min(K, remaining)
            x = p3.fused_jacobi3_slab(
                0, _ext(x, H), rhs_ext, flags, mz=mz, H=H, alpha=1.0,
                beta=6.0, sweeps=s)
            remaining -= s
        return x

    return run, K


def make_slab_cheby(mz, side, flags):
    _, K = p3.cheby3_slab_plan(mz, side, min(20, CHEBY))
    H = K + 1
    ws_all = [None] + [float(w) for w in cheby_omegas(RHO, CHEBY)]

    def run(x, rhs):
        rhs_ext = _ext(rhs, H)
        xm, done = None, 0
        while done < CHEBY:
            s = min(K, CHEBY - done)
            ws = tuple(ws_all[done:done + s])
            last = done + s >= CHEBY
            res = p3.fused_cheby3_slab(
                0, _ext(x, H), _ext(xm, H) if xm is not None else None,
                rhs_ext, flags, mz=mz, H=H, alpha=1.0, beta=6.0, ws=ws,
                carry_in=xm is not None, carry_out=not last)
            if last:
                x = res
            else:
                x, xm = res
            done += s
        return x

    return run, K


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = side - 2
    L1, L2 = 2, 8  # slope pair: the relay adds ~26 ms sync per measurement

    def scanned(f, length):
        @jax.jit
        def run(x, rhs):
            def body(c, _):
                return f(c, rhs), None

            out, _ = jax.lax.scan(body, x, None, length=length)
            return out

        return run

    def tmin(f, *args):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(out.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def slope(f, x, rhs):
        """seconds per solve, scan-slope (dodges the relay sync floor)."""
        f1, f2 = scanned(f, L1), scanned(f, L2)
        tmin(f1, x, rhs), tmin(f2, x, rhs)
        return (tmin(f2, x, rhs) - tmin(f1, x, rhs)) / (L2 - L1)

    # unsharded anchors at side³
    xs = jax.random.normal(jax.random.key(0), (side, side, side),
                           jnp.float32)
    rs = jax.random.normal(jax.random.key(1), (side, side, side),
                           jnp.float32)

    def uns_j(x, rhs):
        return o3.fused_jacobi3(0, x, rhs, 1.0, 6.0, ITERS)

    def uns_c(x, rhs):
        return o3.fused_jacobi3(0, x, rhs, 1.0, 6.0, CHEBY, cheby_rho=RHO)

    tj = slope(uns_j, xs, rs)
    tc = slope(uns_c, xs, rs)
    cell_sweeps_j = side * side * side * ITERS
    cell_sweeps_c = side * side * side * CHEBY
    print(f"unsharded {side}^3: jacobi-{ITERS} {tj * 1e3:7.2f} ms "
          f"({tj / cell_sweeps_j * 1e12:6.3f} ps/cell-sweep), "
          f"cheby-{CHEBY} {tc * 1e3:7.2f} ms "
          f"({tc / cell_sweeps_c * 1e12:6.3f} ps/cell-sweep)", flush=True)

    flags = jnp.array([1, 1, 0], jnp.int32)  # 1x1-mesh wall flags
    print(f"{'mz':>4} {'plan':>9} | {'jacobi ms':>9} {'ps/cs':>7} "
          f"{'vs uns':>6} | {'cheby ms':>9} {'ps/cs':>7} {'vs uns':>6}",
          flush=True)
    for mz in (254, 128, 64, 32):
        x = jax.random.normal(jax.random.key(2), (mz, side, side),
                              jnp.float32)
        rhs = jax.random.normal(jax.random.key(3), (mz, side, side),
                                jnp.float32)
        fj, Kj = make_slab_jacobi(mz, side, flags)
        fc, Kc = make_slab_cheby(mz, side, flags)
        t1 = slope(fj, x, rhs)
        t2 = slope(fc, x, rhs)
        ps1 = t1 / (mz * side * side * ITERS) * 1e12
        ps2 = t2 / (mz * side * side * CHEBY) * 1e12
        r1 = (tj / cell_sweeps_j * 1e12) / ps1
        r2 = (tc / cell_sweeps_c * 1e12) / ps2
        print(f"{mz:>4} K={Kj}/{Kc:>2}   | {t1 * 1e3:9.2f} {ps1:7.3f} "
              f"{r1:5.0%} | {t2 * 1e3:9.2f} {ps2:7.3f} {r2:5.0%}",
              flush=True)


if __name__ == "__main__":
    main()
