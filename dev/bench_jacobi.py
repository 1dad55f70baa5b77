"""Dev harness: fused-Jacobi kernel variants, timed on the real TPU.

Knobs explored: strip height, BC-in-sweep vs skipped, fori_loop vs python
unroll, division vs reciprocal multiply.  Findings feed pallas_ops.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ceil8(x):
    return -(-x // 8) * 8


def make_jacobi(side, tm, sweeps, *, bc=True, unroll=False, recip=False,
                edge_copy=True, aligned=False, vmem_mb=16):
    margin = ceil8(sweeps + 1)
    wr = side if tm == side else tm + 2 * margin
    alpha, beta = 0.0327, 1.1308

    def kernel(x_hbm, rhs_hbm, out_ref, A, B, R, sems):
        gi = pl.program_id(0)
        r0 = gi * tm
        start = pl.multiple_of(jnp.clip(r0 - margin, 0, side - wr), 8)
        c1 = pltpu.make_async_copy(x_hbm.at[pl.ds(start, wr), :], A, sems.at[0])
        c2 = pltpu.make_async_copy(rhs_hbm.at[pl.ds(start, wr), :], R, sems.at[1])
        c1.start(); c2.start(); c1.wait(); c2.wait()
        a_c = jnp.float32(alpha)
        if recip:
            ib = jnp.float32(1.0 / beta)
        else:
            b_c = jnp.float32(beta)

        def sweep(src, dst):
            s = src[:]
            if aligned:
                sL = pltpu.roll(s, 1, 1)
                sR = pltpu.roll(s, side - 1, 1)
                sU = pltpu.roll(s, 1, 0)
                sD = pltpu.roll(s, wr - 1, 0)
                neigh = ((sL + sR) + sU) + sD
                val = R[:] + a_c * neigh
                dst[:] = val * ib if recip else val / b_c
            else:
                neigh = ((s[1:-1, :-2] + s[1:-1, 2:]) + s[:-2, 1:-1]) + s[2:, 1:-1]
                val = R[1:-1, 1:-1] + a_c * neigh
                dst[1:-1, 1:-1] = val * ib if recip else val / b_c
            if edge_copy:
                dst[0:1, :] = s[0:1, :]
                dst[wr - 1:wr, :] = s[wr - 1:wr, :]
            if bc:
                dst[:, 0:1] = -dst[:, 1:2]
                dst[:, side - 1:side] = -dst[:, side - 2:side - 1]
                @pl.when(start == 0)
                def _():
                    dst[0:1, :] = dst[1:2, :]
                @pl.when(start + wr == side)
                def _():
                    dst[wr - 1:wr, :] = dst[wr - 2:wr - 1, :]

        if unroll:
            for k in range(sweeps // 2):
                sweep(A, B); sweep(B, A)
        else:
            def body(_, c):
                sweep(A, B); sweep(B, A)
                return c
            jax.lax.fori_loop(0, sweeps // 2, body, 0)
        out_ref[:] = A[pl.ds(pl.multiple_of(r0 - start, 8), tm), :]

    @jax.jit
    def run(x, rhs):
        return pl.pallas_call(
            kernel,
            grid=(side // tm,),
            out_shape=jax.ShapeDtypeStruct((side, side), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec((tm, side), lambda gi: (gi, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((wr, side), jnp.float32)] * 3
            + [pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20),
        )(x, rhs)

    return run


def sync(x):
    _ = float(x.ravel()[0])


def timeit(name, fn, *args, reps=30):
    try:
        out = fn(*args); sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:8.3f} ms")
    except Exception as e:
        print(f"{name:44s} FAILED {str(e)[:120]}")


if __name__ == "__main__":
    side = 2048
    x = jax.random.uniform(jax.random.key(0), (side, side), jnp.float32)
    r = jax.random.uniform(jax.random.key(1), (side, side), jnp.float32)

    timeit("tm=128 aligned (16MB)", make_jacobi(side, 128, 20, aligned=True, edge_copy=False), x, r)
    timeit("tm=256 aligned 64MB", make_jacobi(side, 256, 20, aligned=True, edge_copy=False, vmem_mb=64), x, r)
    timeit("tm=512 aligned 64MB", make_jacobi(side, 512, 20, aligned=True, edge_copy=False, vmem_mb=64), x, r)
    timeit("tm=1024 aligned 100MB", make_jacobi(side, 1024, 20, aligned=True, edge_copy=False, vmem_mb=100), x, r)
    timeit("tm=2048 aligned 100MB", make_jacobi(side, 2048, 20, aligned=True, edge_copy=False, vmem_mb=100), x, r)
