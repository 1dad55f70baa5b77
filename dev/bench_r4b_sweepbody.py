"""Round-4b: decompose the 25.1 us/sweep body — where do the cycles go?

The round-3 roofline bounded the fused Jacobi sweep at 25.1 us (2048²,
40-vs-20 marginal) against a hardware-perfect ~11 us VPU floor and
attributed the cost to "the four neighbor rotates + combine" without
splitting it.  This probe measures the split directly: a standalone
Pallas kernel replicating the sweep structure (512-row strips resident
in VMEM, K-sweep fori ping-pong, same (wr, side) window shape) with the
neighbor computation swapped per variant:

  stock      4 rolls (2 lane + 2 sublane) + 3 adds + combine
  sublane4   4 sublane rolls (what an all-sublane layout would cost)
  lane4      4 lane rolls
  sublane2   2 sublane rolls (up/down only)
  lane2      2 lane rolls (left/right only)
  none       zero rolls, pure combine (the arithmetic floor)
  slice4     4 aligned-slice neighbor reads from a (wr+2)-padded buffer
             (the round-2 formulation rolls replaced; re-baselined here)

The lane-vs-sublane delta prices the axis-swap/paired-row ideas; the
none row prices the combine; slice4 re-checks whether Mosaic's slice
lowering caught up to rotates.

Run: python dev/bench_r4b_sweepbody.py [side] [reps]
"""
import functools
import sys
import time

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _body(variant, s, rhs, wr, side, a_c, inv_b, dst=None, w=None):
    if variant in ("cheby", "cheby_fma"):
        n = ((pltpu.roll(s, 1, 1) + pltpu.roll(s, side - 1, 1))
             + pltpu.roll(s, 1, 0)) + pltpu.roll(s, wr - 1, 0)
        val = (rhs + a_c * n) * inv_b
        if variant == "cheby":
            return w * val + (jnp.float32(1.0) - w) * dst
        return dst + w * (val - dst)  # same math, FMA-friendlier form
    if variant == "stock":
        n = ((pltpu.roll(s, 1, 1) + pltpu.roll(s, side - 1, 1))
             + pltpu.roll(s, 1, 0)) + pltpu.roll(s, wr - 1, 0)
    elif variant == "sublane4":
        n = ((pltpu.roll(s, 1, 0) + pltpu.roll(s, wr - 1, 0))
             + pltpu.roll(s, 2, 0)) + pltpu.roll(s, wr - 2, 0)
    elif variant == "lane4":
        n = ((pltpu.roll(s, 1, 1) + pltpu.roll(s, side - 1, 1))
             + pltpu.roll(s, 2, 1)) + pltpu.roll(s, side - 2, 1)
    elif variant == "sublane2":
        n = pltpu.roll(s, 1, 0) + pltpu.roll(s, wr - 1, 0)
    elif variant == "lane2":
        n = pltpu.roll(s, 1, 1) + pltpu.roll(s, side - 1, 1)
    elif variant == "none":
        n = s
    else:
        raise ValueError(variant)
    return (rhs + a_c * n) * inv_b


def _kernel(x_ref, rhs_ref, o_ref, buf_a, buf_b, rhs2, *, sweeps, wr,
            side, variant):
    a_c = jnp.float32(1.0)
    inv_b = jnp.float32(0.25)
    buf_a[:] = x_ref[:]
    slot = jax.lax.rem(pl.program_id(0), 2)
    if variant == "slot":
        # price the real kernel's dynamic-slot rhs read (rhs2.at[slot])
        rref = rhs2.at[slot]
        rref[:] = rhs_ref[:]
        inner = "stock"
    else:
        rref = rhs_ref
        inner = variant

    if variant in ("cheby", "cheby_fma"):
        def double(_, w):
            buf_b[:] = _body(inner, buf_a[:], rref[:], wr, side, a_c,
                             inv_b, dst=buf_b[:], w=w)
            w2 = jnp.float32(1.0) / (jnp.float32(1.0)
                                     - jnp.float32(0.2) * w)
            buf_a[:] = _body(inner, buf_b[:], rref[:], wr, side, a_c,
                             inv_b, dst=buf_a[:], w=w2)
            return jnp.float32(1.0) / (jnp.float32(1.0)
                                       - jnp.float32(0.2) * w2)

        jax.lax.fori_loop(0, sweeps // 2, double, jnp.float32(1.5))
    else:
        def double(_, c):
            buf_b[:] = _body(inner, buf_a[:], rref[:], wr, side, a_c,
                             inv_b)
            buf_a[:] = _body(inner, buf_b[:], rref[:], wr, side, a_c,
                             inv_b)
            return c

        jax.lax.fori_loop(0, sweeps // 2, double, 0)
    o_ref[:] = buf_a[:]


def make(side, tm, sweeps, variant, length=12):
    wr = tm  # no margins: the probe prices the body, not the windowing

    def call(x, rhs):
        k = functools.partial(_kernel, sweeps=sweeps, wr=wr, side=side,
                              variant=variant)
        blk = pl.BlockSpec((tm, side), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k, grid=(side // tm,),
            out_shape=jax.ShapeDtypeStruct((side, side), jnp.float32),
            in_specs=[blk, blk], out_specs=blk,
            scratch_shapes=[pltpu.VMEM((wr, side), jnp.float32),
                            pltpu.VMEM((wr, side), jnp.float32),
                            pltpu.VMEM((2, wr, side), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2**20),
        )(x, rhs)

    @jax.jit
    def run(x, rhs):
        # scan-amplified (relay sync noise >> one kernel; see bench_r3k)
        def body(c, _):
            return call(c, rhs), None

        out, _ = jax.lax.scan(body, x, None, length=length)
        return out

    return run


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tm = 512
    x = jax.random.normal(jax.random.key(0), (side, side), jnp.float32)
    rhs = jax.random.normal(jax.random.key(1), (side, side), jnp.float32)

    def tmin(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x, rhs)
            _ = float(out.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    length = 150
    print(f"side={side} tm={tm} (40-vs-20 in-kernel sweep marginal, "
          f"scan x{length})", flush=True)
    for variant in ("stock", "slot", "cheby", "cheby_fma", "sublane4",
                    "lane4", "sublane2", "lane2", "none"):
        f20 = make(side, tm, 20, variant, length)
        f40 = make(side, tm, 40, variant, length)
        tmin(f20), tmin(f40)  # warm both compiles
        dt = (tmin(f40) - tmin(f20)) / 20 / length * 1e6
        print(f"{variant:>9}: {dt:7.2f} us/sweep", flush=True)


if __name__ == "__main__":
    main()
