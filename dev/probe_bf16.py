"""Throwaway hardware probe: do the kernel building blocks compile for bf16?

Checks (each in a tiny standalone pallas_call, compiled on the real TPU):
  1. sublane + lane pltpu.roll on a bf16 (256, 256) block
  2. 1-row / 1-col boundary stores (the _apply_bnd_window pattern)
  3. static unaligned row slices (wbuf[8+a : 8+a+tm+1] pattern)
  4. dynamic sublane roll with computed shift
  5. jnp.where(int32 mask, bf16, bf16) select + f32 blend epilogue
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIDE = 256
failures = []


def run(name, kernel, x, n_out=1):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
        r = np.asarray(out[0] if isinstance(out, tuple) else out)
        ok = np.isfinite(r).all()
        print(f"{'PASS' if ok else 'FAIL'}  {name}  finite={ok}")
        if not ok:
            failures.append(name)
        return r
    except Exception as e:  # noqa: BLE001
        print(f"FAIL  {name}  {type(e).__name__}: {str(e)[:200]}")
        failures.append(name)
        return None


x = jnp.asarray(
    np.random.default_rng(0).uniform(0.1, 1.0, (SIDE, SIDE)), jnp.bfloat16
)


def k_roll(x_ref, o_ref):
    s = x_ref[:]
    o_ref[:] = (
        pltpu.roll(s, 1, 0) + pltpu.roll(s, SIDE - 1, 0)
        + pltpu.roll(s, 1, 1) + pltpu.roll(s, SIDE - 1, 1)
    )


run("bf16 static rolls", k_roll, x)


def k_bnd(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    half = jnp.asarray(-1.0, o_ref.dtype)
    o_ref[:, 0:1] = half * o_ref[:, 1:2]
    o_ref[:, SIDE - 1 : SIDE] = half * o_ref[:, SIDE - 2 : SIDE - 1]
    o_ref[0:1, :] = half * o_ref[1:2, :]
    o_ref[SIDE - 1 : SIDE, :] = half * o_ref[SIDE - 2 : SIDE - 1, :]
    o_ref[0:1, 0:1] = jnp.asarray(0.5, o_ref.dtype) * (
        o_ref[0:1, 1:2] + o_ref[1:2, 0:1]
    )


run("bf16 boundary 1-row/1-col stores", k_bnd, x)


def k_slice(x_ref, o_ref):
    acc = jnp.zeros((SIDE, SIDE), jnp.float32)
    for a in (-2, -1, 0, 1, 2):
        # static unaligned row slice, 17 rows worth at offset 16+a
        s = x_ref[16 + a : 16 + a + 8, :].astype(jnp.float32)
        acc = acc.at[0:8].add(s) if False else acc + jnp.pad(
            s, ((0, SIDE - 8), (0, 0))
        )
    o_ref[:] = acc.astype(o_ref.dtype)


run("bf16 static unaligned row slices", k_slice, x)


def k_dynroll(x_ref, o_ref):
    shift = jax.lax.rem(
        jnp.int32(SIDE) + 16 - (pl.program_id(0) * 0 + 32), jnp.int32(SIDE)
    )
    o_ref[:] = pltpu.roll(x_ref[:], shift, 0)


run("bf16 dynamic sublane roll", k_dynroll, x)


def k_select_blend(x_ref, o_ref):
    s = x_ref[:]
    key = jax.lax.broadcasted_iota(jnp.int32, (SIDE, SIDE), 1) % 3
    a = jnp.where(key == 0, s, pltpu.roll(s, 1, 1))
    b = jnp.where(key == 1, s, pltpu.roll(s, 1, 0))
    w = jnp.asarray(0.25, jnp.float32)
    o_ref[:] = (
        w * a.astype(jnp.float32) + (1 - w) * b.astype(jnp.float32)
    ).astype(o_ref.dtype)


run("bf16 masked select + f32 blend", k_select_blend, x)

print(f"{len(failures)} failure(s)")
sys.exit(1 if failures else 0)
