"""Round-5b: before/after for the 3-D lane-axis (di) term skip (5acece2).

Round 4 shipped the gate with a bit-exactness test but no timing — this
measures the gather it changed (``advect3_shift``, the flat masked-shift
trilinear gather) with the gate on vs off (``_GATE_LANE_TERMS``), on the
two displacement regimes the gate's payoff depends on:

- decay-like: max displacement ~0.2 cells — 1-2 of the 2C+1 lane offsets
  fire per (dz, dy) pair;
- forcing-like: max displacement ~1.6 cells (cmax=2) — 2-3 fire.

Fields are random-direction with the stated magnitude (the gate keys on
jnp.min/max of the integer offsets actually used, so magnitude is what
matters).  Slope-timed (scan pairs) like every probe in this repo.

Run: python dev/bench_r5b_ts3.py [side] [reps]
"""
import sys
import time

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as o3  # noqa: E402

L1, L2 = 2, 8


def make_slope(reps):
    def scanned(f, length):
        @jax.jit
        def run(d0, u, v, w):
            def body(c, _):
                return f(c, u, v, w), None

            out, _ = jax.lax.scan(body, d0, None, length=length)
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

    def slope(f, *args):
        f1, f2 = scanned(f, L1), scanned(f, L2)
        tmin(f1, *args), tmin(f2, *args)
        return (tmin(f2, *args) - tmin(f1, *args)) / (L2 - L1)

    return slope


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = side - 2
    slope = make_slope(reps)
    shape = (side, side, side)
    key = jax.random.key(0)
    kd, ku, kv, kw = jax.random.split(key, 4)
    d0 = jax.random.normal(kd, shape, jnp.float32)
    dirs = [jax.random.normal(k, shape, jnp.float32) for k in (ku, kv, kw)]
    dt = 0.016

    for regime, disp, cmax in (("decay", 0.2, 1), ("decay", 0.2, 2),
                               ("forcing", 1.6, 2)):
        # scale so max displacement (|vel|*dt*n) hits `disp` cells
        uvw = [d / jnp.max(jnp.abs(d)) * (disp / (dt * n)) for d in dirs]

        # __wrapped__: the raw (unjitted) flat call — the module flag is
        # invisible to jit's cache key, so going through the cached
        # advect3_shift could silently reuse the gated trace for the
        # ungated measurement.  The probe's own scanned jit is fresh per
        # slope() call and traces this body with the flag's value.
        def gather(d, u, v, w, cmax=cmax):
            return o3._advect3_flat_call.__wrapped__(d, u, v, w, dt, n,
                                                     cmax)

        o3._GATE_LANE_TERMS = True
        t_on = slope(gather, d0, *uvw)
        o3._GATE_LANE_TERMS = False
        t_off = slope(gather, d0, *uvw)
        o3._GATE_LANE_TERMS = True
        print(f"{regime} (disp~{disp} cells, cmax={cmax}) @ {side}^3: "
              f"gated {t_on * 1e3:7.3f} ms, ungated {t_off * 1e3:7.3f} ms "
              f"({t_off / t_on:5.2f}x)", flush=True)


if __name__ == "__main__":
    main()
