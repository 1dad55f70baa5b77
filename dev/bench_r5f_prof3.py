"""Round-5f: 3-D parity step phase decomposition at 256³.

The 256³ parity step measures ~43.9 ms (382 Mcell/s) against a ≥480
target; the sweeps alone (120 @ the measured fused-jacobi3 rate) only
explain ~18 ms.  This decomposes the composed step into its phase costs
— each op slope-timed on the real shapes, interleaved — to locate the
remainder (gathers? divergence/gradient streams? set_bnd3 face/edge
fixes? XLA copies between kernels?).

Phases (the exact step3 composition, models/stable_fluids_3d.py):
  4x add_source, 4x fused_jacobi3-20 (u,v,w,dens), 2x [divergence3_p +
  fused_jacobi3-20 zero_init + gradient3_p + 3x set_bnd3], 3x
  advect3_shift + fix_faces3 (self-advection), 1x fix_edges3 +
  advect3_shift + set_bnd3 (density), with cmax=1 decay windows.

Run: python dev/bench_r5f_prof3.py [side]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fluidsimulationcuda_tpu import SimConfig  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3  # noqa: E402
from fluidsimulationcuda_tpu.models.stable_fluids_3d import (  # noqa: E402
    make_step_fn_3d,
)
from fluidsimulationcuda_tpu.core.state import (  # noqa: E402
    reference_init, zero_sources,
)
from fluidsimulationcuda_tpu.ops import three_d as o3  # noqa: E402

L1, L2 = 2, 8
REPS = 6


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = side - 2
    cfg = SimConfig(n=n, ndim=3, jacobi_iters=20, backend="auto",
                    max_courant=1)
    dt = cfg.dt

    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    u, v, w, d = [0.1 * jax.random.normal(k, (side,) * 3, jnp.float32)
                  for k in ks]

    def scan1(f):
        def run(length):
            @jax.jit
            def go(x):
                def body(c, _):
                    return f(c), None

                out, _ = jax.lax.scan(body, x, None, length=length)
                return out

            return go

        return run(L1), run(L2)

    cells = {
        "add_source": scan1(lambda x: x + jnp.float32(dt) * u),
        "jacobi3_20 (1 solve)": scan1(
            lambda x: k3.fused_jacobi3(1, x, u, 1.0, 7.0, 20)),
        "divergence3_p": scan1(lambda x: k3.divergence3_p(x, v, w, n)),
        "gradient3_p (3 outs)": scan1(
            lambda x: k3.gradient3_p(x, v, w, d, n)[0]),
        "advect3_shift cmax=1": scan1(
            lambda x: k3.advect3_shift(0, x, u, v, w, dt, n, cmax=1)),
        "set_bnd3 (faces)": scan1(lambda x: o3.set_bnd3(1, x)),
        "fix_edges3": scan1(lambda x: o3.fix_edges3(x)),
        "fix_faces3": scan1(lambda x: o3.fix_faces3(1, x)),
    }

    built = {}
    for name, (f1, f2) in cells.items():
        for f in (f1, f2):
            out = f(u)
            _ = float(out.ravel()[0])
        built[name] = (f1, f2)
    print("compiled; interleaved timing...", flush=True)

    times = {name: ([], []) for name in built}
    for _ in range(REPS):
        for name, (f1, f2) in built.items():
            for i, f in enumerate((f1, f2)):
                t0 = time.perf_counter()
                out = f(u)
                _ = float(out.ravel()[0])
                times[name][i].append(time.perf_counter() - t0)
    per = {}
    for name, (t1s, t2s) in times.items():
        per[name] = (min(t2s) - min(t1s)) / (L2 - L1)
        print(f"{name:>24}: {per[name] * 1e3:7.3f} ms", flush=True)

    comp = (
        4 * per["add_source"]
        + 6 * per["jacobi3_20 (1 solve)"]
        + 2 * (per["divergence3_p"] + per["gradient3_p (3 outs)"]
               + 3 * per["set_bnd3 (faces)"])
        + 4 * per["advect3_shift cmax=1"]
        + 3 * per["fix_faces3"]
        + per["fix_edges3"] + per["set_bnd3 (faces)"]
    )
    print(f"{'op-sum estimate':>24}: {comp * 1e3:7.3f} ms", flush=True)

    # the composed step, same session
    state, _src = reference_init(key, cfg)
    step = make_step_fn_3d(cfg)
    zeros = zero_sources(cfg)

    def whole(length):
        @jax.jit
        def go(s):
            def body(c, _):
                return step(c, zeros), None

            out, _ = jax.lax.scan(body, s, None, length=length)
            return out

        return go

    f1, f2 = whole(L1), whole(L2)
    for f in (f1, f2):
        out = f(state)
        _ = float(out.dens.ravel()[0])
    ts = ([], [])
    for _ in range(REPS):
        for i, f in enumerate((f1, f2)):
            t0 = time.perf_counter()
            out = f(state)
            _ = float(out.dens.ravel()[0])
            ts[i].append(time.perf_counter() - t0)
    t_step = (min(ts[1]) - min(ts[0])) / (L2 - L1)
    print(f"{'composed parity step':>24}: {t_step * 1e3:7.3f} ms "
          f"({cfg.num_cells / t_step / 1e6:.0f} Mcell/s); "
          f"op-sum covers {comp / t_step:5.1%}", flush=True)


if __name__ == "__main__":
    main()
