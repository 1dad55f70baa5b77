"""Round-5e: the PUBLISHED sharded-3D junction-tax curve.

``bench_r4d_slab3.py`` measured the curve but its per-session numbers
drift ±30% through the relay (unsharded cheby-10 read 3.09/2.69/2.31 ms
across three sessions), so ratios across sessions are untrustworthy.
This run interleaves EVERY cell with the unsharded anchors (A,B,C,...
repeated reps=8, min taken per cell) so the published "% of unsharded"
column comes from one drift-cancelled session.

Cells: unsharded jacobi-20 / cheby-10 / cheby-12 at 256³ (anchors),
slab jacobi-20 / cheby-10 / cheby-12 at mz ∈ {256, 128, 64, 32} × 256²
on the planner's own plan (zero-filled halos, as on the shard edges of
a real mesh; the ppermute itself is the one term a single chip cannot
price).  mz is the REAL per-shard height: ``parallel/sharded3d`` shards
the full padded volume P("z"), so mz = 256/pz — always 16-divisible.
The non-divisible mz=254 row of the earlier probes (r4d) can never
occur in the shipped decomposition; it measured what a ragged slab
WOULD cost (29%/36% of unsharded — the tz=2 plan), i.e. why the
decomposition divides evenly.  cheby-12 cells price the compensated
mode's raised pressure solve for the sharded-compensated vs
sharded-jacobi decision.

Run: python dev/bench_r5e_tax3.py
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "dev"))
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as o3  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_sharded_3d as p3  # noqa: E402
from bench_r5a_plans3 import scanned, slab_cheby_fn, slab_jacobi_fn  # noqa: E402
from bench_r5a_plans3 import L1, L2  # noqa: E402

SIDE = 256
REPS = 8
RHO = 0.85


def main():
    x = jax.random.normal(jax.random.key(0), (SIDE,) * 3, jnp.float32)
    r = jax.random.normal(jax.random.key(1), (SIDE,) * 3, jnp.float32)

    cells = {}

    def uns_j(xx, rr):
        return o3.fused_jacobi3(0, xx, rr, 1.0, 6.0, 20)

    def uns_c(xx, rr):
        return o3.fused_jacobi3(0, xx, rr, 1.0, 6.0, 10, cheby_rho=RHO)

    def uns_c12(xx, rr):
        return o3.fused_jacobi3(0, xx, rr, 1.0, 6.0, 12, cheby_rho=RHO)

    cells["uns_jac"] = (uns_j, x, r, SIDE * SIDE * SIDE * 20)
    cells["uns_cheby"] = (uns_c, x, r, SIDE * SIDE * SIDE * 10)
    cells["uns_cheby12"] = (uns_c12, x, r, SIDE * SIDE * SIDE * 12)
    for mz in (256, 128, 64, 32):
        xs = jax.random.normal(jax.random.key(2), (mz, SIDE, SIDE),
                               jnp.float32)
        rs = jax.random.normal(jax.random.key(3), (mz, SIDE, SIDE),
                               jnp.float32)
        _, Kj = p3.jacobi3_slab_plan(mz, SIDE, 20)
        _, Kc = p3.cheby3_slab_plan(mz, SIDE, 20)
        cells[f"slab{mz}_jac(K={Kj})"] = (
            slab_jacobi_fn(mz, Kj, 20), xs, rs, mz * SIDE * SIDE * 20)
        cells[f"slab{mz}_cheby(K={Kc})"] = (
            slab_cheby_fn(mz, Kc, 10), xs, rs, mz * SIDE * SIDE * 10)
        cells[f"slab{mz}_cheby12(K={Kc})"] = (
            slab_cheby_fn(mz, Kc, 12), xs, rs, mz * SIDE * SIDE * 12)

    built = {}
    for name, (f, xx, rr, cs) in cells.items():
        f1, f2 = scanned(f, L1), scanned(f, L2)
        for fn in (f1, f2):  # warm/compile
            out = fn(xx, rr)
            _ = float(out.ravel()[0])
        built[name] = (f1, f2, xx, rr, cs)
    print("compiled all cells; interleaved timing...", flush=True)

    times = {name: ([], []) for name in built}
    for _ in range(REPS):
        for name, (f1, f2, xx, rr, _cs) in built.items():
            for i, fn in enumerate((f1, f2)):
                t0 = time.perf_counter()
                out = fn(xx, rr)
                _ = float(out.ravel()[0])
                times[name][i].append(time.perf_counter() - t0)

    ps = {}
    for name, (_f1, _f2, _x, _r, cs) in built.items():
        t1s, t2s = times[name]
        t = (min(t2s) - min(t1s)) / (L2 - L1)
        ps[name] = t / cs * 1e12
        print(f"{name:>22}: {t * 1e3:7.2f} ms/solve  "
              f"{ps[name]:7.3f} ps/cell-sweep", flush=True)
    for mz in (256, 128, 64, 32):
        for sol, anchor in (("jac", "uns_jac"), ("cheby", "uns_cheby"),
                            ("cheby12", "uns_cheby12")):
            key = next(k for k in ps if k.startswith(f"slab{mz}_{sol}("))
            print(f"  slab mz={mz} {sol}: {ps[anchor] / ps[key]:5.0%} "
                  f"of unsharded", flush=True)


if __name__ == "__main__":
    main()
