"""Round-3b: SLOPE-measured (in-jit lax.scan) op timings — kills the
~1 ms/call relay dispatch noise that chained-call timing smears in.

Each op is wrapped in a scan of K applications inside ONE jit; time(K2) -
time(K1) over (K2-K1) gives the marginal per-application cost.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu import SimConfig, reference_init  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_ops as po  # noqa: E402
from fluidsimulationcuda_tpu.kernels import pallas_step as ps  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0])


def slope(name, make_scan, k1=4, k2=16, reps=3):
    """make_scan(k) -> jitted fn(u, v) -> (u, v) applying the op k times."""
    try:
        f1, f2 = make_scan(k1), make_scan(k2)

        def run(f, k):
            out = f()
            sync(out[0])

        run(f1, k1)
        run(f2, k2)  # compile both
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(f1, k1)
            t1 = time.perf_counter()
            run(f2, k2)
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
        dt = min(ts) * 1e3
        print(f"{name:56s} {dt:8.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:56s} FAILED {str(e)[:140]}", flush=True)
        return None


def main():
    n, iters, cmax = 2046, 20, 1
    side = n + 2
    print(f"devices={jax.devices()}", flush=True)
    key = jax.random.key(0)
    u0 = 0.01 * jax.random.normal(key, (side, side), jnp.float32)
    v0 = 0.01 * jax.random.normal(jax.random.key(1), (side, side),
                                  jnp.float32)

    def scan_pair(op, k):
        @jax.jit
        def f():
            def body(c, _):
                uu, vv = c
                return op(uu, vv), None
            (uu, vv), _ = jax.lax.scan(body, (u0, v0), None, length=k)
            return uu, vv
        return f

    # --- tail variants ---
    def composed(uu, vv):
        u2, v2 = po.advect_shift_fused((1, 2), (uu, vv), uu, vv, 0.016, n,
                                       cmax=cmax, self_advect=True)
        return po.fused_project(u2, v2, n, iters)

    def fused(uu, vv):
        return ps.fused_advect_project(uu, vv, n, iters, 0.016, cmax=cmax)

    slope("tail: advect_pair + fused_project", lambda k: scan_pair(composed, k))
    slope("tail: fused_advect_project tm=256", lambda k: scan_pair(fused, k))

    # tm experiments via plan monkeypatch
    orig_plan = ps._ap_plan
    for tm_try in (128, 512):
        def plan(side_, iters_, cmax_, st=8, _tm=tm_try):
            from fluidsimulationcuda_tpu.kernels.pallas_step import _ceil_t
            margin = _ceil_t(iters_ + 3, st)
            C8 = _ceil_t(cmax_, st)
            if side_ % _tm or _tm + 2 * margin + 2 * C8 > side_:
                return None
            return _tm, margin, C8
        ps._ap_plan = plan
        ps._ap_call.clear_cache()
        slope(f"tail: fused_advect_project tm={tm_try}",
              lambda k: scan_pair(fused, k))
    ps._ap_plan = orig_plan
    ps._ap_call.clear_cache()

    # --- building blocks ---
    slope("fused_project alone", lambda k: scan_pair(
        lambda uu, vv: po.fused_project(uu, vv, n, iters), k))
    slope("advect pair alone (tm=32)", lambda k: scan_pair(
        lambda uu, vv: po.advect_shift_fused(
            (1, 2), (uu, vv), uu, vv, 0.016, n, cmax=cmax,
            self_advect=True), k))
    slope("jacobi 20 sweeps (one field, paired dummy)", lambda k: scan_pair(
        lambda uu, vv: (po.fused_jacobi(1, uu, uu, 0.033, 1.13, iters),
                        vv), k))
    slope("divergence_p + gradient_p", lambda k: scan_pair(
        lambda uu, vv: po.gradient_p(uu, vv, po.divergence_p(uu, vv, n), n),
        k))

    # advect strip-height knob
    orig_tm = po._ADVECT_TM
    for tmk in (64, 128):
        po._ADVECT_TM = tmk
        po._advect_call.clear_cache()
        slope(f"advect pair tm cap={tmk}", lambda k: scan_pair(
            lambda uu, vv: po.advect_shift_fused(
                (1, 2), (uu, vv), uu, vv, 0.016, n, cmax=cmax,
                self_advect=True), k))
    po._ADVECT_TM = orig_tm
    po._advect_call.clear_cache()


if __name__ == "__main__":
    main()
