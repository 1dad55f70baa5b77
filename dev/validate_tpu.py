"""On-hardware validation suite — run on a real TPU (not in CI).

Covers what the CPU test suite cannot: compiled-Mosaic numerics vs the
NumPy oracle, and the headline performance points.  Exits nonzero on any
check failure.

  python dev/validate_tpu.py            # parity + quick perf
  python dev/validate_tpu.py --full     # adds 8192^2 and datagen points
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from fluidsimulationcuda_tpu import (  # noqa: E402
    SimConfig, make_step_fn, reference_init, zero_sources,
)
from fluidsimulationcuda_tpu.oracle import numpy_ref as oracle  # noqa: E402

FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILURES.append(name)


def parity_100_steps():
    cfg = SimConfig(n=126, jacobi_iters=20, backend="pallas", max_courant=4)
    state, sources = reference_init(jax.random.key(42), cfg)
    step = make_step_fn(cfg)
    zeros = zero_sources(cfg)
    s = state
    for k in range(100):
        s = step(s, sources if k == 0 else zeros)
    dens = np.asarray(state.dens)
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    ds, us, vs = map(np.asarray, (sources.dens, sources.u, sources.v))
    z = np.zeros_like(ds)
    for k in range(100):
        src = (ds, us, vs) if k == 0 else (z, z, z)
        dens, u, v = oracle.step(dens, u, v, *src, dt=cfg.dt, visc=cfg.visc,
                                 diff=cfg.diff, n=cfg.n, iters=cfg.jacobi_iters)
    dd = np.abs(np.asarray(s.dens) - dens).max()
    du = np.abs(np.asarray(s.u) - u).max()
    check("parity 100 steps @128^2 (pallas vs oracle)",
          dd < 1e-5 and du < 1e-5, f"dens {dd:.2e} u {du:.2e}")


def compiled_differential(n=2046, iters=20):
    """Per-kernel compiled-Mosaic vs jnp differential at full size: strip
    seams, random inputs, the whole clamped-displacement range, fused
    projection, batched leading dim, fast_math, and the sharded slab path.

    This lane exists because interpret-mode CI cannot see Mosaic lowering
    bugs: it caught compiled ``pltpu.roll`` mis-rotating NEGATIVE dynamic
    sublane shifts (advect terms with di > 0 read one block off — silent
    wrong values, exactly the class VERDICT r1 #6 predicted)."""
    import jax.numpy as jnp

    from fluidsimulationcuda_tpu.kernels import pallas_ops as po
    from fluidsimulationcuda_tpu.kernels import pallas_sharded as ps
    from fluidsimulationcuda_tpu.ops.advect import advect_windowed
    from fluidsimulationcuda_tpu.ops.diffuse import diffuse as diffuse_ref
    from fluidsimulationcuda_tpu.ops.project import (
        apply_pressure_gradient as apg_ref,
        divergence as div_ref,
        pressure_solve as psolve_ref,
    )

    side = n + 2
    m = side
    cmax = 4
    rng = np.random.default_rng(7)

    def rnd():
        return jnp.asarray(rng.uniform(-1, 1, (side, side)).astype(np.float32))

    u, v, x0 = rnd(), rnd(), rnd()
    dt = 0.016
    flags = jnp.array([1, 1, 0], jnp.int32)

    def maxd(a, b):
        return float(jnp.abs(a - b).max())

    # Jacobi (strip seams at full size), incl. zero-init pressure path.
    alpha, beta = 0.5, 3.0
    ref = diffuse_ref(1, u, x0, alpha, beta, iters)
    d = maxd(po.fused_jacobi(1, u, x0, alpha, beta, iters), ref)
    check("diff jacobi compiled vs jnp", d < 1e-5, f"{d:.2e}")
    refp = psolve_ref(x0, iters)
    d = maxd(po.fused_jacobi(0, x0, x0, 1.0, 4.0, iters, zero_init=True), refp)
    check("diff pressure compiled vs jnp", d < 1e-5, f"{d:.2e}")

    # Divergence / gradient.
    d = maxd(po.divergence_p(u, v, n), div_ref(u, v, n))
    check("diff divergence compiled vs jnp", d == 0.0, f"{d:.2e}")
    ru, rv = apg_ref(u, v, x0, n)
    gu, gv = po.gradient_p(u, v, x0, n)
    d = max(maxd(gu, ru), maxd(gv, rv))
    check("diff gradient compiled vs jnp", d == 0.0, f"{d:.2e}")

    # Fused projection kernel vs unfused jnp composition.
    pu, pv = po.fused_project(u, v, n, iters)
    div = div_ref(u, v, n)
    p = psolve_ref(div, iters)
    ju, jv = apg_ref(u, v, p, n)
    d = max(maxd(pu, ju), maxd(pv, jv))
    check("diff fused projection compiled vs jnp", d < 1e-5, f"{d:.2e}")

    # Chebyshev sweeps (the perf-mode headline path): same kernels, w-
    # scheduled read-modify-write combine — compiled Mosaic lowering of
    # the scalar-carried fori recurrence.
    from fluidsimulationcuda_tpu.ops.chebyshev import (
        cheby_diffuse, cheby_pressure_solve,
    )

    refc = cheby_diffuse(1, u, x0, alpha, beta, 8, 0.99)
    d = maxd(po.fused_jacobi(1, u, x0, alpha, beta, 8, cheby_rho=0.99),
             refc)
    check("diff cheby jacobi compiled vs jnp", d < 1e-5, f"{d:.2e}")
    cu, cv = po.fused_project(u, v, n, 8, cheby_rho=0.99)
    pc = cheby_pressure_solve(div, 8, 0.99)
    cju, cjv = apg_ref(u, v, pc, n)
    d = max(maxd(cu, cju), maxd(cv, cjv))
    check("diff cheby fused projection compiled vs jnp", d < 1e-5,
          f"{d:.2e}")

    # Advection: random velocities exercise every masked-shift term and the
    # clamp boundaries; plus a constant-displacement sweep over the window.
    refa = advect_windowed(0, x0, u, v, dt, n, cmax)
    d = maxd(po.advect_shift(0, x0, u, v, dt, n, cmax=cmax), refa)
    check("diff advect (random vel) compiled vs jnp", d == 0.0, f"{d:.2e}")
    au, av = po.advect_shift_fused((1, 2), (u, v), u, v, dt, n, cmax=cmax,
                                   self_advect=True)
    d = max(maxd(au, advect_windowed(1, u, u, v, dt, n, cmax)),
            maxd(av, advect_windowed(2, v, u, v, dt, n, cmax)))
    check("diff advect pair compiled vs jnp", d == 0.0, f"{d:.2e}")
    dt0 = dt * n
    worst = 0.0
    for dx, dy in [(0.0, 4.4), (0.0, -4.4), (4.4, 0.0), (-4.4, 0.0),
                   (2.5, -1.5), (-2.5, 1.5), (16.0, 16.0), (0.7, 0.7)]:
        uc = jnp.full((side, side), np.float32(-dx / dt0))
        vc = jnp.full((side, side), np.float32(-dy / dt0))
        worst = max(worst, maxd(
            po.advect_shift(0, x0, uc, vc, dt, n, cmax=cmax),
            advect_windowed(0, x0, uc, vc, dt, n, cmax)))
    check("diff advect displacement sweep", worst == 0.0, f"{worst:.2e}")

    # Fused density step (diffuse_src -> advect in one kernel) vs the
    # two-kernel composition, random velocities, cmax=1 (the headline
    # auto-selected window) and cmax=2.
    for cm in (1, 2):
        alpha_d = 0.8
        beta_d = 1.0 + 4 * alpha_d
        dd = po.fused_jacobi(0, u, x0 + np.float32(dt) * u, alpha_d, beta_d,
                             iters)
        want = po.advect_shift(0, dd, u, v, dt, n, cmax=cm)
        got = po.fused_dens_advect(0, u, x0, u, v, alpha_d, beta_d, iters,
                                   dt, n, cmax=cm)
        d = maxd(got, want)
        check(f"diff fused dens step compiled vs composed (cmax={cm})",
              d < 1e-5, f"{d:.2e}")

    # chebyshev-dens path: the fused dens kernel with the w-scheduled
    # combine and a raw (non-zero) guess — the default perf mode's dens
    # solve, compiled.
    alpha_d = 0.8
    beta_d = 1.0 + 4 * alpha_d
    dd = po.fused_jacobi(0, u, x0 + np.float32(dt) * u, alpha_d, beta_d,
                         10, cheby_rho=0.99)
    want = po.advect_shift(0, dd, u, v, dt, n, cmax=1)
    got = po.fused_dens_advect(0, u, x0, u, v, alpha_d, beta_d, 10,
                               dt, n, cmax=1, cheby_rho=0.99)
    d = maxd(got, want)
    check("diff fused dens step cheby compiled vs composed", d < 1e-5,
          f"{d:.2e}")

    # Batched leading dim (datagen path).
    ub = jnp.stack([u, v, x0])
    x0b = jnp.stack([x0, u, v])
    refb = jnp.stack([diffuse_ref(0, ub[i], x0b[i], alpha, beta, 8)
                      for i in range(3)])
    d = maxd(po.fused_jacobi(0, ub, x0b, alpha, beta, 8), refb)
    check("diff batched jacobi compiled vs jnp", d < 1e-5, f"{d:.2e}")

    # fast_math mode: rhs pre-scaled — bounded drift, finite.
    f = po.fused_jacobi(1, u, x0, alpha, beta, iters, fast=True)
    d = maxd(f, ref)
    check("diff fast_math jacobi bounded", d < 1e-2 and bool(jnp.isfinite(f).all()),
          f"{d:.2e}")

    # Sharded slab kernels (1x1 mesh semantics, zero halos, wall flags).
    K = 24
    z24 = jnp.zeros((K, side), jnp.float32)
    h8 = jnp.zeros((8, side), jnp.float32)
    ext = lambda a: jnp.concatenate([z24, a, z24])
    d = maxd(ps.fused_jacobi_slab(1, ext(u), ext(x0), flags, m=m, K=K,
                                  alpha=alpha, beta=beta, sweeps=iters), ref)
    check("diff slab jacobi compiled vs jnp", d < 1e-5, f"{d:.2e}")
    d = maxd(ps.divergence_slab(u, v, h8, h8, flags, n), div)
    check("diff slab divergence compiled vs jnp", d == 0.0, f"{d:.2e}")
    su, sv = ps.gradient_slab(u, v, x0, h8, h8, flags, n)
    d = max(maxd(su, ru), maxd(sv, rv))
    check("diff slab gradient compiled vs jnp", d == 0.0, f"{d:.2e}")
    tm = ps.advect_slab_tm(m, side, 1)
    C = cmax + 1
    zc = jnp.zeros((C, side), jnp.float32)
    zp = jnp.zeros((tm - C, side), jnp.float32)
    de = jnp.concatenate([zp, zc, x0, zc, zp])
    (sa,) = ps.advect_slab((0,), (de,), u, v, flags, dt=dt, n=n, cmax=cmax,
                           m=m, self_adv=False)
    d = maxd(sa, refa)
    check("diff slab advect compiled vs jnp", d == 0.0, f"{d:.2e}")


def bf16_differential(n=254, iters=20):
    """bf16 storage mode, compiled on hardware: each kernel vs its f32
    twin on the same (bf16-rounded) inputs.  Sweeps/gathers run f32 in
    VMEM, so differences are bounded by output rounding (~4e-3 on O(1)
    data), NOT accumulated sweep error."""
    import jax.numpy as jnp

    from fluidsimulationcuda_tpu.kernels import pallas_ops as po
    from fluidsimulationcuda_tpu.ops.advect import advect_windowed

    side = n + 2
    rng = np.random.default_rng(3)

    def mk(s=1.0):
        a = rng.uniform(-1.0, 1.0, (side, side)).astype(np.float32) * s
        return jnp.asarray(a).astype(jnp.bfloat16)

    def maxd(a, b):
        return float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))

    x, x0, u, v = mk(), mk(), mk(1.5), mk(1.5)
    f32 = lambda t: t.astype(jnp.float32)
    dt = 0.08

    d = maxd(po.fused_jacobi(0, x, x0, 0.42, 2.68, iters),
             po.fused_jacobi(0, f32(x), f32(x0), 0.42, 2.68, iters))
    check("bf16 jacobi compiled vs f32 twin", d < 2e-2, f"{d:.2e}")

    # Reference: the jnp windowed op on the f32 UPCAST of the same
    # bf16-rounded inputs (XLA-TPU pathologically fails to compile the
    # 25-slice masked gather on bf16 directly; the values are identical
    # either way, so the kernel must match to one output rounding).
    got = po.advect_shift(0, x, u, v, dt, n, cmax=2)
    want = advect_windowed(0, f32(x), f32(u), f32(v), dt, n, 2)
    d = maxd(got, want)
    check("bf16 advect compiled vs jnp-f32 twin", d < 1e-2, f"{d:.2e}")

    uo, vo = po.fused_project(u, v, n, iters)
    uo32, vo32 = po.fused_project(f32(u), f32(v), n, iters)
    d = max(maxd(uo, uo32), maxd(vo, vo32))
    check("bf16 fused projection compiled vs f32 twin", d < 2e-2, f"{d:.2e}")

    dv = po.divergence_p(u, v, n)
    gu, gv = po.gradient_p(u, v, x, n)
    ok = all(bool(jnp.isfinite(t.astype(jnp.float32)).all())
             for t in (dv, gu, gv))
    check("bf16 divergence/gradient compiled finite", ok)

    au, av = po.advect_shift_fused((1, 2), (u, v), u, v, dt, n, cmax=2,
                                   self_advect=True)
    d = max(
        maxd(au, advect_windowed(1, f32(u), f32(u), f32(v), dt, n, 2)),
        maxd(av, advect_windowed(2, f32(v), f32(u), f32(v), dt, n, 2)),
    )
    check("bf16 advect pair compiled vs jnp-f32 twin", d < 1e-2, f"{d:.2e}")


def three_d_differential(side=128, iters=20, perf_budget_ms=15.0):
    """3-D Pallas kernels, compiled on hardware, vs the jnp 3-D ops.
    Regression guard for the out-of-bounds-window fault class (an OOB
    dynamic VMEM slice in advect3 crashed the chip in round 2 — interpret
    mode cannot catch those) plus the audited-window step perf point.
    Called at 128³ and (--full) 256³ — BASELINE config 5 as written."""
    import functools

    import jax.numpy as jnp

    from fluidsimulationcuda_tpu.kernels import pallas_ops_3d as k3
    from fluidsimulationcuda_tpu.models.stable_fluids_3d import (
        make_step_fn_3d, step_audited3,
    )
    from fluidsimulationcuda_tpu.ops import three_d as o3

    n = side - 2
    rng = np.random.default_rng(5)

    def mk(s=1.0):
        return jnp.asarray(
            rng.uniform(-1.0, 1.0, (side, side, side)).astype(np.float32) * s
        )

    def maxd(a, b):
        return float(jnp.max(jnp.abs(a - b)))

    x, x0, u, v, w = mk(), mk(), mk(0.5), mk(0.5), mk(0.5)

    got = o3.set_bnd3(0, k3.fused_jacobi3(0, x, x0, 0.3, 2.8, iters))
    d = maxd(got, o3.diffuse3(0, x, x0, 0.3, 2.8, iters))
    check(f"diff 3-D jacobi compiled vs jnp @{side}", d < 1e-5, f"{d:.2e}")

    got = o3.set_bnd3(0, k3.advect3_shift(0, x, u, v, w, 0.05, n, cmax=2))
    d = maxd(got, o3.advect3_windowed(0, x, u, v, w, 0.05, n, 2))
    check(f"diff 3-D advect compiled vs jnp @{side} (incl. wall strips)",
          d < 1e-5, f"{d:.2e}")

    dv = o3.set_bnd3(0, k3.divergence3_p(u, v, w, n))
    d = maxd(dv, o3.divergence3(u, v, w, n))
    check(f"diff 3-D divergence compiled vs jnp @{side}", d < 1e-5, f"{d:.2e}")

    # Chebyshev chain across HBM round-trips (perf mode): the cross-call
    # x_{k-1} carry is exactly the kind of multi-output DMA pipeline that
    # only compiled Mosaic can mis-lower.
    from fluidsimulationcuda_tpu.ops.chebyshev import cheby_pressure_solve3

    got = o3.set_bnd3(0, k3.fused_jacobi3(0, x0, x0, 1.0, 6.0, 8,
                                          zero_init=True, cheby_rho=0.99))
    d = maxd(got, cheby_pressure_solve3(x0, 8, 0.99))
    check(f"diff 3-D cheby chain compiled vs jnp @{side}", d < 1e-5,
          f"{d:.2e}")

    # Audited step perf: the trajectory displacement is ~0.03 cells, so the
    # cubic-cost gather runs its smallest window, provably exact.
    cfg = SimConfig(n=n, jacobi_iters=iters, ndim=3, backend="pallas",
                    max_courant=1)
    state, sources = reference_init(jax.random.key(0), cfg)
    zeros = zero_sources(cfg)
    aud = jax.jit(functools.partial(step_audited3, cfg))
    s0, disp = aud(state, sources)
    check("3-D audited displacement in window",
          float(disp) < cfg.max_courant, f"{float(disp):.3f} < 1")
    f = make_step_fn_3d(cfg)
    x1 = f(s0, zeros)
    _ = float(x1.dens.ravel()[0])

    def run(k):
        x = x1
        t0 = time.perf_counter()
        for _ in range(k):
            x = f(x, zeros)
        _ = float(x.dens.ravel()[0])
        return time.perf_counter() - t0

    t1 = min(run(4) for _ in range(2))
    t2 = min(run(20) for _ in range(2))
    ms = (t2 - t1) / 16 * 1e3
    check(f"perf 3-D {side}^3/{iters}it audited window", ms < perf_budget_ms,
          f"{ms:.2f} ms/step (budget {perf_budget_ms})")


def perf_point(n, iters, cmax, expect_ms, steps=100):
    cfg = SimConfig(n=n, jacobi_iters=iters, backend="pallas",
                    max_courant=cmax)
    state, sources = reference_init(jax.random.key(0), cfg)
    step = make_step_fn(cfg)
    zeros = zero_sources(cfg)
    s = step(state, sources)
    _ = float(s.dens.ravel()[0])

    def run(k):
        x = s
        t0 = time.perf_counter()
        for _ in range(k):
            x = step(x, zeros)
        _ = float(x.dens.ravel()[0])
        return time.perf_counter() - t0

    short = max(2, steps // 5)
    t1 = min(run(short) for _ in range(2))
    t2 = min(run(steps) for _ in range(2))
    ms = (t2 - t1) / (steps - short) * 1e3
    check(f"perf {n + 2}^2/{iters}it", ms < expect_ms,
          f"{ms:.2f} ms/step (budget {expect_ms})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "run on a TPU"
    parity_100_steps()
    compiled_differential()
    bf16_differential()
    perf_point(2046, 20, 2, expect_ms=6.0)
    if args.full:
        three_d_differential()
        three_d_differential(side=256, iters=20, perf_budget_ms=110.0)
        perf_point(8190, 40, 2, expect_ms=200.0, steps=15)
        from fluidsimulationcuda_tpu.models.batched import generate_trajectories

        cfg = SimConfig(n=254, jacobi_iters=20, max_courant=2)
        # Warm with the SAME step count: the scan length is baked into the
        # compiled program, so a different warm length would leave the real
        # compile inside the timed region.
        generate_trajectories(jax.random.key(0), cfg, 64, 20)
        t0 = time.perf_counter()
        final, _, dmax = generate_trajectories(jax.random.key(1), cfg, 64, 20)
        _ = float(final.dens.ravel()[0])
        dt = time.perf_counter() - t0
        rate = 64 * 254 * 254 * 20 / dt / 1e6
        check("datagen 64x256^2x20", dt < 5.0, f"{dt:.2f}s ({rate:.0f} Mcell/s)")
        check("datagen audited exact", float(dmax) < cfg.max_courant,
              f"max disp {float(dmax):.3f} < {cfg.max_courant}")

    print(f"\n{len(FAILURES)} failure(s)")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
