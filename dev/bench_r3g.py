"""Round-3g: empirical roofline anchors at 2048² + step composition.

Measures (slope method, relay-immune):
  1. achieved HBM copy bandwidth (read 1 + write 1 field) — the
     streaming-kernel speed-of-light anchor;
  2. saxpy (read 2 + write 1) bandwidth;
  3. the fused 20-sweep Jacobi solve (per-sweep VMEM rate);
  4. each step phase as composed by the headline config;
  5. the full parity step and the full multigrid perf-mode step.

These feed docs/PERFORMANCE.md's roofline section: bytes moved per step
vs the measured bandwidths -> implied parity ceiling.
"""
import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu import (  # noqa: E402
    SimConfig, make_step_fn, reference_init, zero_sources)
from fluidsimulationcuda_tpu.kernels import pallas_ops as po  # noqa: E402
from fluidsimulationcuda_tpu.kernels.dispatch import get_ops  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0])


def slope(name, op, init, k1=4, k2=24, reps=3, mb=None):
    try:
        def make(k):
            @jax.jit
            def f():
                def body(c, _):
                    out = op(c)
                    return out, None
                out, _ = jax.lax.scan(body, init, None, length=k)
                return out
            return f

        f1, f2 = make(k1), make(k2)

        def tmin(f):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = f()
                sync(jax.tree.leaves(out)[0])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        tmin(f1)
        tmin(f2)
        dt = (tmin(f2) - tmin(f1)) / (k2 - k1) * 1e3
        bw = f"  {mb / dt:8.1f} GB/s" if mb else ""
        print(f"{name:52s} {dt:8.3f} ms{bw}", flush=True)
        return dt
    except Exception as e:
        print(f"{name:52s} FAILED {str(e)[:120]}", flush=True)
        return None


def main():
    print(f"devices={jax.devices()}", flush=True)
    side = 2048
    n = side - 2
    fmb = side * side * 4 / 1e6  # one field, MB

    key = jax.random.key(0)
    a = jax.random.normal(key, (side, side), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (side, side), jnp.float32)

    # 1-2: streaming anchors.  scan-carry copy: read 1 + write 1.
    slope("copy (r1+w1)", lambda x: x + 1.0, a, mb=2 * fmb)
    slope("saxpy (r2+w1)", lambda x: x * 1.5 + b, a, mb=3 * fmb)
    slope("5pt stencil (r1+w1 hbm)",
          lambda x: 4.0 * x - (jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
                               + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)),
          a, mb=2 * fmb)

    cfg = SimConfig(n=n, jacobi_iters=20, backend="pallas", max_courant=1)
    ops = get_ops(cfg)
    al = cfg.diffusion_alpha_visc
    be = 1.0 + 4.0 * al

    # 3: fused solve families.  The 40-vs-20 marginal is the pure in-VMEM
    # per-sweep rate (same strips, same DMA — only extra sweeps), i.e. the
    # empirical VPU/VMEM speed of the sweep itself.
    t20 = slope("fused jacobi 20 sweeps (diffuse_src)",
                lambda x: ops.diffuse_src(1, x, x, al, be, 20, cfg.dt), a)
    t40 = slope("fused jacobi 40 sweeps (diffuse_src)",
                lambda x: ops.diffuse_src(1, x, x, al, be, 40, cfg.dt), a)
    if t20 and t40:
        print(f"{'  -> marginal in-VMEM sweep':52s} "
              f"{(t40 - t20) / 20 * 1e3:8.3f} us/sweep", flush=True)
    slope("fused projection (div+20sw+grad)",
          lambda uv: ops.project(uv[0], uv[1], n, 20)[0], (a, b))
    slope("pair advect C=1",
          lambda uv: ops.advect_pair(1, 2, uv[0], uv[1], uv[0], uv[1],
                                     cfg.dt, n)[0], (a, b))
    # the fused advect+projection capability is no longer an OpSet hook
    # (measured slower; kernels/pallas_step.py) — probe it directly
    from fluidsimulationcuda_tpu.kernels import pallas_step as _ps

    if _ps.advect_project_supported(n + 2, 20, cfg.max_courant):
        slope("fused advect+projection (pair adv+div+20sw+grad)",
              lambda uv: _ps.fused_advect_project(
                  uv[0], uv[1], n, 20, cfg.dt, cmax=cfg.max_courant)[0],
              (a, b))
    if ops.diffuse_advect is not None:
        slope("fused dens pair (src+20sw diffuse+advect)",
              lambda d: ops.diffuse_advect(0, d, d, a, b, al, be, 20,
                                           cfg.dt, n), a)

    # 5: whole steps
    state, srcs = reference_init(key, cfg)
    zs = zero_sources(cfg)
    for label, c in [
        ("parity step (jacobi20, cmax=1)", cfg),
        ("perf step (multigrid+fast_math)",
         dataclasses.replace(cfg, pressure_solver="multigrid",
                             fast_math=True)),
        ("perf step (mg only, no fast_math)",
         dataclasses.replace(cfg, pressure_solver="multigrid")),
        ("cg step (cg_iters default)",
         dataclasses.replace(cfg, pressure_solver="cg")),
    ]:
        fn = make_step_fn(c)
        slope(label, lambda s, fn=fn: fn(s, zs), state, k1=3, k2=13)


if __name__ == "__main__":
    main()
