"""Warm-start pressure experiment at 2048^2 on TPU (jnp ops).

Parity step recomposed with a parameterized projection; pressure guesses
(two per step: pre-advect and post-advect solves) carried across steps.
Metric: max post-projection |div| over 12 steps, vs cold Jacobi-20.
"""
import dataclasses, functools, sys
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from fluidsimulationcuda_tpu import SimConfig, zero_sources
from fluidsimulationcuda_tpu.ops.project import divergence, apply_pressure_gradient
from fluidsimulationcuda_tpu.ops.diffuse import diffuse
from fluidsimulationcuda_tpu.ops.advect import advect as advect_fn
from fluidsimulationcuda_tpu.ops.source import add_source
import bench

n = 2046
cfg = SimConfig(n=n, jacobi_iters=20, backend="reference", max_courant=1)
state, _ = bench.inject_exact(cfg)

al_v = cfg.diffusion_alpha_visc
be_v = 1.0 + 4.0 * al_v
al_d = cfg.diffusion_alpha_diff
be_d = 1.0 + 4.0 * al_d

def make_step(iters, warm):
    def proj(u, v, p_guess):
        d = divergence(u, v, n)
        g = p_guess if warm else jnp.zeros_like(d)
        p = diffuse(0, g, d, 1.0, 4.0, iters)
        u, v = apply_pressure_gradient(u, v, p, n)
        return u, v, p
    @jax.jit
    def step(carry):
        st, p1, p2 = carry
        u = diffuse(1, st.u, st.u, al_v, be_v, 20)
        v = diffuse(2, st.v, st.v, al_v, be_v, 20)
        u, v, p1 = proj(u, v, p1)
        u0, v0 = u, v
        u = advect_fn(1, u0, u0, v0, cfg.dt, n)
        v = advect_fn(2, v0, u0, v0, cfg.dt, n)
        u, v, p2 = proj(u, v, p2)
        dens = diffuse(0, st.dens, st.dens, al_d, be_d, 20)
        dens = advect_fn(0, dens, u, v, cfg.dt, n)
        return (type(st)(dens=dens, u=u, v=v), p1, p2)
    return step

@jax.jit
def dmax(st):
    return jnp.max(jnp.abs(divergence(st.u, st.v, n)))

z = jnp.zeros_like(state.dens)
for label, iters, warm in [("cold-20 (parity)", 20, False),
                           ("warm-4", 4, True),
                           ("warm-6", 6, True),
                           ("warm-8", 8, True),
                           ("warm-12", 12, True),
                           ("cold-8", 8, False)]:
    stepf = make_step(iters, warm)
    carry = (state, z, z)
    worst = 0.0
    for _ in range(12):
        carry = stepf(carry)
        worst = max(worst, float(dmax(carry[0])))
    print(f"{label:20s} max|div| {worst:.3e}", flush=True)
