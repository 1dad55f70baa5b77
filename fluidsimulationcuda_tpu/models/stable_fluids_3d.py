"""Stable Fluids 3-D — smoke volumes (BASELINE config 5).

Same step composition as the 2-D flagship (``FluidSequential.c:176-241``)
lifted to three dimensions: three velocity components, 6-neighbor Jacobi
solves, trilinear advection gather.  jnp/XLA backend (Pallas 3-D kernels are
a later optimization; XLA handles the volumetric stencils reasonably since
the lane dimension stays contiguous).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax

from ..core.config import SimConfig
from ..core.state import FluidState, Sources, zero_sources
from ..ops.source import add_source
from ..ops import three_d as o3

__all__ = ["vel_step3", "dens_step3", "step3", "make_step_fn_3d", "StableFluids3D"]


def _advect3(cfg: SimConfig):
    """Gather strategy: exact XLA gather off-TPU; masked-shift window on TPU
    (XLA TPU gathers lower serially — see kernels/pallas_ops.py)."""
    import jax

    if jax.default_backend() == "tpu":
        def f(b, d0, u, v, w):
            return o3.advect3_windowed(b, d0, u, v, w, cfg.dt, cfg.n,
                                       cmax=cfg.max_courant)
        return f

    def f(b, d0, u, v, w):
        return o3.advect3(b, d0, u, v, w, cfg.dt, cfg.n)

    return f


def vel_step3(cfg: SimConfig, u, v, w, u_src, v_src, w_src):
    u = add_source(u, u_src, cfg.dt)
    v = add_source(v, v_src, cfg.dt)
    w = add_source(w, w_src, cfg.dt)
    alpha = cfg.diffusion_alpha_visc
    beta = 1.0 + 6.0 * alpha
    it = cfg.jacobi_iters
    u = o3.diffuse3(1, u_src, u, alpha, beta, it)
    v = o3.diffuse3(2, v_src, v, alpha, beta, it)
    w = o3.diffuse3(3, w_src, w, alpha, beta, it)
    u, v, w = o3.project3(u, v, w, cfg.n, it)
    adv = _advect3(cfg)
    u0, v0, w0 = u, v, w
    u = adv(1, u0, u0, v0, w0)
    v = adv(2, v0, u0, v0, w0)
    w = adv(3, w0, u0, v0, w0)
    return o3.project3(u, v, w, cfg.n, it)


def dens_step3(cfg: SimConfig, dens, dens_src, u, v, w):
    dens = add_source(dens, dens_src, cfg.dt)
    alpha = cfg.diffusion_alpha_diff
    beta = 1.0 + 6.0 * alpha
    dens = o3.diffuse3(0, dens_src, dens, alpha, beta, cfg.jacobi_iters)
    return _advect3(cfg)(0, dens, u, v, w)


def step3(cfg: SimConfig, state: FluidState, sources: Sources) -> FluidState:
    u, v, w = vel_step3(
        cfg, state.u, state.v, state.w, sources.u, sources.v, sources.w
    )
    dens = dens_step3(cfg, state.dens, sources.dens, u, v, w)
    return FluidState(dens=dens, u=u, v=v, w=w)


def make_step_fn_3d(cfg: SimConfig) -> Callable:
    if cfg.ndim != 3:
        raise ValueError("make_step_fn_3d requires ndim == 3")
    return jax.jit(functools.partial(step3, cfg))


class StableFluids3D:
    def __init__(self, cfg: SimConfig):
        if cfg.ndim != 3:
            raise ValueError("StableFluids3D requires ndim == 3")
        self.cfg = cfg
        self._step = make_step_fn_3d(cfg)

    def step(self, state: FluidState, sources: Sources | None = None):
        if sources is None:
            sources = zero_sources(self.cfg)
        return self._step(state, sources)
