"""Backend dispatch.

The reference maintains five whole *source-tree families* (sequential,
SIMD-SSE, naivePar, smPar, optPar) that all implement the same five ops; here
backends are one enum on ``SimConfig`` and every op is selected per-call:

- ``reference``: pure jnp/XLA ops — numerics oracle, runs anywhere.
- ``pallas``: fused Mosaic TPU kernels (VMEM halo tiling, multi-sweep Jacobi
  fusion) — the performance path.
- ``auto``: pallas on TPU when shapes qualify, reference otherwise.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax

from ..core.config import SimConfig
from ..ops.advect import advect as _advect_ref
from ..ops.chebyshev import cheby_diffuse as _cheby_diffuse_ref
from ..ops.chebyshev import cheby_pressure_solve as _cheby_pressure_ref
from ..ops.diffuse import diffuse as _diffuse_jnp
from ..ops.project import (
    apply_pressure_gradient as _apg_ref,
    divergence as _divergence_ref,
    pressure_solve as _pressure_jnp,
)


def _diffuse_ref(b, x_init, x0, alpha, beta, iters, cheby_rho=None):
    if cheby_rho is not None:
        return _cheby_diffuse_ref(b, x_init, x0, alpha, beta, iters,
                                  cheby_rho)
    return _diffuse_jnp(b, x_init, x0, alpha, beta, iters)


def _pressure_ref(div, iters, cheby_rho=None):
    if cheby_rho is not None:
        return _cheby_pressure_ref(div, iters, cheby_rho)
    return _pressure_jnp(div, iters)


class OpSet(NamedTuple):
    """The five-op compute surface (reference §2.2) plus a fused pair
    advection (same velocity, shared backtrace) for the u/v self-advection."""

    diffuse: Callable
    advect: Callable
    divergence: Callable
    pressure_solve: Callable
    apply_pressure_gradient: Callable
    advect_pair: Callable
    project: Callable
    diffuse_src: Callable
    # Optional cross-op fusion: the whole density pair
    # diffuse_src -> advect (``FluidSequential.c:176-186``) in one kernel.
    # None = compose the two ops (reference backend, unsupported shapes).
    diffuse_advect: Callable | None = None
    # NOTE: there is deliberately NO advect_project hook.  A fused
    # self-advect + second-projection kernel exists
    # (kernels/pallas_step.fused_advect_project,
    # ``FluidSequential.c:232-240`` in one kernel) but measured SLOWER
    # than the advect_pair + project composition (0.98 vs 0.82 ms at
    # 2048²/20it/cmax=1) — kept as a tested, documented capability only.


def _advect_pair_ref(b1, b2, d1, d2, u, v, dt, n):
    return _advect_ref(b1, d1, u, v, dt, n), _advect_ref(b2, d2, u, v, dt, n)


def _project_ref_op(u, v, n, iters, cheby_rho=None):
    div = _divergence_ref(u, v, n)
    p = _pressure_ref(div, iters, cheby_rho=cheby_rho)
    return _apg_ref(u, v, p, n)


def _diffuse_src_ref(b, src, base, alpha, beta, iters, dt, cheby_rho=None):
    import jax.numpy as jnp

    rhs = base + jnp.asarray(dt, base.dtype) * src
    return _diffuse_ref(b, src, rhs, alpha, beta, iters,
                        cheby_rho=cheby_rho)


_REFERENCE_OPS = OpSet(
    diffuse=_diffuse_ref,
    advect=_advect_ref,
    divergence=_divergence_ref,
    pressure_solve=_pressure_ref,
    apply_pressure_gradient=_apg_ref,
    advect_pair=_advect_pair_ref,
    project=_project_ref_op,
    diffuse_src=_diffuse_src_ref,
)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - defensive
        return False


def _pallas_supported(cfg: SimConfig) -> bool:
    from . import pallas_ops

    return pallas_ops.supports(cfg)


_WARNED_DECLINED: set = set()


def get_ops(cfg: SimConfig) -> OpSet:
    backend = cfg.backend
    if backend == "auto":
        on_tpu = _on_tpu()
        ok = on_tpu and _pallas_supported(cfg)
        if on_tpu and not ok and (cfg.n, cfg.ndim) not in _WARNED_DECLINED:
            # The jnp path is ~80x slower on TPU; a silent fallback at the
            # headline backend would misread as a perf regression.
            import warnings

            _WARNED_DECLINED.add((cfg.n, cfg.ndim))
            warnings.warn(
                f"backend='auto' on TPU fell back to the reference (jnp) ops "
                f"for side={cfg.n + 2}, ndim={cfg.ndim}, dtype={cfg.dtype}: "
                f"the pallas kernels need ndim=2, float32, side >= 128 and "
                f"side % 8 == 0 (pick n = multiple-of-8 minus 2). Expect "
                f"~80x lower throughput on this path.",
                stacklevel=2,
            )
        backend = "pallas" if ok else "reference"
    if backend == "reference":
        mode = cfg.advect_mode
        if mode == "auto":
            mode = "windowed" if _on_tpu() else "exact"
        if mode == "windowed":
            from ..ops.advect import advect_windowed

            def adv(b, d0, u, v, dt, n):
                return advect_windowed(b, d0, u, v, dt, n, cfg.max_courant)

            def adv_pair(b1, b2, d1, d2, u, v, dt, n):
                return adv(b1, d1, u, v, dt, n), adv(b2, d2, u, v, dt, n)

            return _REFERENCE_OPS._replace(advect=adv, advect_pair=adv_pair)
        return _REFERENCE_OPS
    if backend == "pallas":
        from . import pallas_ops  # deferred: requires TPU-capable lowering

        return pallas_ops.make_opset(cfg)
    raise ValueError(f"unknown backend {backend!r}")
