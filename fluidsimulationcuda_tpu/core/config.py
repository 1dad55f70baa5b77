"""Simulation configuration.

The reference scatters configuration across three tiers: compile-time macros
(``N/DT/VIS/DIFF``, ``project/sequential/FluidSequential.c:6-10``), CLI block
dims (``project/naivePar/FluidParallelBlockPerElement-Naive.cu:345-359``), and
a device-side ``__constant__`` mirror uploaded via ``cudaMemcpyToSymbol``
(``...:11-14,386-389``).  On TPU all of that collapses into one frozen
dataclass passed as a static argument to ``jax.jit`` — the compiled HLO *is*
the constant-folded configuration.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp

__all__ = ["SimConfig"]


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Frozen, hashable simulation configuration (static under ``jax.jit``).

    Attributes:
      n: number of *interior* cells per side (reference ``N``,
        ``FluidSequential.c:6``).  The allocated grid is ``(n+2, n+2)`` —
        one ghost cell per side.
      dt: timestep (reference ``DT=0.016``, ``FluidSequential.c:7``).
      visc: velocity diffusion (viscosity) coefficient (``VIS=0.0025``).
      diff: density diffusion coefficient (``DIFF=0.1``).
      jacobi_iters: Jacobi sweeps per diffusion / pressure solve.  The
        reference hard-codes 40 (``FluidSequential.c:91``); BASELINE.json's
        headline metric uses 20, so it is a first-class parameter here and
        every reported number states it.
      dtype: element type of the state grids.  The reference is float32
        throughout (``document/main.tex:345-350``); bfloat16 is supported as
        a STORAGE format (halves HBM footprint and snapshot IO; kernels
        still compute f32 in VMEM, so throughput is unchanged on the
        f32-native VPU — measured in docs/PERFORMANCE.md).  Non-parity:
        fields round to bf16 at every HBM round-trip.  Requires
        ``(n+2) %% 16 == 0`` on the pallas backend.
      backend: which compute path executes the hot ops —
        ``"reference"``: pure jnp/XLA ops (the differential-testing oracle
        for the kernels), ``"pallas"``: fused Pallas TPU kernels,
        ``"auto"``: pallas on TPU, reference elsewhere.
      fuse_sweeps: how many Jacobi sweeps the Pallas kernel performs per
        HBM round-trip (halo depth of the VMEM tiles).  0 = auto-tune from
        ``n`` and ``jacobi_iters``.
      pressure_solver: "jacobi" (reference-parity, ``jacobi_iters`` sweeps),
        "multigrid" (``mg_cycles`` V-cycles — the reference's own stated
        future work, ``document/main.tex:356``; mesh-independent convergence,
        non-parity numerics; requires even interior sizes for coarsening),
        or "cg" (conjugate gradient, the other named future-work solver:
        ``cg_iters`` iterations, O(n) convergence, non-parity numerics),
        or "chebyshev" (``cheby_iters`` Chebyshev-accelerated Jacobi
        sweeps, ``ops/chebyshev.py`` — same stencil and boundary handling
        as parity Jacobi but half the sweeps at better residual, measured;
        non-parity numerics).
      diffusion_solver: "jacobi" (reference-parity), "chebyshev"
        (``cheby_iters`` accelerated sweeps for the three diffusion
        solves; validated by per-solve residual <= the Jacobi-20 solve's,
        see bench.py's perf-mode line), or "chebyshev-dens" (accelerated
        sweeps for the DENSITY solve only — the velocity trajectory stays
        bit-identical to parity, so unlike the full swap the divergence
        bar is untouched by construction and only the density-solve
        residual bar applies; ``dev/bench_r3p_denscheby.py``).  Measured
        operating points for the full swap (it must be COMPENSATED by a
        chebyshev pressure solve, see ``cheby_press_iters``): 2-D
        (rho=0.9, k_d=10, k_p=14) — bench.py's default perf mode; 3-D
        (rho=0.85, k_d=10, k_p=12).  The 2-D point FAILS the 3-D
        velocity residual bar, rho/k_d are brittle
        (``dev/bench_r3s_3dcomp.py``), and k_p is size-coupled — k_p=8
        passes every bar at 128³ yet fails the 256³ divergence bar by
        5% (``dev/bench_r3s2_3dcomp_256.py``) — so use the measured
        points, not intuition.
      mg_cycles: V-cycles per pressure solve in multigrid mode.
      cg_iters: CG iterations per pressure solve in cg mode.
      cheby_iters: sweeps per solve in chebyshev modes.  Default 8:
        the fewest sweeps that pass the perf-mode divergence bar with
        margin on BOTH the decay and continuous-forcing trajectories
        (decay 0.73x bar, forcing 0.69x; k=6 passes at 0.85x, k=4
        fails — ``dev/bench_r3m_cheby.py`` / bench.py validates live).
      cheby_press_iters: pressure-solve sweep count in "chebyshev"
        pressure mode; 0 (default) follows ``cheby_iters``.  Decoupling
        exists so the pressure solve can COMPENSATE a diffusion-solver
        swap: the velocity-diffusion swap injects mid-frequency content
        that fails the divergence bar at equal sweeps (the adversarial
        frontier, ``dev/bench_r3n_frontier.py``), but extra pressure
        sweeps remove exactly that content — see
        ``dev/bench_r3q_compensated.py`` for the measured joint frontier.
      cheby_rho: Chebyshev interval parameter — a free tuning knob, NOT a
        stability bound (|P_k| <= 1 on [-1, 1] for any value in (0, 1);
        ``ops/chebyshev.py``).  0.99 measured best-or-near across all five
        solves at 2048².
      cheby_dens_iters: sweeps for the density solve in "chebyshev-dens"
        mode.  Default 10: passes the density residual bar at 0.77x on the
        continuous-forcing trajectory (k=8 passes at 0.97x — no margin;
        ``dev/bench_r3p_denscheby.py``).  The full "chebyshev" mode keeps
        ``cheby_iters`` for all solves.
      fast_math: Pallas Jacobi rewrites ``(rhs + a*neigh)/beta`` as
        ``rhs/beta + (a/beta)*neigh`` (reciprocal precomputed once per
        solve): ~15-20%% fewer VPU ops, numerics differ by ~1 ulp/sweep from
        the reference expression (off by default to keep oracle parity).
      advect_mode: gather strategy for the reference (jnp) backend —
        "exact" uses the XLA gather (arbitrary displacement; serialized and
        slow on TPU), "windowed" uses the masked-shift window (TPU-fast,
        vmappable; clamped to ``max_courant`` cells).  "auto": exact off-TPU,
        windowed on TPU.  The pallas backend is always windowed.
      max_courant: Pallas advection gathers from a VMEM window of
        ``max_courant`` cells around each output cell; exact while the
        backtrace displacement ``|dt*n*velocity|`` stays below
        ``max_courant`` cells (proof + boundary test:
        ``ops/advect.py:advect_windowed``), clamped to the window
        otherwise.  Cost grows quadratically with the window.
      ndim: spatial dimensionality (2 for the reference solver, 3 for the
        smoke-volume extension).
    """

    n: int = 126
    dt: float = 0.016
    visc: float = 0.0025
    diff: float = 0.1
    jacobi_iters: int = 20
    dtype: jnp.dtype = jnp.float32
    backend: str = "auto"
    fuse_sweeps: int = 0
    max_courant: int = 4
    pressure_solver: str = "jacobi"
    diffusion_solver: str = "jacobi"
    mg_cycles: int = 2
    cg_iters: int = 20
    cheby_iters: int = 8
    cheby_press_iters: int = 0
    cheby_rho: float = 0.99
    cheby_dens_iters: int = 10
    advect_mode: str = "auto"
    fast_math: bool = False
    ndim: int = 2

    def __post_init__(self):
        if self.n < 2:
            raise ValueError(f"n must be >= 2, got {self.n}")
        if self.jacobi_iters < 1:
            raise ValueError("jacobi_iters must be >= 1")
        if self.backend not in ("reference", "pallas", "auto"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.pressure_solver not in ("jacobi", "multigrid", "cg",
                                        "chebyshev"):
            raise ValueError(f"unknown pressure_solver {self.pressure_solver!r}")
        if self.diffusion_solver not in ("jacobi", "chebyshev",
                                         "chebyshev-dens"):
            raise ValueError(
                f"unknown diffusion_solver {self.diffusion_solver!r}")
        if not (0.0 < self.cheby_rho < 1.0):
            raise ValueError("cheby_rho must be in (0, 1)")
        if self.cheby_iters < 2:
            raise ValueError("cheby_iters must be >= 2")
        if self.cheby_press_iters and self.cheby_press_iters < 2:
            raise ValueError("cheby_press_iters must be 0 (follow "
                             "cheby_iters) or >= 2")
        if self.cheby_dens_iters < 2:
            raise ValueError("cheby_dens_iters must be >= 2")
        if self.advect_mode not in ("auto", "exact", "windowed"):
            raise ValueError(f"unknown advect_mode {self.advect_mode!r}")
        if self.ndim not in (2, 3):
            raise ValueError("ndim must be 2 or 3")
        if self.ndim == 3 and self.pressure_solver not in ("jacobi",
                                                           "chebyshev"):
            # Silently ignoring the knob would misreport the numerics
            # actually run.
            raise ValueError(
                "pressure_solver='multigrid'/'cg' are 2-D solvers; "
                "ndim=3 supports 'jacobi' and 'chebyshev'"
            )
        if (self.ndim == 3 and self.diffusion_solver == "chebyshev"
                and self.pressure_solver != "chebyshev"):
            # The VELOCITY diffusion swap validates (2-D and 3-D) only
            # with pressure compensation: the swap's extra mid-frequency
            # divergence must be absorbed by a raised Chebyshev pressure
            # sweep count (``cheby_press_iters``; PERFORMANCE.md finding
            # 15 + the compensated rows; 3-D point measured in
            # ``dev/bench_r3s_3dcomp.py``).  An uncompensated 3-D swap
            # (jacobi/mg/cg pressure) has no validated operating point,
            # so it stays gated off rather than silently mis-reporting
            # the numerics actually run.
            raise ValueError(
                "ndim=3 diffusion_solver='chebyshev' requires "
                "pressure_solver='chebyshev' (the compensated mode); "
                "uncompensated 3-D swaps have no validated operating point"
            )

    @property
    def grid_shape(self) -> Tuple[int, ...]:
        """Full padded grid shape, ghost border included."""
        return (self.n + 2,) * self.ndim

    @property
    def press_cheby_iters(self) -> int:
        """Effective pressure-solve sweep count in chebyshev mode."""
        return self.cheby_press_iters or self.cheby_iters

    @property
    def num_cells(self) -> int:
        c = 1
        for s in self.grid_shape:
            c *= s
        return c

    @property
    def diffusion_alpha_visc(self) -> float:
        """alpha for velocity diffusion (``FluidSequential.c:199``)."""
        return self.dt * self.visc * self.n * self.n

    @property
    def diffusion_alpha_diff(self) -> float:
        """alpha for density diffusion (``FluidSequential.c:179``)."""
        return self.dt * self.diff * self.n * self.n

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


# Validated compensated perf-mode operating points, keyed by full grid
# side (n + 2).  (rho, k_d diffusion sweeps, k_p pressure sweeps) — these
# are MEASURED, size-coupled points, not defaults:
#
# - 2-D 2048²/20it: probed in dev/bench_r3q_compensated.py; all three
#   bars pass (div 0.44x, forced v-res 0.304, dens 0.913).
# - 2-D 8192²/40it: re-probed in round 4 (dev/bench_r4a_frontier8k.py +
#   the forced-twin probes) — the 2048² point FAILS the forced
#   velocity-residual bar there (1.029); (0.96, 12, 14) passes all bars
#   (div 0.990x, v-res 0.998).
# - 3-D 256³/20it: dev/bench_r3s_3dcomp.py — rho=0.9 fails 3-D, 0.85
#   passes with k_p=12.
#
# Unprobed sides fall back to the nearest probed point; both bench.py and
# ``run --perf`` consult THIS table (single source of truth) and both can
# run the live bars at the requested size to catch a failed transfer.
PERF_POINTS_2D = {2048: (0.9, 10, 14), 8192: (0.96, 12, 14)}
PERF_POINT_3D = (0.85, 10, 12)


def perf_operating_point(side: int, ndim: int = 2):
    """(cheby_rho, cheby_iters, cheby_press_iters) for the compensated
    perf preset at full grid ``side`` = n + 2.  Size-coupled and measured
    — see the table above for provenance."""
    if ndim == 3:
        return PERF_POINT_3D
    if side in PERF_POINTS_2D:
        return PERF_POINTS_2D[side]
    # Unprobed side: snap to the nearest probed anchor (log-distance, so
    # 4096² uses the 2048² point).  The live bars exist precisely to
    # catch a failed transfer at such sizes — callers should run them.
    nearest = min(PERF_POINTS_2D,
                  key=lambda s: abs(math.log(s) - math.log(max(side, 1))))
    return PERF_POINTS_2D[nearest]
