"""Fused Pallas TPU kernels for the 3-D solver (smoke volumes).

Layout: volumes are (side, side, side) float32, index [z, y, x] — (y, x) are
the TPU (sublane, lane) dims, z is the leading dim.  Kernels tile over
*z-plane strips*: every window holds full (y, x) planes, so the x/y ghost
faces live inside each window and are re-derived per sweep (the 3-D
generalization of the 2-D kernels' full-width row strips,
``pallas_ops.py``); only z needs halo margins.  The leading dim has no
Mosaic alignment constraints, so z windows use exact ``sweeps+1`` margins
and dynamic plane indexing — no 8-alignment gymnastics.

Spec: ``ops/three_d.py`` (the jnp oracle; itself the Stam generalization of
``FluidSequential.c:85-141``).  Kernels compute interiors + the faces each
sweep needs; callers re-derive the full ghost layer (faces/edges/corners)
with ``ops.three_d.set_bnd3``, so outputs match the jnp ops exactly.

Advection: the 2-D masked-shift gather generalized per output plane — the
(2C+1) z-shift candidates loop OUTSIDE, each running the 2-D (2C+1)^2
masked-shift gather on its plane pair with the combined mask
``(dk == dz) & (key_xy == t)``.  Note the tempting "select the plane pair
first, then xy-shift it" factorization is WRONG: shifting a z-selected
plane reads positions whose z-choice was the *neighbor's* ``dk``, not this
cell's (staged gathers do not compose across per-cell indices).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_ops
from .pallas_ops import _VMEM_BUDGET, _LANE, _cparams

__all__ = [
    "supports3",
    "fused_jacobi3",
    "advect3_shift",
    "divergence3_p",
    "gradient3_p",
]


def _interpret() -> bool:
    return pallas_ops.INTERPRET


# Lane-axis (di) term skipping in the flat gather (round 4, 5acece2).
# False recompiles the pre-gate kernel — ONLY for the before/after
# measurement (dev/bench_r5b_ts3.py); both settings are bit-identical.
# Measured (r5b, 256³ slope-timed): wins 3% at cmax=1 (3.86 vs 3.99 ms),
# LOSES at cmax≥2 (decay 10.99 vs 10.48; forcing 15.18 vs 13.48 — the
# per-term predicate costs more than the 2-3-of-5 skipped terms save),
# so the kernel applies it only when cmax == 1 (static condition below).
_GATE_LANE_TERMS = True

# Measured Chebyshev chain plans, (side, total iters) -> (tz, K) — see
# fused_jacobi3's cheby branch for why these beat the per-call model.
_CHEBY_CHAIN_PLAN_MEASURED = {
    (256, 12): (8, 3),
}

_SIGN_AXIS = {1: 2, 2: 1, 3: 0}  # boundary mode -> flipped axis (z,y,x)


def _signs3(b: int):
    ax = _SIGN_AXIS.get(b)
    return (
        -1.0 if ax == 2 else 1.0,  # x faces
        -1.0 if ax == 1 else 1.0,  # y faces
        -1.0 if ax == 0 else 1.0,  # z faces
    )


def _plane_bytes(side: int) -> int:
    return side * side * 4


_VMEM3_CEIL = 96 * 2**20  # hardware-verified scoped ceiling (round 2)

# Calibrated on the 256³ hardware probe (dev/bench_r3l_jacobi3.py):
# measured cost tracks compute redundancy wz/tz (every window re-sweeps
# wz planes for tz output planes) plus a DMA term (nin·wz read + tz
# written, amortized over tz·K output-plane-sweeps) at ratio ≈ 0.62.
# The round-2 planner minimized ONLY the DMA metric wz/(tz·K) and picked
# tz=8/K=5 (270 µs/sweep, 2.5× redundancy); the probe's winner under
# this model is tz=16/K=3 (173 µs/sweep, 1.5× redundancy) — the sweep is
# compute-bound, so redundancy dominates once DMA is ~amortized.
_JAC3_DMA_WEIGHT = 0.62


def _jacobi3_need_hw(tz: int, wz: int, sweeps: int, side: int,
                     nin: int, nout: int = 1) -> int:
    """Modeled scoped-VMEM bytes for a sweep kernel with window ``wz``
    running ``sweeps`` fused sweeps: the planned buffers (nin
    double-buffered input windows + ping-pong sweep pair + Pallas's 2×
    out blocks × ``nout``) plus Mosaic sweep temporaries ≈ 1.25·sweeps·wz
    planes — fit to the 256³ compile pass/fail boundary (tz16/K3 passes
    at 68MB cap, tz16/K5 fails at 74.5, tz32/K1 passes, tz32/K2 fails at
    96)."""
    pb = _plane_bytes(side)
    bufs = ((2 * nin + 2) * wz + 2 * tz * nout) * pb
    # Affine temps model: a pure slope underfeeds mid-K (256³: tz16/s3
    # fails at a 70.5MB cap, passes at 76) while a pure flat headroom
    # underfeeds high-K (tz8/K5 needs >58).  16MB base + 1.25·K·wz
    # planes covers every measured pass/fail point with margin.
    temps = 16 * 2**20 + (5 * sweeps * wz * pb) // 4
    return bufs + temps


def _jacobi3_need(tz: int, K: int, side: int, nin: int,
                  nout: int = 1) -> int:
    return _jacobi3_need_hw(tz, tz + 2 * (K + 1), K, side, nin, nout)


def _jacobi3_plan(side: int, max_fused: int, nin: int = 2, nout: int = 1):
    """(tz, K): z-strip height and sweeps per HBM round-trip minimizing
    the calibrated cost wz/tz + 0.62·(nin·wz + nout·tz)/(tz·K) over plans
    whose modeled VMEM need fits the verified 96MB ceiling.  tz is capped
    at 16: tz=32 measured SLOWER despite the lowest redundancy (325.7 vs
    173.2 µs/sweep at 256³ — too few strips to keep the DMA pipeline
    full).  ``nin=3, nout=2`` plans the Chebyshev chain kernel (x_{k-1}
    window in, both iterates out).  Returns (None, None) if impossible."""
    best = None
    best_cost = None
    for tz in (16, 8, 4, 2, 1):
        if side % tz:
            continue
        for K in range(max_fused, 0, -1):
            wz = tz + 2 * (K + 1)
            if wz > side or _jacobi3_need(tz, K, side, nin,
                                          nout) > _VMEM3_CEIL:
                continue
            cost = wz / tz + _JAC3_DMA_WEIGHT * (
                (nin * wz + nout * tz) / (tz * K))
            if best is None or cost < best_cost:
                best, best_cost = (tz, K), cost
    return best if best is not None else (None, None)


def supports3(side: int) -> bool:
    if _interpret():
        return True
    tz, _ = _jacobi3_plan(side, 1)
    return side >= 128 and side % 8 == 0 and tz is not None


# ---------------------------------------------------------------------------
# Fused-sweep 6-neighbor Jacobi
# ---------------------------------------------------------------------------


def _jacobi3_kernel(
    *refs,
    b: int, alpha: float, beta: float, sweeps: int,
    tz: int, wz: int, side: int, zero_init: bool, zm: int, nstrips: int,
    fast: bool, ws: tuple | None = None, carry_in: bool = False,
    carry_out: bool = False,
):
    # zero_init skips the x-input DMA stream (the guess is zeros).  The
    # xs2 scratch stays ALLOCATED either way: dropping it was probed and
    # reverted — the binding VMEM constraint is Mosaic sweep temporaries,
    # not buffer planes, and the reduced-scratch variant compiled
    # erratically (256³ probe: zi K=2,3 fail where K=4,5 pass) while the
    # full-scratch layout tracks the calibrated need model.
    #
    # Chebyshev chain mode (``ws`` set): per-sweep w factors are static
    # floats (None = plain sweep); ``carry_in`` DMAs the x_{k-1} volume
    # into the ping-pong partner so the three-term combine continues
    # across HBM round-trips; ``carry_out`` writes BOTH final iterates so
    # the next call can keep the recurrence.
    if carry_in:
        x_hbm, xm_hbm, rhs_hbm = refs[:3]
        idx = 3
    else:
        x_hbm, rhs_hbm = refs[:2]
        xm_hbm = None
        idx = 2
    out_ref = refs[idx]
    idx += 1
    outp_ref = refs[idx] if carry_out else None
    idx += 1 if carry_out else 0
    if carry_in:
        xs2, xm2, rhs2, buf_b, buf_c, sems = refs[idx:]
    else:
        xs2, rhs2, buf_b, buf_c, sems = refs[idx:]
        xm2 = None
    gi = pl.program_id(0)
    slot = jax.lax.rem(gi, 2)

    def dmas(gi_, slot_):
        start_ = jnp.clip(gi_ * tz - zm, 0, side - wz)
        cps = [
            pltpu.make_async_copy(
                rhs_hbm.at[pl.ds(start_, wz)], rhs2.at[slot_],
                sems.at[slot_, 0],
            )
        ]
        if not zero_init:
            cps.append(
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(start_, wz)], xs2.at[slot_],
                    sems.at[slot_, 1],
                )
            )
        if carry_in:
            cps.append(
                pltpu.make_async_copy(
                    xm_hbm.at[pl.ds(start_, wz)], xm2.at[slot_],
                    sems.at[slot_, 2],
                )
            )
        return cps

    @pl.when(gi == 0)
    def _():
        for cp in dmas(gi, slot):
            cp.start()

    @pl.when(gi + 1 < nstrips)
    def _():
        for cp in dmas(gi + 1, jax.lax.rem(gi + 1, 2)):
            cp.start()

    for cp in dmas(gi, slot):
        cp.wait()

    start = jnp.clip(gi * tz - zm, 0, side - wz)
    dt = buf_b.dtype
    if zero_init:
        buf_c[:] = jnp.zeros((wz, side, side), dt)
    else:
        buf_c[:] = xs2[slot]
    if carry_in:
        buf_b[:] = xm2[slot]  # x_{k-1}: dst of the first chained sweep
    rhs_buf = rhs2.at[slot]
    if fast:
        rhs_buf[:] = rhs_buf[:] * jnp.asarray(1.0 / beta, dt)
    a_c = jnp.asarray(alpha, dt)
    ab_c = jnp.asarray(alpha / beta, dt)
    b_c = jnp.asarray(beta, dt)
    sxf, syf, szf = _signs3(b)
    sx = jnp.asarray(sxf, dt)
    sy = jnp.asarray(syf, dt)
    sz = jnp.asarray(szf, dt)

    # The sweep runs on the window FLATTENED to (wz*side, side): z collapses
    # into the sublane axis (free reshape — planes are whole (8,128)-tile
    # rows), so every neighbor is a single 2-D rotate exactly like the fast
    # 2-D kernel: x = lane roll, y = 1-row roll, z = side-row roll.  Rolls
    # that cross plane boundaries write garbage ONLY into rows that are
    # ghost faces (y = 0 / side-1 of each plane) or margin planes — the
    # in-sweep BC and the zm margin rewrite/absorb them, the same argument
    # as the 2-D kernel's wrap-around rows.  This replaced per-axis 3-D
    # rolls + plane concats (measured ~3x on the 20-sweep solve at 128^3).
    L = wz * side
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    y_in_plane = jax.lax.rem(rows, side)
    y0m = y_in_plane == 0
    y1m = y_in_plane == (side - 1)
    # BC-fold masks (round 3): instead of REWRITING ghost faces after every
    # sweep (two extra full-array rolls + column/plane stores), fold the
    # boundary rule into the neighbor READS of the next sweep — a cell one
    # step inside a wall reads sign*itself's-neighbor... i.e. exactly
    # sign*s at the inside-adjacent line.  Ghost cells then carry garbage
    # THROUGH the sweeps (nothing reads them) and the faces are derived
    # once in the epilogue.  The FIRST sweep is left unfolded so the
    # initial guess contributes its raw ghost ring, the reference quirk
    # the 2-D path also preserves (FluidSequential.c:244-271 sources have
    # live borders).
    y1f = y_in_plane == 1
    ym2f = y_in_plane == (side - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, side), 1)
    c1f = col == 1
    cm2f = col == (side - 2)
    z1f = (rows >= side) & (rows < 2 * side) & (start == 0)
    zm2f = (
        (rows >= (wz - 2) * side) & (rows < (wz - 1) * side)
        & (start + wz == side)
    )

    def sweep(src, dst, fold: bool, w=None):
        s = src[:].reshape(L, side)
        sL = pltpu.roll(s, 1, 1)
        sR = pltpu.roll(s, side - 1, 1)
        sU = pltpu.roll(s, 1, 0)           # y-1 (plane seams -> ghost rows)
        sD = pltpu.roll(s, L - 1, 0)       # y+1
        sF = pltpu.roll(s, side, 0)        # z-1 (margin absorbs seam)
        sB = pltpu.roll(s, L - side, 0)    # z+1
        if fold:
            sL = jnp.where(c1f, sx * s, sL)
            sR = jnp.where(cm2f, sx * s, sR)
            sU = jnp.where(y1f, sy * s, sU)
            sD = jnp.where(ym2f, sy * s, sD)
            sF = jnp.where(z1f, sz * s, sF)
            sB = jnp.where(zm2f, sz * s, sB)
        neigh = ((sL + sR) + (sU + sD)) + (sF + sB)
        if fast:
            d2 = rhs_buf[:].reshape(L, side) + ab_c * neigh
        else:
            d2 = (rhs_buf[:].reshape(L, side) + a_c * neigh) / b_c
        if w is not None:  # Chebyshev three-term combine (pallas_ops
            # _sweep_loop invariant: dst holds x_{k-1}, pointwise)
            wc = jnp.asarray(w, dt)
            d2 = wc * d2 + (jnp.asarray(1.0, dt) - wc) * dst[:].reshape(
                L, side)
        dst[:] = d2.reshape(wz, side, side)

    if ws is None:
        sweep(buf_c, buf_b, False)  # sweep 1: raw guess ghost (jnp spec)

        def double_sweep(_, carry):
            sweep(buf_b, buf_c, True)
            sweep(buf_c, buf_b, True)
            return carry

        rem = sweeps - 1
        jax.lax.fori_loop(0, rem // 2, double_sweep, 0)
        if rem % 2:
            sweep(buf_b, buf_c, True)
            final = buf_c
        else:
            final = buf_b
        prev = None
    else:
        # Static unroll (<= K sweeps/call): the per-sweep w's differ, and
        # the temporaries model already charges 1.25·sweeps·wz planes.
        # The global first sweep keeps the unfolded raw-guess ghost quirk;
        # chained calls re-enter folded (the previous call's epilogue
        # derived faces = exactly what a folded read computes).
        cur, oth = buf_c, buf_b
        for i, w in enumerate(ws):
            sweep(cur, oth, carry_in or i > 0, w)
            cur, oth = oth, cur
        final = cur
        prev = oth

    # Epilogue: derive the ghost FACES once from the converged interior
    # (the per-sweep rewrite this replaces cost 2 rolls/sweep; callers
    # rely on kernel outputs having jnp-rule faces — models/_Ops3 policy).
    f2 = final[:].reshape(L, side)
    f2 = jnp.where(y0m, sy * pltpu.roll(f2, L - 1, 0), f2)
    f2 = jnp.where(y1m, sy * pltpu.roll(f2, 1, 0), f2)
    final[:] = f2.reshape(wz, side, side)
    final[:, :, 0:1] = sx * final[:, :, 1:2]
    final[:, :, side - 1 : side] = sx * final[:, :, side - 2 : side - 1]

    @pl.when(start == 0)
    def _():
        final[0:1] = sz * final[1:2]

    @pl.when(start + wz == side)
    def _():
        final[wz - 1 : wz] = sz * final[wz - 2 : wz - 1]

    off = gi * tz - start  # dynamic, leading dim: no alignment constraint
    out_ref[:] = final[pl.ds(off, tz)]
    if carry_out:
        # x_{k+s-1} for the next chained call's combine.  No face
        # derivation: the combine reads it POINTWISE (the folded stencil
        # never reads ghost faces, and every face of the final result is
        # re-derived by the last call's epilogue above), and its validity
        # at the output planes exceeds final's by one sweep.
        outp_ref[:] = prev[pl.ds(off, tz)]


def fused_jacobi3(
    b: int,
    x_init: jnp.ndarray,
    x0: jnp.ndarray,
    alpha: float,
    beta: float,
    iters: int,
    *,
    zero_init: bool = False,
    max_fused: int = 10,
    fast: bool = False,
    cheby_rho: float | None = None,
) -> jnp.ndarray:
    """``iters`` 6-neighbor Jacobi sweeps (semantics of
    ``ops.three_d.diffuse3`` minus the final full ghost-layer derivation —
    call ``set_bnd3`` on the result).  ``cheby_rho`` switches to
    Chebyshev-accelerated sweeps (``ops/chebyshev.py:cheby_diffuse3``
    semantics): unlike the 2-D one-call kernels, the 3-D solve spans
    several HBM round-trips, so the chain carries x_{k-1} across calls
    (both iterates written per call, x_{k-1} window DMA'd back in) and
    the w schedule is sliced per call as static constants."""
    side = x0.shape[-1]
    if cheby_rho is not None:
        from ..ops.chebyshev import cheby_omegas

        # Measured chain-plan overrides (dev/bench_r5c_plans3_focus.py,
        # interleaved reps=8): the per-call cost model prices neither
        # junction count nor segmentation raggedness, and at 256³ the
        # 12-sweep chain (the 3-D compensated pressure solve) runs 13%
        # faster as 4 even K=3 segments at tz=8 (3.08 ms) than as the
        # model's 6 K=2 segments at tz=16 (3.55 ms).  The 10-sweep chain
        # measured FASTER on the model's plan (2.31 vs 2.50/2.64) — only
        # the probed winners are overridden.
        tz, K = _CHEBY_CHAIN_PLAN_MEASURED.get(
            (side, iters),
            _jacobi3_plan(side, min(max_fused, iters), nin=3, nout=2))
        assert tz is not None, f"unsupported 3-D side {side} (cheby)"
        ws_all = [None] + [float(w) for w in
                           cheby_omegas(float(cheby_rho), iters)]
        x, xm = x_init, None
        done = 0
        first = True
        while done < iters:
            s = min(K, iters - done)
            ws = tuple(ws_all[done:done + s])
            last = done + s >= iters
            res = _fused_jacobi3_cheby_call(
                b, x, xm, x0, float(alpha), float(beta), ws, tz, side,
                zero_init and first, fast, xm is not None, not last,
            )
            if last:
                x = res
            else:
                x, xm = res
            done += s
            first = False
        return x
    tz, K = _jacobi3_plan(side, min(max_fused, iters))
    assert tz is not None, f"unsupported 3-D side {side}"
    x = x_init
    first = True
    remaining = iters
    while remaining > 0:
        s = min(remaining, K)
        x = _fused_jacobi3_call(
            b, x, x0, float(alpha), float(beta), s, tz, side,
            zero_init and first, fast,
        )
        first = False
        remaining -= s
    return x


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "sweeps", "tz", "side",
                     "zero_init", "fast"),
)
def _fused_jacobi3_call(b, x, x0, alpha, beta, sweeps, tz, side, zero_init,
                        fast):
    zm = sweeps + 1
    wz = tz + 2 * zm
    assert wz <= side, "fused 3-D window exceeds volume"
    nstrips = side // tz
    kernel = functools.partial(
        _jacobi3_kernel, b=b, alpha=alpha, beta=beta, sweeps=sweeps,
        tz=tz, wz=wz, side=side, zero_init=zero_init, zm=zm,
        nstrips=nstrips, fast=fast,
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=jax.ShapeDtypeStruct((side, side, side), x0.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wz, side, side), x0.dtype),
            pltpu.VMEM((2, wz, side, side), x0.dtype),
            pltpu.VMEM((wz, side, side), x0.dtype),
            pltpu.VMEM((wz, side, side), x0.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=_interpret(),
        # Scoped cap from the calibrated need model (buffers + Mosaic
        # sweep temporaries).  Round 2 learned that a fixed cap bites
        # twice: too low is a compile error, too high hides planner
        # overruns — so the cap tracks the same model the planner gates
        # viability on, clamped to the hardware-verified 96MB ceiling.
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM3_CEIL, _jacobi3_need_hw(tz, wz, sweeps, side, 2)
            )
        ),
    )(x, x0)


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "ws", "tz", "side",
                     "zero_init", "fast", "carry_in", "carry_out"),
)
def _fused_jacobi3_cheby_call(b, x, xm, x0, alpha, beta, ws, tz, side,
                              zero_init, fast, carry_in, carry_out):
    """One chained Chebyshev segment: ``len(ws)`` sweeps with static w
    factors; DMAs x (and x_{k-1} when ``carry_in``), returns the final
    iterate (and the one before it when ``carry_out``)."""
    sweeps = len(ws)
    zm = sweeps + 1
    wz = tz + 2 * zm
    assert wz <= side, "fused 3-D window exceeds volume"
    nstrips = side // tz
    kernel = functools.partial(
        _jacobi3_kernel, b=b, alpha=alpha, beta=beta, sweeps=sweeps,
        tz=tz, wz=wz, side=side, zero_init=zero_init, zm=zm,
        nstrips=nstrips, fast=fast, ws=ws, carry_in=carry_in,
        carry_out=carry_out,
    )
    vol = jax.ShapeDtypeStruct((side, side, side), x0.dtype)
    blk = pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                       memory_space=pltpu.VMEM)
    nin = 3 if carry_in else 2
    scratch = [pltpu.VMEM((2, wz, side, side), x0.dtype)
               for _ in range(nin)]
    scratch += [
        pltpu.VMEM((wz, side, side), x0.dtype),
        pltpu.VMEM((wz, side, side), x0.dtype),
        pltpu.SemaphoreType.DMA((2, 3 if carry_in else 2)),
    ]
    operands = (x, xm, x0) if carry_in else (x, x0)
    out = pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=(vol, vol) if carry_out else vol,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nin,
        out_specs=(blk, blk) if carry_out else blk,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM3_CEIL,
                _jacobi3_need_hw(tz, wz, sweeps, side, nin,
                                 2 if carry_out else 1),
            )
        ),
    )(*operands)
    return out


# ---------------------------------------------------------------------------
# Windowed trilinear advection (two-stage factorized gather)
# ---------------------------------------------------------------------------


def _advect3_plan(side: int, nf: int, cmax: int):
    """z-strip height for the advect kernel: window wz = tz + 2*(cmax+1)
    planes per field + velocity strips + plane scratch must fit VMEM."""
    pb = _plane_bytes(side)
    budget_planes = _VMEM_BUDGET // pb
    C = cmax + 1
    for tz in (8, 16, 4, 2, 1):
        if side % tz:
            continue
        wz = tz + 2 * C
        # nf field windows + 3 velocity strips + out strips + ~14 plane
        # temporaries (pbufs, corner accumulators, coords).
        if wz <= side and nf * wz + 3 * tz + nf * tz + 16 <= budget_planes:
            return tz
    return None


def _advect3_kernel(
    *refs,
    nf: int, bs: tuple, dt: float, n: int, tz: int, wz: int, side: int,
    cmax: int, lpad: int, self_adv: bool, nstrips: int,
):
    # Arg layout: nf field volumes (ANY) | u, v, w strips (unless self_adv:
    # the first three fields ARE the velocities) | nf out strips |
    # scratch: nf field windows, pbuf0, pbuf1, sems.
    fields = refs[:nf]
    idx = nf
    if self_adv:
        u_ref, v_ref, w_ref = None, None, None  # read from windows below
    else:
        u_ref, v_ref, w_ref = refs[idx : idx + 3]
        idx += 3
    out_refs = refs[idx : idx + nf]
    wins = refs[idx + nf : idx + 2 * nf]
    pbuf0, pbuf1 = refs[idx + 2 * nf : idx + 2 * nf + 2]
    sems = refs[-1]

    gi = pl.program_id(0)
    C = cmax + 1
    start = jnp.clip(gi * tz - C, 0, side - wz)
    base = gi * tz - start  # window plane of this strip's first out plane

    for f in range(nf):
        pltpu.make_async_copy(
            fields[f].at[pl.ds(start, wz)], wins[f], sems.at[f]
        ).start()
    for f in range(nf):
        pltpu.make_async_copy(
            fields[f].at[pl.ds(start, wz)], wins[f], sems.at[f]
        ).wait()

    dtype = wins[0].dtype
    dt0 = jnp.asarray(dt, dtype) * n
    nsh = 2 * cmax + 1
    one = jnp.asarray(1.0, dtype)
    lo = jnp.asarray(0.5, dtype)
    hi = jnp.asarray(n + 0.5, dtype)
    H = side + 8  # pbuf rows: plane + padding so the j0+1 row slice exists

    gy = jax.lax.broadcasted_iota(jnp.int32, (side, side), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (side, side), 1)
    gyf = gy.astype(dtype)
    gxf = gx.astype(dtype)

    def plane(ref, z):
        return ref[pl.ds(z, 1)][0]

    def out_plane(zo, carry):
        zw = base + zo  # window plane index of out plane zo
        if self_adv:
            up = plane(wins[0], zw)
            vp = plane(wins[1], zw)
            wp = plane(wins[2], zw)
        else:
            up = plane(u_ref, zo)
            vp = plane(v_ref, zo)
            wp = plane(w_ref, zo)
        gz = (start + zw).astype(jnp.int32)  # global z of this plane
        gzf = gz.astype(dtype)

        x = gxf - dt0 * up
        y = gyf - dt0 * vp
        z = gzf - dt0 * wp
        x = jnp.clip(jnp.clip(x, lo, hi), gxf - cmax, gxf + cmax)
        y = jnp.clip(jnp.clip(y, lo, hi), gyf - cmax, gyf + cmax)
        z = jnp.clip(jnp.clip(z, lo, hi), gzf - cmax, gzf + cmax)
        i0 = x.astype(jnp.int32)
        j0 = y.astype(jnp.int32)
        k0 = z.astype(jnp.int32)
        fx = x - i0.astype(dtype)
        fy = y - j0.astype(dtype)
        fz = z - k0.astype(dtype)
        dk = k0 - gz
        key_xy = (j0 - gy + cmax) * nsh + (i0 - gx + cmax)

        for f in range(nf):
            win = wins[f]
            zero = jnp.zeros((side, side), dtype)
            c000 = c001 = c010 = c011 = zero
            c100 = c101 = c110 = c111 = zero
            # dz loop OUTSIDE (composition-safe): each z candidate's plane
            # pair goes through the 2-D masked-shift gather (lane-padded
            # staging + iterative lane rolls keep every read lane-aligned)
            # under the combined mask (dk == dz) & (key_xy == t).
            for dz in range(-cmax, cmax + 1):
                mz = dk == dz
                # Clamp the candidate plane index to the window: at wall
                # strips zw+dz walks past the window (negative at z=0, past
                # wz-1 at z=side-wz) for candidates no cell selects — the
                # coordinate clip guarantees every SELECTED (mz-true) cell's
                # planes are in-window, but the read itself happens before
                # the mask, and an out-of-bounds dynamic VMEM slice faults
                # the chip (observed: TPU worker crash at 128^3).
                zp = jnp.clip(zw + dz, 0, wz - 2)
                pbuf0[0:side, lpad : lpad + side] = plane(win, zp)
                pbuf1[0:side, lpad : lpad + side] = plane(win, zp + 1)
                for dj in range(-cmax, cmax + 1):
                    q0 = pltpu.roll(pbuf0[:], H - dj if dj > 0 else -dj, 0)
                    q1 = pltpu.roll(pbuf1[:], H - dj if dj > 0 else -dj, 0)
                    q0 = pltpu.roll(q0, cmax, 1)  # lane c reads c - cmax
                    q1 = pltpu.roll(q1, cmax, 1)
                    wide_ = q0.shape[-1]
                    for di_idx in range(nsh):
                        t = (dj + cmax) * nsh + di_idx
                        mk = mz & (key_xy == t)
                        q0n = pltpu.roll(q0, wide_ - 1, 1)
                        q1n = pltpu.roll(q1, wide_ - 1, 1)
                        sl = lambda q, r: q[r : r + side, lpad : lpad + side]
                        c000 = jnp.where(mk, sl(q0, 0), c000)
                        c001 = jnp.where(mk, sl(q0n, 0), c001)
                        c010 = jnp.where(mk, sl(q0, 1), c010)
                        c011 = jnp.where(mk, sl(q0n, 1), c011)
                        c100 = jnp.where(mk, sl(q1, 0), c100)
                        c101 = jnp.where(mk, sl(q1n, 0), c101)
                        c110 = jnp.where(mk, sl(q1, 1), c110)
                        c111 = jnp.where(mk, sl(q1n, 1), c111)
                        q0, q1 = q0n, q1n

            # Trilinear blend in the jnp ops' exact expression order
            # (ops/three_d.py advect3_windowed).
            interior = (
                (one - fz) * (
                    (one - fy) * ((one - fx) * c000 + fx * c001)
                    + fy * ((one - fx) * c010 + fx * c011)
                )
                + fz * (
                    (one - fy) * ((one - fx) * c100 + fx * c101)
                    + fy * ((one - fx) * c110 + fx * c111)
                )
            )
            out_refs[f][pl.ds(zo, 1)] = interior[None]
        return carry

    jax.lax.fori_loop(0, tz, out_plane, 0)


@functools.partial(
    jax.jit, static_argnames=("bs", "dt", "n", "cmax", "self_adv")
)
def _advect3_call(bs, d0s, dt, n, cmax, self_adv, u, v, w):
    nf = len(d0s)
    side = n + 2
    tz = _advect3_plan(side, nf, cmax)
    if tz is None:
        raise ValueError(f"advect3: no viable z-strip for side={side}")
    C = cmax + 1
    wz = tz + 2 * C
    nstrips = side // tz
    lpad = _LANE
    kernel = functools.partial(
        _advect3_kernel, nf=nf, bs=tuple(bs), dt=dt, n=n, tz=tz, wz=wz,
        side=side, cmax=cmax, lpad=lpad, self_adv=self_adv,
        nstrips=nstrips,
    )
    sblk = pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * nf
    operands = list(d0s)
    if not self_adv:
        in_specs += [sblk, sblk, sblk]
        operands += [u, v, w]
    dtype = d0s[0].dtype
    out = pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((side, side, side), dtype)
            for _ in range(nf)
        ),
        in_specs=in_specs,
        out_specs=tuple(sblk for _ in range(nf)),
        scratch_shapes=[pltpu.VMEM((wz, side, side), dtype) for _ in range(nf)]
        + [
            pltpu.VMEM((side + 8, side + 2 * _LANE), dtype),
            pltpu.VMEM((side + 8, side + 2 * _LANE), dtype),
            pltpu.SemaphoreType.DMA((nf,)),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _cparams(),
    )(*operands)
    return out if isinstance(out, tuple) else (out,)


# --- Flattened single-field gather (round 3) -------------------------------
#
# The plane-at-a-time kernel above issues thousands of small (side, side)
# ops per volume (2,300+ rolls at 256³/cmax=1) — each too small to fill the
# VPU.  For one field, flatten z into the sublane axis exactly like the
# Jacobi kernel: a (dz, dy) candidate pair becomes ONE static row offset
# ``dz*side + dy`` into the flattened window, and the whole tz-plane strip
# gathers with (tz*side, side)-sized ops.  Term count is identical
# ((2C+1)³ masked selects, 8 corners sharing one mask compare); op
# granularity is ~tz*side/1 larger.  Measured at 256³/cmax=1: 6.1 → 2.5 ms
# per field.


def _advect3_flat_need(side: int, tz: int, cmax: int) -> int:
    """Modeled scoped-VMEM bytes for the flattened gather at strip height
    ``tz``: rows of side-lane f32 (wbuf + win + 8 accumulators + ~6 live
    (L+side)-row chain values + out block) times the measured compiled
    inflation, plus 8MB stack headroom.  Inflation is calibrated per
    window width: ~1.75× at cmax≤1 (256³: tz=8 raw 39.5MB compiles at a
    78MB cap; tz=16 raw 75.6MB fails >96MB) but ~2.5× at cmax=2 — the
    125-term select chain's live ranges grow with the window (256³:
    tz=8/cmax=2 raw 40.6MB FAILS even at 96MB; tz=4/cmax=2 raw 22.6MB
    compiles under the old 64MB cap)."""
    C = cmax + 1
    L = tz * side
    W = (tz + 2 * C) * side
    pad = _ceil8_3d(cmax + 1)
    rows = (W + pad) + W + 8 * L + 6 * (L + side + 8) + 2 * L
    num, den = (7, 4) if cmax <= 1 else (5, 2)
    return (num * rows * side * 4) // den + 8 * 2**20


def _advect3_flat_plan(side: int, cmax: int):
    """z-strip height for the flattened gather, or None.  tz=8 halves the
    per-strip staging/backtrace overhead and cuts window redundancy 2.0 →
    1.5 vs tz=4 — measured 9% faster at 256³, bit-exact."""
    if cmax > 2:  # (2C+1)³ unrolled select chain: compile-size gate
        return None
    for tz in (8, 4, 2, 1):
        if side % tz:
            continue
        if _advect3_flat_need(side, tz, cmax) <= _VMEM3_CEIL:
            return tz
    return None


def _ceil8_3d(x: int) -> int:
    return (x + 7) // 8 * 8


def _flat_gather_body(
    wbuf, u_blk, v_blk, w_blk, gs, z0,
    *, dt: float, n: int, tz: int, side: int, cmax: int,
):
    """Shared flattened masked-shift trilinear gather body — used by BOTH
    the single-chip kernel (``_advect3_flat_kernel``) and the slab kernel
    (``pallas_sharded_3d._advect3_flat_slab_kernel``) so fixes to the
    backtrace/clamp/select-chain land in one place.

    Preconditions: ``wbuf`` rows ``[0, W)`` hold the flattened staged
    window with the strip's first out plane at row ``Cs = (cmax+1)*side``;
    ``z0`` is the GLOBAL z index of that first out plane (traced scalar);
    ``gs`` are the 8 (L, side) VMEM corner accumulators.  Returns the
    gathered (L, side) interior (trilinear blend in the jnp ops' exact
    expression order, ``ops/three_d.py advect3_windowed``; row offset +1 =
    y+1, +side = z+1)."""
    g000, g001, g010, g011, g100, g101, g110, g111 = gs
    C = cmax + 1
    L = tz * side
    Cs = C * side
    dtype = wbuf.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    gzi = z0 + rows // side
    gyi = jax.lax.rem(rows, side)
    gxi = jax.lax.broadcasted_iota(jnp.int32, (L, side), 1)
    gz = gzi.astype(dtype)
    gy = gyi.astype(dtype)
    gx = gxi.astype(dtype)
    dt0 = jnp.asarray(dt, dtype) * n
    x = gx - dt0 * u_blk[:].reshape(L, side)
    y = gy - dt0 * v_blk[:].reshape(L, side)
    z = gz - dt0 * w_blk[:].reshape(L, side)
    lo = jnp.asarray(0.5, dtype)
    hi = jnp.asarray(n + 0.5, dtype)
    x = jnp.clip(jnp.clip(x, lo, hi), gx - cmax, gx + cmax)
    y = jnp.clip(jnp.clip(y, lo, hi), gy - cmax, gy + cmax)
    z = jnp.clip(jnp.clip(z, lo, hi), gz - cmax, gz + cmax)
    i0 = x.astype(jnp.int32)
    j0 = y.astype(jnp.int32)
    k0 = z.astype(jnp.int32)
    fx = x - i0.astype(dtype)
    fy = y - j0.astype(dtype)
    fz = z - k0.astype(dtype)
    nsh = 2 * cmax + 1
    di = i0 - gxi
    dj = j0 - gyi
    dk = k0 - gzi
    key = ((dk + cmax) * nsh + (dj + cmax)) * nsh + (di + cmax)
    # Strip-range term skipping, factored per axis (the 2-D strip-range
    # gate, one dimension up): a (dz, dy) candidate pair whose offset no
    # cell in the strip uses is skipped at run time (masks provably
    # all-false), and within a fired pair the lane (di) terms are gated
    # the same way when cmax == 1 (round 4: the decay regime fires 1-2
    # of the 2C+1 lane offsets — each skipped term saves 2 lane rolls +
    # 8 (L, side) selects; at cmax≥2 the gate measured a net LOSS, see
    # the _GATE_LANE_TERMS header).
    dk_lo, dk_hi = jnp.min(dk), jnp.max(dk)
    dj_lo, dj_hi = jnp.min(dj), jnp.max(dj)
    di_lo, di_hi = jnp.min(di), jnp.max(di)

    zero = jnp.zeros((L, side), dtype)
    for g in gs:
        g[:] = zero

    for dzi in range(nsh):
        for dyi in range(nsh):
            dz = dzi - cmax
            dy = dyi - cmax
            rshift = dz * side + dy

            def _pair(dzi=dzi, dyi=dyi, rshift=rshift):
                rq = wbuf[Cs + rshift : Cs + rshift + L + side + 1, :]
                wide_ = rq.shape[-1]
                for dii in range(nsh):
                    # each fired lane term re-rolls from the unshifted
                    # slice (one static roll either way — the pre-gate
                    # iterative q=qn chain had the same roll count when
                    # everything fired, but could not skip)
                    def _di(dzi=dzi, dyi=dyi, dii=dii, rq=rq):
                        t = (dzi * nsh + dyi) * nsh + dii
                        mk = key == t
                        # lane c reads c - cmax + dii
                        q = pltpu.roll(rq, (cmax - dii) % wide_, 1)
                        qn = pltpu.roll(q, wide_ - 1, 1)
                        g000[:] = jnp.where(mk, q[0:L, :], g000[:])
                        g001[:] = jnp.where(mk, qn[0:L, :], g001[:])
                        g010[:] = jnp.where(mk, q[1 : L + 1, :], g010[:])
                        g011[:] = jnp.where(mk, qn[1 : L + 1, :], g011[:])
                        g100[:] = jnp.where(mk, q[side : L + side, :],
                                            g100[:])
                        g101[:] = jnp.where(mk, qn[side : L + side, :],
                                            g101[:])
                        g110[:] = jnp.where(
                            mk, q[side + 1 : L + side + 1, :], g110[:])
                        g111[:] = jnp.where(
                            mk, qn[side + 1 : L + side + 1, :], g111[:])

                    d_i = dii - cmax
                    # gate only the 3-shift window: at cmax≥2 the
                    # predicate overhead beats the skips (r5b, header)
                    if _GATE_LANE_TERMS and cmax == 1:
                        pl.when(
                            jnp.logical_and(di_lo <= d_i, d_i <= di_hi)
                        )(_di)
                    else:  # A/B baseline (dev/bench_r5b_ts3.py)
                        _di()

            pl.when(
                jnp.logical_and(
                    jnp.logical_and(dk_lo <= dz, dz <= dk_hi),
                    jnp.logical_and(dj_lo <= dy, dy <= dj_hi),
                )
            )(_pair)

    one = jnp.asarray(1.0, dtype)
    return (
        (one - fz) * (
            (one - fy) * ((one - fx) * g000[:] + fx * g001[:])
            + fy * ((one - fx) * g010[:] + fx * g011[:])
        )
        + fz * (
            (one - fy) * ((one - fx) * g100[:] + fx * g101[:])
            + fy * ((one - fx) * g110[:] + fx * g111[:])
        )
    )


def _advect3_flat_kernel(
    d0_hbm, u_blk, v_blk, w_blk, out_ref, win, wbuf,
    g000, g001, g010, g011, g100, g101, g110, g111, sem,
    *, dt: float, n: int, tz: int, wz: int, side: int, cmax: int,
):
    gi = pl.program_id(0)
    C = cmax + 1
    start = jnp.clip(gi * tz - C, 0, side - wz)
    base = gi * tz - start  # window plane of this strip's first out plane
    cp = pltpu.make_async_copy(d0_hbm.at[pl.ds(start, wz)], win, sem)
    cp.start()
    cp.wait()

    W = wz * side
    Cs = C * side
    # Stage the flattened window with out plane 0 at STATIC row Cs (one
    # positive-normalized dynamic roll — negative dynamic sublane shifts
    # mis-rotate in compiled Mosaic, cf. the 2-D kernels).
    shift = jax.lax.rem(jnp.int32(W) + Cs - base * side, jnp.int32(W))
    wbuf[0:W, :] = pltpu.roll(win[:].reshape(W, side), shift, 0)

    interior = _flat_gather_body(
        wbuf, u_blk, v_blk, w_blk,
        (g000, g001, g010, g011, g100, g101, g110, g111),
        gi * tz, dt=dt, n=n, tz=tz, side=side, cmax=cmax,
    )
    out_ref[:] = interior.reshape(tz, side, side)


@functools.partial(jax.jit, static_argnames=("dt", "n", "cmax"))
def _advect3_flat_call(d0, u, v, w, dt, n, cmax):
    side = n + 2
    tz = _advect3_flat_plan(side, cmax)
    assert tz is not None
    C = cmax + 1
    wz = tz + 2 * C
    W = wz * side
    pad = _ceil8_3d(cmax + 1)
    kernel = functools.partial(
        _advect3_flat_kernel, dt=dt, n=n, tz=tz, wz=wz, side=side,
        cmax=cmax,
    )
    sblk = pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                        memory_space=pltpu.VMEM)
    L = tz * side
    return pl.pallas_call(
        kernel,
        grid=(side // tz,),
        out_shape=jax.ShapeDtypeStruct((side, side, side), d0.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), sblk, sblk, sblk],
        out_specs=sblk,
        scratch_shapes=[
            pltpu.VMEM((wz, side, side), d0.dtype),
            pltpu.VMEM((W + pad, side), d0.dtype),
        ]
        + [pltpu.VMEM((L, side), d0.dtype) for _ in range(8)]
        + [pltpu.SemaphoreType.DMA],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM3_CEIL, _advect3_flat_need(side, tz, cmax)
            )
        ),
    )(d0, u, v, w)


def advect3_shift(b, d0, u, v, w, dt, n, *, cmax=2):
    """Windowed trilinear advection (semantics of
    ``ops.three_d.advect3_windowed`` minus the final ghost layer — call
    ``set_bnd3`` on the result)."""
    if _advect3_flat_plan(n + 2, cmax) is not None:
        return _advect3_flat_call(d0, u, v, w, float(dt), n, cmax)
    return _advect3_call((b,), (d0,), float(dt), n, cmax, False, u, v, w)[0]


def advect3_shift_fused(bs, d0s, u, v, w, dt, n, *, cmax=2,
                        self_advect=False):
    """Advect several fields by one velocity in a single kernel (shared
    backtrace, z-selects and masks).  ``self_advect`` marks (u, v, w)
    self-advection — the fields are the velocities, saving 3 input strips."""
    return _advect3_call(
        tuple(bs), tuple(d0s), float(dt), n, cmax, self_advect, u, v, w
    )


# ---------------------------------------------------------------------------
# Divergence / pressure gradient (1-halo z stencils)
# ---------------------------------------------------------------------------


def _halo1_specs3(side: int):
    pb = _plane_bytes(side)
    for tz in (8, 16, 4, 2, 1):
        # ~12 strips of tz planes live at once (3-shifted inputs + outs).
        if side % tz == 0 and 14 * tz * pb <= _VMEM_BUDGET:
            break
    else:
        raise ValueError(f"no viable 3-D strip for side={side}")
    nstrips = side // tz

    def blk(shift):
        if shift == 0:
            return pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                                memory_space=pltpu.VMEM)
        if shift < 0:
            return pl.BlockSpec(
                (tz, side, side),
                lambda gi: (jnp.maximum(gi - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (tz, side, side),
            lambda gi: (jnp.minimum(gi + 1, nstrips - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    return tz, blk


def _zshifted(m1, c0, p1):
    """Plane-shifted views of the center strip using neighbor strips;
    wall strips get duplicated planes (garbage, ghost output discarded)."""
    cc = c0[:]
    zlo = jnp.concatenate([m1[-1:], cc[:-1]], axis=0)  # plane z-1
    zhi = jnp.concatenate([cc[1:], p1[:1]], axis=0)    # plane z+1
    return cc, zlo, zhi


def _divergence3_kernel(u_c, v_c, w_m1, w_c, w_p1, out_ref,
                        *, n: int, side: int):
    dt = out_ref.dtype
    h = jnp.asarray(1.0, dt) / n
    uu = u_c[:]
    vv = v_c[:]
    du = pltpu.roll(uu, side - 1, 2) - pltpu.roll(uu, 1, 2)
    dv = pltpu.roll(vv, side - 1, 1) - pltpu.roll(vv, 1, 1)
    _, w_lo, w_hi = _zshifted(w_m1, w_c, w_p1)
    out_ref[:] = (jnp.asarray(-0.5, dt) * h) * ((du + dv) + (w_hi - w_lo))


def _gradient3_kernel(p_m1, p_c, p_p1, u_c, v_c, w_c, uo, vo, wo,
                      *, n: int, side: int):
    dt = uo.dtype
    h = jnp.asarray(1.0, dt) / n
    half = jnp.asarray(0.5, dt)
    pc, p_lo, p_hi = _zshifted(p_m1, p_c, p_p1)
    dpx = pltpu.roll(pc, side - 1, 2) - pltpu.roll(pc, 1, 2)
    dpy = pltpu.roll(pc, side - 1, 1) - pltpu.roll(pc, 1, 1)
    uo[:] = u_c[:] - (half * dpx) / h
    vo[:] = v_c[:] - (half * dpy) / h
    wo[:] = w_c[:] - (half * (p_hi - p_lo)) / h


@functools.partial(jax.jit, static_argnames=("n",))
def divergence3_p(u, v, w, n):
    """Divergence (interior exact; ghost layer via ``set_bnd3``)."""
    side = n + 2
    tz, blk = _halo1_specs3(side)
    kernel = functools.partial(_divergence3_kernel, n=n, side=side)
    return pl.pallas_call(
        kernel,
        grid=(side // tz,),
        out_shape=jax.ShapeDtypeStruct((side, side, side), u.dtype),
        in_specs=[blk(0), blk(0), blk(-1), blk(0), blk(+1)],
        out_specs=blk(0),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _cparams(),
    )(u, v, w, w, w)


@functools.partial(jax.jit, static_argnames=("n",))
def gradient3_p(u, v, w, p, n):
    side = n + 2
    tz, blk = _halo1_specs3(side)
    kernel = functools.partial(_gradient3_kernel, n=n, side=side)
    return pl.pallas_call(
        kernel,
        grid=(side // tz,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((side, side, side), u.dtype)
            for _ in range(3)
        ),
        in_specs=[blk(-1), blk(0), blk(+1), blk(0), blk(0), blk(0)],
        out_specs=(blk(0), blk(0), blk(0)),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _cparams(),
    )(p, p, p, u, v, w)
