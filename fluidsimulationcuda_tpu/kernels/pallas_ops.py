"""Fused Pallas TPU kernels — the performance backend.

Design
------
Every kernel tiles the padded (side, side) grid into full-width *row strips*
(side = n+2).  Full-width strips mean there are no column halos: the left and
right ghost columns live inside every strip and are re-derived in VMEM after
every sweep.  Row halos are loaded K-deep so K Jacobi sweeps run per HBM
round-trip — the TPU answer to the reference's three Jacobi strategies
(40 host launches, ``naivePar/...BlockPerElement-Naive.cu:261-264``;
cooperative-groups whole-grid sync, ``optPar/GROUP-BlockPerElement.cu:124-160``;
the racy in-kernel loop, ``naivePar/FluidParallelError.cu:117-134``) and to
its shared-memory halo tiles (``smPar/...BlockPerElement-SM.cu:169-192``) —
VMEM is the shared memory, ``BlockSpec``/DMA is the halo staging, and the
boundary rule is fused into each sweep instead of separate ``boundaryGPU``
launches (``naivePar/...Interleaved-Naive.cu:390-454``).

Advection cannot use XLA/Mosaic gathers (lowered serially on TPU; measured
~40 ms at 2048²).  Instead the bilinear gather is decomposed into
(2C+1)² masked shift-accumulates over a VMEM-resident window — exact whenever
the backtrace displacement stays below C cells (``max_courant`` on
``SimConfig``; proof in ``ops/advect.py:advect_windowed``, the jnp
specification of this kernel.  The clamp to the window mirrors the
reference's own clamp to the box, ``FluidSequential.c:117-127``).

All kernels read/write full padded arrays with a valid ghost ring, so they
are drop-in replacements for the jnp ops, matching them to within FMA
contraction noise (~1 ulp per op; the per-element expression order is the
reference's, so agreement is ~1e-6 — the same class of difference the
reference accepted between CUDA and CPU, ``document/main.tex:349``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig
from .dispatch import OpSet

# Flipped to True by the test suite to run kernels in interpreter mode on CPU.
INTERPRET = False

_LANE = 128
_ADVECT_TM = 32  # advection strip height cap (static-unrolled gather stack is VMEM-bounded)
# This chip exposes far more VMEM than Mosaic's 16MB default scoped limit
# (96MB scratch verified working).  The sweep-window kernels (Jacobi /
# projection / fused dens) size against _SWEEP_BUDGET and raise their
# per-kernel scoped-vmem cap accordingly: taller strips amortize the
# sweeps+1 validity margin (512-row strips pay 1.09x redundant sweep rows
# vs 1.38x at 128 — measured 3.58 -> 3.02 ms/step at 2048^2/20it).  The
# advection gather kernels keep the conservative 11MB budget: their Mosaic
# stack (masked-shift accumulator chains) blows up far earlier than their
# buffer count suggests.
_VMEM_LIMIT = 48 * 2**20
_VMEM_BUDGET = 11 * 2**20
_SWEEP_BUDGET = 36 * 2**20
# Scoped-vmem cap for the sweep-window kernels (jacobi / projection / fused
# dens).  96MB scratch is verified working on this chip (same ceiling the
# 3-D kernels clamp to).  64MB was the round-3 default until the 8192²
# fused projection at chebyshev margins (iters=8 -> wr=160 strips) measured
# a real 71MB scoped need — windows 36MB + pipelined out blocks 16MB +
# Mosaic temps ~19MB — and compile-OOM'd; the gate's 7-buffer model
# (_SWEEP_BUDGET) still decides strip heights, this cap only stops the
# compiler from rejecting what the chip demonstrably runs.
_SWEEP_KERNEL_CAP = 96 * 2**20


def _cparams():
    if _VMEM_LIMIT is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _signs(b: int) -> tuple[float, float]:
    return (-1.0 if b == 1 else 1.0), (-1.0 if b == 2 else 1.0)


def _pick_tm(side: int) -> int | None:
    """Output strip height for the sweep-window kernels.  Whole-grid single
    strip when it fits VMEM; otherwise the TALLEST strip whose working set
    (6 sweep windows + pipelined out blocks + Mosaic stack) fits
    ``_SWEEP_BUDGET``, keeping >= 4 strips so input DMA still pipelines
    against compute.  Taller strips amortize the sweeps+1 validity margin
    (the redundant rows every fused-sweep window recomputes)."""
    if 8 * side * side * 4 <= 10 * 2**20:
        return side
    budget_rows = _SWEEP_BUDGET // (side * 4)
    # 6 sweep windows (2x2 double-buffered inputs + 2 ping-pong) + out
    # blocks; require room for at least an 8-row (7-sweep) fusion margin.
    for tm in (512, 256, 128, 64, 32):
        if side % tm == 0 and side // tm >= 4 and 8 * tm + 12 * 8 <= budget_rows:
            return tm
    for tm in (128, 64, 32):  # odd sides: accept fewer, shorter strips
        if side % tm == 0 and 8 * tm + 12 * 8 <= budget_rows:
            return tm
    return None


def _advect_tm(side: int, nf: int, cmax: int = 4, cap: int = None,
               st: int = 8) -> int | None:
    """Viable advection strip height, or None.  Mirrors the selection in
    ``_advect_call``: the strip must divide ``side``, be a multiple of the
    sublane tile ``st`` (blocked-spec row offsets), and its blocked windows
    + accumulators + Mosaic stack must fit the VMEM budget.

    The budget is window-aware: the Mosaic stack that bounds this kernel
    scales with the (2C+1)² unrolled term chain, so tiny windows (cmax=1,
    the audited headline) afford twice the buffer budget — without this,
    8192-wide grids fell to 8-row strips and the u/v pair kernel lost its
    viable height entirely (round-2's 8192² advect fallback)."""
    rows_per_tm = 36 if nf == 1 else 50
    budget = _VMEM_BUDGET * (2 if cmax <= 1 else 1)
    for cand in ((_ADVECT_TM if cap is None else cap), 128, 64, 32, 16, 8):
        if cand % st != 0:
            continue
        if side % cand == 0 and rows_per_tm * cand * side * 4 <= budget:
            return cand
    return None


def supports(cfg: SimConfig) -> bool:
    # side >= 128: full lane tiles (smaller grids trip Mosaic's (1,128)
    # tiling on column slices, and XLA handles them fine anyway).
    # side % sublane-tile == 0 (8 for f32, 16 for bf16): every kernel's
    # strip heights, sublane margins and DMA row offsets are tile-aligned,
    # and a tile-divisible side guarantees the advect/halo1 strip searches
    # find a divisor.  bf16 is a STORAGE format: HBM arrays and DMA move
    # bf16, all VMEM sweep/gather arithmetic runs f32 (`tpu.dynamic_rotate`
    # — every pltpu.roll — is unimplemented for bf16 in Mosaic, and the VPU
    # is f32-native so bf16 math would gain nothing; see docs/PERFORMANCE).
    import jax.numpy as jnp
    side = cfg.n + 2
    if cfg.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    st = _sub(cfg.dtype)
    return (
        cfg.ndim == 2
        and side >= 128
        and side % st == 0
        and _pick_tm(side) is not None
        # nf=2 (pair advection) needs no gate: make_opset falls back to two
        # single advects when the fused pair has no viable strip (8192^2).
        and _advect_tm(side, 1, st=st) is not None
    )


# ---------------------------------------------------------------------------
# Shared in-kernel boundary epilogue
# ---------------------------------------------------------------------------


def _apply_bnd_window(dst, b: int, start, wr: int, side: int,
                      corners: bool = True, signs=None):
    """Re-derive the ghost cells of the global grid that fall inside this
    window (rows [start, start+wr)) from the just-computed interior —
    ``set_bnd`` (``FluidSequential.c:62-75``) fused into the sweep.

    Corner cells are never read by the 5-point stencil, so multi-sweep
    kernels pass ``corners=False`` per sweep and fix them once at the end
    (the tiny 1x1 stores measurably dominate otherwise).

    ``signs`` overrides the static per-mode signs with traced (sx, sy)
    scalars — used by the batched u+v pair kernel, whose boundary mode
    varies with the batch index.
    """
    if signs is None:
        sx, sy = _signs(b)
    else:
        sx, sy = signs
    dt = dst.dtype
    sx = jnp.asarray(sx, dt)
    sy = jnp.asarray(sy, dt)

    # Ghost columns, all window rows (stale / wall rows fixed below).
    dst[:, 0:1] = sx * dst[:, 1:2]
    dst[:, side - 1 : side] = sx * dst[:, side - 2 : side - 1]

    @pl.when(start == 0)
    def _():
        dst[0:1, :] = sy * dst[1:2, :]

    @pl.when(start + wr == side)
    def _():
        dst[wr - 1 : wr, :] = sy * dst[wr - 2 : wr - 1, :]

    if corners:
        _apply_corners(dst, start, wr, side)


def _apply_corners(dst, start, wr: int, side: int):
    """Corner averaging (``FluidSequential.c:71-74``) for whichever global
    corners fall inside rows [start, start+wr).  1x1 slice stores (Mosaic
    cannot store scalars to VMEM)."""
    half = jnp.asarray(0.5, dst.dtype)

    @pl.when(start == 0)
    def _():
        dst[0:1, 0:1] = half * (dst[0:1, 1:2] + dst[1:2, 0:1])
        dst[0:1, side - 1 : side] = half * (
            dst[0:1, side - 2 : side - 1] + dst[1:2, side - 1 : side]
        )

    @pl.when(start + wr == side)
    def _():
        dst[wr - 1 : wr, 0:1] = half * (
            dst[wr - 1 : wr, 1:2] + dst[wr - 2 : wr - 1, 0:1]
        )
        dst[wr - 1 : wr, side - 1 : side] = half * (
            dst[wr - 1 : wr, side - 2 : side - 1]
            + dst[wr - 2 : wr - 1, side - 1 : side]
        )


# ---------------------------------------------------------------------------
# Fused-sweep Jacobi kernel (diffusion + pressure Poisson)
# ---------------------------------------------------------------------------


def _sub(dtype) -> int:
    """Sublane tile height for ``dtype``: (8, 128) for 4-byte types,
    (16, 128) for 2-byte (bf16 packs row pairs).  Every margin and DMA row
    offset must be a multiple of this."""
    return 8 if jnp.dtype(dtype).itemsize == 4 else 16


def _ceil_t(x: int, t: int) -> int:
    return -(-x // t) * t


def _ceil8(x: int) -> int:
    return _ceil_t(x, 8)


def _sweep_loop(sweep, buf_a, buf_b, sweeps: int, cheby_rho,
                w_start: float | None = None):
    """Run ``sweeps`` stencil applications between the ping-pong buffers.
    Returns ``(final, prev)`` — the refs holding the last iterate and the
    one before it (callers must slice from ``final``; the pre-round-4 copy
    that forced the result into ``buf_a`` is gone, it cost a full window
    copy at even Chebyshev counts).  ``sweep(src, dst, w)`` applies one
    Jacobi sweep: ``w is None`` -> ``dst = S(src)``; else (a traced f32
    scalar) -> the Chebyshev three-term update ``dst = w*S(src) +
    (1-w)*dst`` — dst holds x_{k-1} and is overwritten with x_{k+1}
    elementwise, so the recurrence needs NO third buffer (S reads only
    src).  The w schedule (``ops/chebyshev.py``: w_{k+1} =
    1/(1 - rho²w_k/4), w_1 = 2) is carried as a scalar through the fori
    loop, so sweeps stay a runtime loop — unrolling to bake the w's in as
    constants would inflate Mosaic sweep temporaries the way the 3-D probe
    measured (need ∝ unrolled sweeps).  Per-sweep validity margins are
    identical to plain Jacobi: each Chebyshev sweep reads a 1-ring of x_k
    plus x_{k-1} POINTWISE, and the older iterate is valid wherever the
    newer one is.

    ``w_start`` (static float) continues a recurrence that began in a
    PREVIOUS kernel call (the 2-D cross-call carry, ported from
    ``pallas_ops_3d._fused_jacobi3_cheby_call``): ``buf_a`` then holds
    x_k (DMA'd), ``buf_b`` holds x_{k-1} (DMA'd), and every sweep —
    including the first — is a three-term combine, with the w recurrence
    resuming from ``w_start``."""
    if cheby_rho is None:
        def double(_, c):
            sweep(buf_a, buf_b, None)
            sweep(buf_b, buf_a, None)
            return c

        jax.lax.fori_loop(0, sweeps // 2, double, 0)
        if sweeps % 2:
            sweep(buf_a, buf_b, None)
            return buf_b, buf_a
        return buf_a, buf_b

    q = jnp.float32(cheby_rho * cheby_rho * 0.25)
    one = jnp.float32(1.0)
    if w_start is None:
        sweep(buf_a, buf_b, None)  # x_1 = S(x_0); x_0 stays in buf_a
        cur, prev = buf_b, buf_a   # (x_1, x_0)
        w1 = one / (one - q * jnp.float32(2.0))  # w_2
        rem = sweeps - 1
    else:
        cur, prev = buf_a, buf_b   # (x_k, x_{k-1}) carried across calls
        w1 = jnp.float32(w_start)
        rem = sweeps

    def cheby_double(_, w):
        sweep(cur, prev, w)        # x_{k+1} over x_{k-1}
        w2 = one / (one - q * w)
        sweep(prev, cur, w2)
        return one / (one - q * w2)

    w_last = jax.lax.fori_loop(0, rem // 2, cheby_double, w1)
    if rem % 2:
        sweep(cur, prev, w_last)
        return prev, cur
    return cur, prev


def _jacobi_kernel(
    *refs,
    b, alpha: float, beta: float, sweeps: int,
    tm: int, wr: int, side: int, zero_init: bool, margin: int,
    nstrips: int, total: int, st: int = 8, nb1: int = 0,
    src_dt: float | None = None, fast: bool = False,
    damp: float | None = None, cheby_rho: float | None = None,
    carry_in: bool = False, carry_out: bool = False,
    w_start: float | None = None,
):
    # Grid is (batch, strips): batched simulations are independent grids
    # stacked on a leading axis (unbatched arrays are reshaped to B=1).
    # Input windows are double-buffered: while this strip sweeps, the next
    # strip's x/rhs windows stream in (the DMA wait was ~25% of the kernel).
    # xs2/rhs2 hold the HBM dtype (bf16 mode DMAs bf16); the work buffers
    # buf_b/buf_c are always f32 — Mosaic has no bf16 rotate, and sweeping
    # in f32 costs nothing extra on the f32-native VPU.
    #
    # Chebyshev cross-call carry (ported from the 3-D chain,
    # ``pallas_ops_3d._fused_jacobi3_cheby_call``): ``carry_in`` DMAs the
    # x_{k-1} window into the ping-pong partner so the three-term combine
    # continues across HBM round-trips (w recurrence resumed at the static
    # ``w_start``); ``carry_out`` writes BOTH final iterates so the next
    # chained call can keep the recurrence.
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
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    lin = bi * nstrips + gi
    slot = jax.lax.rem(lin, 2)

    def dmas(bi_, gi_, slot_):
        r0_ = gi_ * tm
        # margin is tile-aligned and >= sweeps+1, so offsets stay provably
        # tile-aligned (a Mosaic requirement for sublane slices).
        start_ = pl.multiple_of(jnp.clip(r0_ - margin, 0, side - wr), st)
        cps = [
            pltpu.make_async_copy(
                rhs_hbm.at[bi_, pl.ds(start_, wr), :], rhs2.at[slot_],
                sems.at[slot_, 0],
            )
        ]
        if not zero_init:
            cps.append(
                pltpu.make_async_copy(
                    x_hbm.at[bi_, pl.ds(start_, wr), :], xs2.at[slot_],
                    sems.at[slot_, 1],
                )
            )
        if carry_in:
            cps.append(
                pltpu.make_async_copy(
                    xm_hbm.at[bi_, pl.ds(start_, wr), :], xm2.at[slot_],
                    sems.at[slot_, 2],
                )
            )
        return cps

    @pl.when(lin == 0)
    def _():
        for cp in dmas(bi, gi, slot):
            cp.start()

    @pl.when(lin + 1 < total)
    def _():
        nlin = lin + 1
        nbi = nlin // nstrips
        ngi = jax.lax.rem(nlin, nstrips)
        for cp in dmas(nbi, ngi, jax.lax.rem(nlin, 2)):
            cp.start()

    for cp in dmas(bi, gi, slot):
        cp.wait()

    r0 = gi * tm
    start = pl.multiple_of(jnp.clip(r0 - margin, 0, side - wr), st)
    dt = buf_b.dtype
    rdt = rhs2.dtype
    if isinstance(b, tuple):
        # u+v pair mode: slabs [0, nb1) are boundary mode b[0], the rest
        # b[1] — signs selected by the batch program id.
        (sx1, sy1), (sx2, sy2) = _signs(b[0]), _signs(b[1])
        first = bi < nb1
        signs = (jnp.where(first, sx1, sx2).astype(dt),
                 jnp.where(first, sy1, sy2).astype(dt))
        b_bc = 0  # unused when signs are given
    else:
        signs = None
        b_bc = b
    if zero_init:
        buf_c[:] = jnp.zeros((wr, side), dt)
    else:
        buf_c[:] = xs2[slot].astype(dt)
    if carry_in:
        # x_{k-1}: dst of the first chained combine (the _sweep_loop
        # w_start invariant — every sweep including the first is a
        # three-term update over the carried iterate).
        buf_b[:] = xm2[slot].astype(dt)
    rhs_buf = rhs2.at[slot]
    inv_b = jnp.asarray(1.0 / beta, dt)
    if src_dt is not None:
        # Fused add_source (FluidSequential.c:78-82): the source window is
        # already resident as the Jacobi guess, so rhs = base + dt*src costs
        # one VMEM op and removes a whole XLA pass + HBM read.  The sum is
        # staged in-place in the rhs slot (consumed before the slot is
        # refilled two strips later; bf16 mode rounds it back to storage
        # precision — the rhs came from bf16 HBM anyway).
        src_term = jnp.asarray(src_dt, dt) * buf_c[:]
        if fast:
            rhs_buf[:] = ((rhs_buf[:] + src_term) * inv_b).astype(rdt)
        else:
            rhs_buf[:] = (rhs_buf[:] + src_term).astype(rdt)
    elif fast:
        rhs_buf[:] = (rhs_buf[:] * inv_b).astype(rdt)
    a_c = jnp.asarray(alpha, dt)
    ab_c = jnp.asarray(alpha / beta, dt)
    b_c = jnp.asarray(beta, dt)
    if damp is not None:
        w_c = jnp.asarray(damp, dt)
        omw_c = jnp.asarray(1.0 - damp, dt)

    def sweep(src, dst, w):
        # Fully-aligned formulation: static rolls instead of offset slices
        # (Mosaic inserts a relayout for every unaligned load/store; rolls
        # are single rotates — ~20% faster end to end).  Roll wrap-around
        # garbage lands in the window edge rows / ghost columns: ghost
        # columns and wall rows are re-derived by the BC right below, and
        # edge-row garbage propagates inward only 1 row per sweep — exactly
        # what the sweeps+1 validity margin covers.
        s = src[:]
        sL = pltpu.roll(s, 1, 1)
        sR = pltpu.roll(s, side - 1, 1)
        sU = pltpu.roll(s, 1, 0)
        sD = pltpu.roll(s, wr - 1, 0)
        neigh = ((sL + sR) + sU) + sD
        if fast:
            # rhs pre-scaled by 1/beta; one FMA instead of add+div.
            # ~1 ulp/sweep from the reference expression (opt-in).
            val = rhs_buf[:] + ab_c * neigh
        else:
            val = (rhs_buf[:] + a_c * neigh) / b_c
        if damp is not None:
            # Damped Jacobi (the multigrid smoother, ops/multigrid._smooth):
            # plain Jacobi leaves the checkerboard mode undamped.
            val = omw_c * s + w_c * val
        if w is None:
            dst[:] = val
        else:
            # Chebyshev three-term update (see _sweep_loop): dst holds
            # x_{k-1}, overwritten in place.
            wc = w.astype(dt)
            dst[:] = wc * val + (jnp.asarray(1.0, dt) - wc) * dst[:]
        # Corners deferred to the output epilogue: they are never stencil
        # inputs and the per-sweep 1x1 stores dominate the kernel otherwise.
        _apply_bnd_window(dst, b_bc, start, wr, side, corners=False,
                          signs=signs)

    final, prev = _sweep_loop(sweep, buf_c, buf_b, sweeps, cheby_rho,
                              w_start if carry_in else None)

    off = pl.multiple_of(r0 - start, st)
    ob = out_ref.at[0]
    ob[:] = final[pl.ds(off, tm), :].astype(out_ref.dtype)
    _apply_corners(ob, r0, tm, side)
    if carry_out:
        # x_{k+s-1} for the next chained call's combine.  Read POINTWISE
        # there (and its ghosts re-derived by that call's in-sweep BC), so
        # no corner fix is needed; validity at the output rows exceeds
        # final's by one sweep.
        op = outp_ref.at[0]
        op[:] = prev[pl.ds(off, tm), :].astype(outp_ref.dtype)


def _sweep_clamp(side: int, tm: int, dtype) -> int:
    """Max sweeps per fused-kernel call on a ``tm``-row strip: the fused
    window (tm + 2*ceil(k+1) rows) must fit inside the grid AND the
    6-window working set must fit VMEM."""
    st = _sub(dtype)
    margin_cap = ((side - tm) // 2) // st * st
    vmem_margin = ((_SWEEP_BUDGET // (side * 4) - 8 * tm) // 12) // st * st
    return max(1, min(margin_cap, max(vmem_margin, st)) - 1)


def cheby_max_iters(side: int, dtype=jnp.float32) -> int:
    """Largest Chebyshev sweep count a single fused kernel CALL can run at
    this grid side (the per-call VMEM margin clamp; 8192² clamps to 7).
    Solves past this no longer raise: ``fused_jacobi`` chains calls with
    the cross-call carry (both iterates written out, x_{k-1} DMA'd back
    in — the mechanism ported from the 3-D chain), at the cost of two
    extra HBM transfers per junction.  Returns 0 when the strip planner
    declines the side entirely."""
    tm = _pick_tm(side)
    if tm is None:
        return 0
    if tm == side:
        return 1 << 20  # whole grid in VMEM: no chaining, no clamp
    return _sweep_clamp(side, tm, dtype)


def fused_jacobi(
    b,
    x_init: jnp.ndarray,
    x0: jnp.ndarray,
    alpha: float,
    beta: float,
    iters: int,
    *,
    zero_init: bool = False,
    max_fused: int = 20,
    src_dt: float | None = None,
    fast: bool = False,
    nb1: int = 0,
    damp: float | None = None,
    cheby_rho: float | None = None,
) -> jnp.ndarray:
    """``iters`` Jacobi sweeps (semantics of ``ops.diffuse``) with up to
    ``max_fused`` sweeps per HBM round-trip.  ``zero_init`` skips loading the
    initial guess (pressure solve: p is zeroed, ``FluidSequential.c:153``).
    Accepts (side, side) or batched (B, side, side) arrays.  ``cheby_rho``
    switches to Chebyshev-accelerated sweeps (``ops/chebyshev.py``); the
    three-term recurrence spans ALL sweeps, so when the VMEM margin clamp
    forces chaining the chain carries x_{k-1} across calls (both iterates
    written per call, the x_{k-1} window DMA'd back in, the w recurrence
    resumed from a static ``w_start``) — the 2-D port of the 3-D
    cross-call carry (``pallas_ops_3d.fused_jacobi3``)."""
    assert not (cheby_rho is not None and damp is not None)
    side = x0.shape[-1]
    tm = _pick_tm(side)
    assert tm is not None, f"unsupported side {side}"

    x = x_init
    first = True
    remaining = iters
    if tm != side:
        max_fused = min(max_fused, _sweep_clamp(side, tm, x0.dtype))
    if src_dt is not None and iters > max_fused:
        # The in-kernel source fold only reaches the FIRST chunk's rhs;
        # chained chunks would sweep against a rhs missing dt*src (caught
        # as a 4e-2 divergence at 12 iters / max_fused=5).  Materialize the
        # rhs once instead — same arithmetic, one extra XLA pass, correct
        # for every chunk.  Callers can't gate this themselves: the VMEM
        # margin clamp above can shrink max_fused below their request
        # (8192² clamps 20 -> 7).
        x0 = x0 + jnp.asarray(src_dt, x0.dtype) * x
        src_dt = None
    if cheby_rho is not None and iters > max_fused:
        # Cross-call Chebyshev carry: chain segments, carrying BOTH
        # iterates across the junction and resuming the w recurrence from
        # the host-computed schedule (sweep k+1 after ``done`` sweeps uses
        # w_{done+1}; ``cheby_omegas`` returns w_2..w_iters).
        from ..ops.chebyshev import cheby_omegas

        om = cheby_omegas(float(cheby_rho), iters)
        xm = None
        done = 0
        while done < iters:
            s = min(iters - done, max_fused)
            last = done + s >= iters
            res = _fused_jacobi_call(
                b, x, x0, float(alpha), float(beta), s, tm, side,
                zero_init and done == 0, None, fast, nb1, None,
                float(cheby_rho), xm=xm, carry_in=xm is not None,
                carry_out=not last,
                w_start=None if done == 0 else float(om[done - 1]),
            )
            if last:
                x = res
            else:
                x, xm = res
            done += s
        return x
    while remaining > 0:
        k = min(remaining, max_fused)
        x = _fused_jacobi_call(
            b, x, x0, float(alpha), float(beta), k, tm, side,
            zero_init and first,
            float(src_dt) if (src_dt is not None and first) else None,
            fast, nb1, None if damp is None else float(damp),
            None if cheby_rho is None else float(cheby_rho),
        )
        first = False
        remaining -= k
    return x


@functools.partial(
    jax.jit, static_argnames=("b", "alpha", "beta", "sweeps", "tm", "side",
                              "zero_init", "src_dt", "fast", "nb1", "damp",
                              "cheby_rho", "carry_in", "carry_out",
                              "w_start")
)
def _fused_jacobi_call(b, x, x0, alpha, beta, sweeps, tm, side, zero_init,
                       src_dt=None, fast=False, nb1=0, damp=None,
                       cheby_rho=None, xm=None, carry_in=False,
                       carry_out=False, w_start=None):
    st = _sub(x0.dtype)
    if tm == side:
        wr = side  # whole grid in one window; margin condition is vacuous
        margin = 0
    else:
        margin = _ceil_t(sweeps + 1, st)
        wr = tm + 2 * margin
        assert wr <= side, "fused sweep window exceeds grid"
    squeeze = x0.ndim == 2
    if squeeze:
        x = x.reshape(1, side, side)
        x0 = x0.reshape(1, side, side)
        if xm is not None:
            xm = xm.reshape(1, side, side)
    nb = x0.shape[0]
    nstrips = side // tm
    kernel = functools.partial(
        _jacobi_kernel, b=b, alpha=alpha, beta=beta, sweeps=sweeps,
        tm=tm, wr=wr, side=side, zero_init=zero_init, margin=margin,
        nstrips=nstrips, total=nb * nstrips, st=st, nb1=nb1,
        src_dt=src_dt, fast=fast, damp=damp, cheby_rho=cheby_rho,
        carry_in=carry_in, carry_out=carry_out, w_start=w_start,
    )
    blk = pl.BlockSpec((1, tm, side), lambda bi, gi: (bi, gi, 0),
                       memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((nb, side, side), x0.dtype)
    scratch = [pltpu.VMEM((2, wr, side), x0.dtype)]
    if carry_in:  # xm2: the carried x_{k-1} windows (kernel arg order)
        scratch.append(pltpu.VMEM((2, wr, side), x0.dtype))
    scratch += [
        pltpu.VMEM((2, wr, side), x0.dtype),
        pltpu.VMEM((wr, side), jnp.float32),
        pltpu.VMEM((wr, side), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 3 if carry_in else 2)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(nb, nstrips),
        out_shape=(shp, shp) if carry_out else shp,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 if carry_in
                                                        else 2),
        out_specs=(blk, blk) if carry_out else blk,
        scratch_shapes=scratch,
        interpret=INTERPRET,
        # 8192-wide grids: 6 windows + pipelined out blocks + Mosaic stack
        # peak at ~50MB with 128-row strips; carried chebyshev calls add 2
        # xm windows + a second out stream (~68MB) — still under the same
        # raised per-kernel cap as the projection/dens kernels (96MB
        # scratch verified on this chip).
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_SWEEP_KERNEL_CAP
        ),
    )(*((x, xm, x0) if carry_in else (x, x0)))
    if carry_out:
        o, op = out
        if squeeze:
            return o.reshape(side, side), op.reshape(side, side)
        return o, op
    return out.reshape(side, side) if squeeze else out


def fused_jacobi_pair(
    b1: int,
    b2: int,
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    base1: jnp.ndarray,
    base2: jnp.ndarray,
    alpha: float,
    beta: float,
    iters: int,
    *,
    max_fused: int = 20,
    src_dt: float | None = None,
    fast: bool = False,
):
    """Two same-coefficient Jacobi solves with different boundary modes
    (the velocity pair, ``FluidSequential.c:228-229``) in ONE batched
    kernel: u and v stack on the leading batch axis and the in-sweep BC
    signs are selected per slab.

    MEASURED NEUTRAL-TO-SLOWER than two independent calls at 2048^2
    (1.16 vs 1.02 ms): the stacking concatenate copies both fields (XLA
    cannot alias a concat input) and the XLA scheduler already pipelines
    back-to-back pallas calls, so ``vel_step`` deliberately does NOT use
    this.  Kept as the per-slab-signs capability (bit-exact vs two
    singles, see tests) for callers whose operands are already stacked.
    Accepts (side, side) or batched (B, side, side) operands."""
    side = base1.shape[-1]
    unbatched = base1.ndim == 2
    if unbatched:
        s1 = s1.reshape(1, side, side)
        s2 = s2.reshape(1, side, side)
        base1 = base1.reshape(1, side, side)
        base2 = base2.reshape(1, side, side)
    nb = base1.shape[0]
    out = fused_jacobi(
        (b1, b2),
        jnp.concatenate([s1, s2]),
        jnp.concatenate([base1, base2]),
        alpha, beta, iters,
        max_fused=max_fused, src_dt=src_dt, fast=fast, nb1=nb,
    )
    o1, o2 = out[:nb], out[nb:]
    if unbatched:
        return o1.reshape(side, side), o2.reshape(side, side)
    return o1, o2


# ---------------------------------------------------------------------------
# Fused projection kernel: divergence -> pressure Poisson -> gradient
# ---------------------------------------------------------------------------


def _project_kernel(
    u_hbm, v_hbm, uout, vout, ubuf2, vbuf2, rhs_buf, p_a, p_b, sems,
    *, n: int, iters: int, tm: int, wr: int, side: int, margin: int,
    nstrips: int, total: int, st: int = 8,
    cheby_rho: float | None = None,
):
    """Whole projection (``FluidSequential.c:213-226``) in one kernel per
    strip: divergence computed in-window, ``iters`` pressure sweeps in VMEM,
    gradient subtraction as the epilogue.  Replaces three kernels and their
    HBM round-trips (div write/read, p write/read).

    Window-edge rows of the divergence are wrap-garbage; like the Jacobi
    sweep staleness, garbage propagates 1 row/sweep from the two edge rows,
    which the iters+3 margin covers (at walls the edge rows are the ghost
    ring, refreshed by the in-sweep BC — reference ``set_bnd(0, ...)``,
    ``FluidSequential.c:156-157``).

    The u/v input windows are double-buffered like the Jacobi kernel's:
    while this strip runs its pressure sweeps, the next strip's windows
    stream in (the serial DMA wait cost ~8%% of the kernel).
    """
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    lin = bi * nstrips + gi
    slot = jax.lax.rem(lin, 2)

    def dmas(bi_, gi_, slot_):
        start_ = pl.multiple_of(
            jnp.clip(gi_ * tm - margin, 0, side - wr), st
        )
        return [
            pltpu.make_async_copy(
                u_hbm.at[bi_, pl.ds(start_, wr), :], ubuf2.at[slot_],
                sems.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[bi_, pl.ds(start_, wr), :], vbuf2.at[slot_],
                sems.at[slot_, 1],
            ),
        ]

    @pl.when(lin == 0)
    def _():
        for cp in dmas(bi, gi, slot):
            cp.start()

    @pl.when(lin + 1 < total)
    def _():
        nlin = lin + 1
        for cp in dmas(nlin // nstrips, jax.lax.rem(nlin, nstrips),
                       jax.lax.rem(nlin, 2)):
            cp.start()

    for cp in dmas(bi, gi, slot):
        cp.wait()

    r0 = gi * tm
    start = pl.multiple_of(jnp.clip(r0 - margin, 0, side - wr), st)
    ubuf = ubuf2.at[slot]
    vbuf = vbuf2.at[slot]

    dt = rhs_buf.dtype
    h = jnp.asarray(1.0, dt) / n
    half = jnp.asarray(0.5, dt)

    # Divergence on the whole window via static rolls (wrap garbage at the
    # two window edge rows only — u/v interior rows are real HBM data).
    # bf16 mode: the windows arrive bf16; rolls and sweeps run f32.
    uu = ubuf[:].astype(dt)
    vv = vbuf[:].astype(dt)
    du = pltpu.roll(uu, side - 1, 1) - pltpu.roll(uu, 1, 1)
    dv = pltpu.roll(vv, wr - 1, 0) - pltpu.roll(vv, 1, 0)
    rhs_buf[:] = (jnp.asarray(-0.5, dt) * h) * (du + dv)
    _apply_bnd_window(rhs_buf, 0, start, wr, side, corners=False)

    # Pressure Poisson: alpha=1, beta=4, zero initial guess
    # (FluidSequential.c:153,218-220).
    p_a[:] = jnp.zeros((wr, side), dt)
    quarter = jnp.asarray(0.25, dt)

    def sweep(src, dst, w):
        sp = src[:]
        neigh = (
            (pltpu.roll(sp, 1, 1) + pltpu.roll(sp, side - 1, 1))
            + pltpu.roll(sp, 1, 0)
        ) + pltpu.roll(sp, wr - 1, 0)
        val = (rhs_buf[:] + neigh) * quarter
        if w is None:
            dst[:] = val
        else:  # Chebyshev three-term update (see _sweep_loop)
            wc = w.astype(dt)
            dst[:] = wc * val + (jnp.asarray(1.0, dt) - wc) * dst[:]
        _apply_bnd_window(dst, 0, start, wr, side, corners=False)

    p_fin, p_scr = _sweep_loop(sweep, p_a, p_b, iters, cheby_rho)

    # Gradient subtraction (lastProject, FluidSequential.c:161-173) on the
    # output strip.  Aligned ref reads (no dynamic_slice on values in
    # Mosaic); row-shifted views staged through the dead ping-pong partner.
    off = pl.multiple_of(r0 - start, st)
    p_c = p_fin[pl.ds(off, tm), :]
    p_scr[:] = pltpu.roll(p_fin[:], 1, 0)       # p[r-1] (up neighbor)
    p_up = p_scr[pl.ds(off, tm), :]
    p_scr[:] = pltpu.roll(p_fin[:], wr - 1, 0)  # p[r+1] (down neighbor)
    p_dn = p_scr[pl.ds(off, tm), :]
    dp = pltpu.roll(p_c, side - 1, 1) - pltpu.roll(p_c, 1, 1)
    u_c = ubuf[pl.ds(off, tm), :].astype(dt)
    v_c = vbuf[pl.ds(off, tm), :].astype(dt)
    uo, vo = uout.at[0], vout.at[0]
    uo[:] = (u_c - (half * dp) / h).astype(uout.dtype)
    vo[:] = (v_c - (half * (p_dn - p_up)) / h).astype(vout.dtype)
    _apply_bnd_window(uo, 1, r0, tm, side)
    _apply_bnd_window(vo, 2, r0, tm, side)


def fused_project_supported(side: int, iters: int, st: int = 8) -> bool:
    tm = _pick_tm(side)
    if tm is None:
        return False
    if tm == side:
        return True
    margin = _ceil_t(iters + 3, st)
    while 7 * (tm + 2 * margin) * side * 4 > _SWEEP_BUDGET and tm > 32:
        tm //= 2
    wr = tm + 2 * margin
    # Profitability: every strip re-sweeps its whole wr-row window, so once
    # the margin stops amortizing (VMEM-squeezed tm against a deep
    # iters-margin) the fused kernel does MORE sweep work than the
    # composition (divergence_p + chunked fused_jacobi + gradient_p, whose
    # chunks keep a ~1.1-1.4x ratio).  Measured at 8192^2/40it: fused tm=64
    # (ratio 2.5) ran 31.4 ms vs ~17.6 composed.
    if wr > (3 * tm) // 2:
        return False
    return 7 * wr * side * 4 <= _SWEEP_BUDGET and wr <= side


def fused_project(u, v, n: int, iters: int, *, cheby_rho=None):
    """Projection (div + pressure solve + gradient) as one Pallas kernel.
    ``cheby_rho`` switches the pressure sweeps to Chebyshev acceleration
    (``ops/chebyshev.py``); same window margins as plain Jacobi."""
    return _fused_project_call(
        u, v, n, iters, None if cheby_rho is None else float(cheby_rho))


@functools.partial(jax.jit, static_argnames=("n", "iters", "cheby_rho"))
def _fused_project_call(u, v, n, iters, cheby_rho=None):
    side = n + 2
    st = _sub(u.dtype)
    tm = _pick_tm(side)
    assert tm is not None
    if tm == side:
        margin = 0
        wr = side
    else:
        # 5 window buffers instead of 3: shrink the strip if needed.
        while 7 * (tm + 2 * _ceil_t(iters + 3, st)) * side * 4 > _SWEEP_BUDGET and tm > 32:
            tm //= 2
        margin = _ceil_t(iters + 3, st)
        wr = tm + 2 * margin
        if wr > side:
            # Small grid relative to iters: whole grid in one strip.
            tm, wr, margin = side, side, 0
    squeeze = u.ndim == 2
    if squeeze:
        u = u.reshape(1, side, side)
        v = v.reshape(1, side, side)
    nb = u.shape[0]
    nstrips = side // tm
    kernel = functools.partial(
        _project_kernel, n=n, iters=iters, tm=tm, wr=wr, side=side,
        margin=margin, nstrips=nstrips, total=nb * nstrips, st=st,
        cheby_rho=cheby_rho,
    )
    blk = pl.BlockSpec((1, tm, side), lambda bi, gi: (bi, gi, 0),
                       memory_space=pltpu.VMEM)
    uo, vo = pl.pallas_call(
        kernel,
        grid=(nb, nstrips),
        out_shape=(
            jax.ShapeDtypeStruct((nb, side, side), u.dtype),
            jax.ShapeDtypeStruct((nb, side, side), u.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(blk, blk),
        scratch_shapes=[
            pltpu.VMEM((2, wr, side), u.dtype),
            pltpu.VMEM((2, wr, side), u.dtype),
            pltpu.VMEM((wr, side), jnp.float32),
            pltpu.VMEM((wr, side), jnp.float32),
            pltpu.VMEM((wr, side), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=INTERPRET,
        # 512-row strips with double-buffered u/v windows + pipelined out
        # blocks need ~54MB of scoped VMEM at 2048^2/20it; raise the cap for
        # this kernel only (96MB scratch verified working on this chip, and
        # the tall strip measured faster than shrinking it to fit 16MB).
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_SWEEP_KERNEL_CAP
        ),
    )(u, v)
    if squeeze:
        return uo.reshape(side, side), vo.reshape(side, side)
    return uo, vo


# ---------------------------------------------------------------------------
# Advection kernel: semi-Lagrangian backtrace + masked-shift bilinear gather
# ---------------------------------------------------------------------------


def _advect_kernel(
    *refs,
    nf: int, bs: tuple, dt: float, n: int, tm: int, side: int,
    cmax: int, lpad: int, self_adv: bool, static_rows: bool,
):
    # Argument layout: per field 3 shifted blocks (rows r0-tm, r0, r0+tm);
    # then (u, v) center blocks unless self_adv (velocities are the fields
    # themselves); then nf out blocks; scratch: wbuf, g00, g01, g10, g11.
    blocks = refs[: 3 * nf]
    idx = 3 * nf
    if self_adv:
        u_ref, v_ref = blocks[1], blocks[4]
    else:
        u_ref, v_ref = refs[idx], refs[idx + 1]
        idx += 2
    out_refs = refs[idx : idx + nf]
    wbuf, g00, g01, g10, g11 = refs[idx + nf :]

    gi = pl.program_id(1)
    r0 = gi * tm

    # Gather math is ALWAYS f32, whatever the storage dtype: global row
    # indices up to side-1 are not representable in bf16 (spacing 16 at
    # 2048), and Mosaic has no bf16 rotate anyway.  bf16 inputs are
    # upcast as they enter the window; the blend result is cast back on
    # the way out.
    dtype = jnp.float32
    dt0 = jnp.asarray(dt, dtype) * n
    # Global coordinates of this strip's rows/cols.
    gr = (r0 + jax.lax.broadcasted_iota(jnp.int32, (tm, side), 0)).astype(dtype)
    gc = jax.lax.broadcasted_iota(jnp.int32, (tm, side), 1).astype(dtype)

    x = gc - dt0 * u_ref[0].astype(dtype)
    y = gr - dt0 * v_ref[0].astype(dtype)
    lo = jnp.asarray(0.5, dtype)
    hi = jnp.asarray(n + 0.5, dtype)
    x = jnp.clip(x, lo, hi)
    y = jnp.clip(y, lo, hi)
    # Window clamp (exact while displacement < cmax; proof in
    # ops/advect.py:advect_windowed).
    x = jnp.clip(x, gc - cmax, gc + cmax)
    y = jnp.clip(y, gr - cmax, gr + cmax)

    j0 = x.astype(jnp.int32)
    i0 = y.astype(jnp.int32)
    s1 = x - j0.astype(dtype)
    s0 = jnp.asarray(1.0, dtype) - s1
    t1 = y - i0.astype(dtype)
    t0 = jnp.asarray(1.0, dtype) - t1

    nshift = 2 * cmax + 1
    di = i0 - gr.astype(jnp.int32)  # in [-cmax, cmax]
    dj = j0 - gc.astype(jnp.int32)
    key = (di + cmax) * nshift + (dj + cmax)
    # Strip-local row-shift range (round 3): two scalar reductions bound
    # the rows the whole strip actually backtraces into; every row shift
    # outside [a_lo, a_hi] is skipped at run time under ``pl.when`` — the
    # masks there are provably all-false.  A smooth flow in a cmax=4
    # window typically activates 2-3 of the 9 row shifts, cutting the
    # (2C+1)^2 term cost toward (range_i)(2C+1) while staying bit-exact
    # (dropped terms contributed nothing).  Worst case (strip-local
    # displacement range spanning the full window) runs every term, plus
    # two scalar compares per shift.
    a_lo = jnp.min(di)
    a_hi = jnp.max(di)

    # The three shifted input blocks assemble a (3*tm)-row window in wbuf;
    # local row of global row g is g - r0 + tm.  Wall strips receive
    # duplicated (clamped) neighbor blocks — harmless, those rows are never
    # mask-selected (i0 stays in [0, n]).  The gather runs as a fori_loop
    # over row shifts (dynamic *sublane* roll — dynamic lane rotates are
    # log-cost, and a fully unrolled loop blows Mosaic's per-op stack
    # allocation past the 16MB VMEM) with static lane slices inside.  Four
    # corner accumulators share one mask compare per term; the bilinear
    # blend happens once per field after the gather, in the exact reference
    # expression order (FluidSequential.c:136-137), bit-matching the jnp
    # path.
    h3 = 3 * tm
    for f in range(nf):
        m1, c0, p1 = blocks[3 * f : 3 * f + 3]
        wbuf[0:tm, lpad : lpad + side] = m1[0].astype(dtype)
        wbuf[tm : 2 * tm, lpad : lpad + side] = c0[0].astype(dtype)
        wbuf[2 * tm : h3, lpad : lpad + side] = p1[0].astype(dtype)
        zero = jnp.zeros((tm, side), dtype)
        g00[:] = zero
        g01[:] = zero
        g10[:] = zero
        g11[:] = zero

        # Accumulate in VALUES across the static inner loop and write the
        # refs once per row shift (per-term ref read-modify-writes dominate
        # otherwise).  The outer row-shift loop is statically unrolled when
        # small: static sublane slices of wbuf replace dynamic rolls of the
        # whole window (the rolls moved ~7x more VMEM data than the slices).
        def row_body(a_idx, rows):
            # Iteratively lane-roll the window so every corner read is a
            # lane-ALIGNED slice (lpad is a multiple of 128); unaligned lane
            # slices cost a relayout per read.  q is rolled so that
            # q[:, lpad + c] == rows[:, lpad + c + (bbi - cmax)].
            v00, v01, v10, v11 = g00[:], g01[:], g10[:], g11[:]
            wide_ = rows.shape[-1]
            q = pltpu.roll(rows, cmax, 1)  # lane c reads c - cmax
            for bbi in range(nshift):
                t = a_idx * nshift + bbi
                m = key == t
                qn = pltpu.roll(q, wide_ - 1, 1)  # next shift (+1 lane src)
                v00 = jnp.where(m, q[0:tm, lpad : lpad + side], v00)
                v01 = jnp.where(m, qn[0:tm, lpad : lpad + side], v01)
                v10 = jnp.where(m, q[1 : tm + 1, lpad : lpad + side], v10)
                v11 = jnp.where(m, qn[1 : tm + 1, lpad : lpad + side], v11)
                q = qn
            g00[:] = v00
            g01[:] = v01
            g10[:] = v10
            g11[:] = v11

        if static_rows:
            for a_idx in range(nshift):
                a = a_idx - cmax

                @pl.when(jnp.logical_and(a_lo <= a, a <= a_hi))
                def _(a_idx=a_idx, a=a):
                    row_body(a_idx, wbuf[tm + a : 2 * tm + 1 + a, :])
        else:
            def row_term(a_idx, carry):
                a = a_idx - cmax

                @pl.when(jnp.logical_and(a_lo <= a, a <= a_hi))
                def _():
                    # Want roll by -(a_idx - cmax); compiled Mosaic
                    # mis-rotates NEGATIVE dynamic sublane shifts (reads
                    # land one block off, verified on hardware with a
                    # row-index tracer field), so normalize into [0, h3)
                    # first: (-a) mod h3.
                    shift = jax.lax.rem(h3 + cmax - a_idx, h3)
                    q = pltpu.roll(wbuf[0:h3, :], shift, 0)
                    row_body(a_idx, q[tm : 2 * tm + 1, :])

                return carry

            jax.lax.fori_loop(0, nshift, row_term, 0)

        ob = out_refs[f].at[0]
        ob[:] = (
            s0 * (t0 * g00[:] + t1 * g10[:])
            + s1 * (t0 * g01[:] + t1 * g11[:])
        ).astype(out_refs[f].dtype)
        _apply_bnd_window(ob, bs[f], r0, tm, side)


def advect_shift(
    b: int,
    d0: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    dt: float,
    n: int,
    *,
    cmax: int = 4,
) -> jnp.ndarray:
    """Semi-Lagrangian advection (semantics of ``ops.advect``,
    ``FluidSequential.c:107-141``) with in-VMEM masked-shift gather."""
    return _advect_call((b,), (d0,), float(dt), n, cmax, False, u, v)[0]


def advect_shift_fused(
    bs: tuple,
    d0s: tuple,
    u: jnp.ndarray,
    v: jnp.ndarray,
    dt: float,
    n: int,
    *,
    cmax: int = 4,
    self_advect: bool = False,
) -> tuple:
    """Advect several fields by the same velocity in one kernel (shared
    backtrace and gather masks) — used for the u/v self-advection pair
    (``FluidSequential.c:232,237``), where ``self_advect=True`` marks that
    the velocities ARE the two advected fields (saves two input streams)."""
    return _advect_call(
        tuple(bs), tuple(d0s), float(dt), n, cmax, self_advect, u, v
    )


@functools.partial(
    jax.jit, static_argnames=("bs", "dt", "n", "cmax", "self_adv")
)
def _advect_call(bs, d0s, dt, n, cmax, self_adv, u, v):
    nf = len(d0s)
    assert len(bs) == nf
    side = n + 2
    st = _sub(d0s[0].dtype)
    tm = _pick_tm(side)
    assert tm is not None
    # Strip height bounded by VMEM (blocked windows + accumulators + Mosaic
    # stack all scale with tm x nf x side); ~19/26 full-width rows of live
    # data per output row, empirically calibrated against the 16MB limit.
    tm = _advect_tm(side, nf, cmax, st=st)
    if tm is None:
        raise ValueError(f"advect: no viable strip height for side={side}")
    assert cmax + 1 <= tm
    lpad = _LANE  # lane offset so +-cmax column slices stay in bounds
    wide = side + 2 * _LANE
    nstrips = side // tm
    # Static row unroll keeps Mosaic stack ~ nshift^2 x strip bytes (the
    # unrolled term chain); beyond small windows/strips fall back to the
    # dynamic-roll fori loop (measured OOM at nshift=9, tm*side=32K rows).
    static_rows = (
        (2 * cmax + 1) <= 5 and tm * side * 4 <= 288 * 1024
    )
    kernel = functools.partial(
        _advect_kernel, nf=nf, bs=bs, dt=dt, n=n, tm=tm, side=side,
        cmax=cmax, lpad=lpad, self_adv=self_adv, static_rows=static_rows,
    )

    def blk(shift):
        if shift == 0:
            return pl.BlockSpec((1, tm, side), lambda bi, gi: (bi, gi, 0),
                                memory_space=pltpu.VMEM)
        if shift < 0:
            return pl.BlockSpec(
                (1, tm, side),
                lambda bi, gi: (bi, jnp.maximum(gi - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, tm, side),
            lambda bi, gi: (bi, jnp.minimum(gi + 1, nstrips - 1), 0),
            memory_space=pltpu.VMEM,
        )

    squeeze = d0s[0].ndim == 2
    if squeeze:
        d0s = tuple(d.reshape(1, side, side) for d in d0s)
        u = u.reshape(1, side, side)
        v = v.reshape(1, side, side)
    nb = d0s[0].shape[0]
    in_specs = []
    operands = []
    for d0 in d0s:
        in_specs += [blk(-1), blk(0), blk(+1)]
        operands += [d0, d0, d0]
    if not self_adv:
        in_specs += [blk(0), blk(0)]
        operands += [u, v]
    dtype = d0s[0].dtype
    out = pl.pallas_call(
        kernel,
        grid=(nb, nstrips),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, side, side), dtype) for _ in range(nf)
        ),
        in_specs=in_specs,
        out_specs=tuple(blk(0) for _ in range(nf)),
        scratch_shapes=[
            pltpu.VMEM((3 * tm, wide), jnp.float32),
            pltpu.VMEM((tm, side), jnp.float32),
            pltpu.VMEM((tm, side), jnp.float32),
            pltpu.VMEM((tm, side), jnp.float32),
            pltpu.VMEM((tm, side), jnp.float32),
        ],
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else _cparams(),
    )(*operands)
    out = out if isinstance(out, tuple) else (out,)
    if squeeze:
        out = tuple(o.reshape(side, side) for o in out)
    return out


# ---------------------------------------------------------------------------
# Fused density step: add_source -> diffuse -> advect in one kernel
# ---------------------------------------------------------------------------


def _dens_fused_kernel(
    src_hbm, base_hbm, u_ref, v_ref, out_ref, xs2, rhs2, buf_b, buf_c, g11b,
    wbuf, sems,
    *, b: int, alpha: float, beta: float, sweeps: int, tm: int, wr: int,
    side: int, margin: int, nstrips: int, total: int, n: int, dt: float,
    cmax: int, src_dt: float, fast: bool,
    cheby_rho: float | None = None,
):
    """The whole ``dens_step`` (``FluidSequential.c:176-186``) per strip:
    add_source folded into the Jacobi rhs, ``sweeps`` diffusion sweeps in
    VMEM, then the semi-Lagrangian gather reads the diffused field straight
    out of the sweep window — the diffused density never round-trips HBM.

    The gather needs rows ``r0-cmax .. r0+tm+cmax`` converged, so the window
    margin is ``ceil8(sweeps+1+cmax)`` (vs ``sweeps+1`` for plain Jacobi).
    One dynamic sublane roll stages the gather sub-window into ``wbuf`` with
    global row ``r0`` at STATIC local row 8, making every row-shift read a
    static ref slice (dynamic slices at non-8-aligned offsets would
    relayout, and per-shift full-window rolls kept too many window-sized
    values live for Mosaic's scoped-vmem stack; the roll is positive-
    normalized because negative dynamic sublane shifts mis-rotate in
    compiled Mosaic, see ``_advect_kernel``).  The four corner accumulators
    live in the Jacobi buffers that are dead after the final sweep (xs2/rhs2
    current slots, buf_b), so the fusion adds only ~two tm-row scratches.
    """
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    lin = bi * nstrips + gi
    slot = jax.lax.rem(lin, 2)

    def dmas(bi_, gi_, slot_):
        start_ = pl.multiple_of(
            jnp.clip(gi_ * tm - margin, 0, side - wr), 8
        )
        return [
            pltpu.make_async_copy(
                base_hbm.at[bi_, pl.ds(start_, wr), :], rhs2.at[slot_],
                sems.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                src_hbm.at[bi_, pl.ds(start_, wr), :], xs2.at[slot_],
                sems.at[slot_, 1],
            ),
        ]

    @pl.when(lin == 0)
    def _():
        for cp in dmas(bi, gi, slot):
            cp.start()

    @pl.when(lin + 1 < total)
    def _():
        nlin = lin + 1
        for cp in dmas(nlin // nstrips, jax.lax.rem(nlin, nstrips),
                       jax.lax.rem(nlin, 2)):
            cp.start()

    for cp in dmas(bi, gi, slot):
        cp.wait()

    r0 = gi * tm
    start = pl.multiple_of(jnp.clip(r0 - margin, 0, side - wr), 8)
    dtype = buf_b.dtype

    # --- Jacobi diffusion (semantics of _jacobi_kernel, src_dt path) ---
    buf_c[:] = xs2[slot]  # the source buffer is the Jacobi guess
    rhs_buf = rhs2.at[slot]
    inv_b = jnp.asarray(1.0 / beta, dtype)
    src_term = jnp.asarray(src_dt, dtype) * buf_c[:]
    if fast:
        rhs_buf[:] = (rhs_buf[:] + src_term) * inv_b
    else:
        rhs_buf[:] = rhs_buf[:] + src_term
    a_c = jnp.asarray(alpha, dtype)
    ab_c = jnp.asarray(alpha / beta, dtype)
    b_c = jnp.asarray(beta, dtype)

    def sweep(src, dst, w):
        s = src[:]
        sL = pltpu.roll(s, 1, 1)
        sR = pltpu.roll(s, side - 1, 1)
        sU = pltpu.roll(s, 1, 0)
        sD = pltpu.roll(s, wr - 1, 0)
        neigh = ((sL + sR) + sU) + sD
        if fast:
            val = rhs_buf[:] + ab_c * neigh
        else:
            val = (rhs_buf[:] + a_c * neigh) / b_c
        if w is None:
            dst[:] = val
        else:  # Chebyshev three-term update (see _sweep_loop)
            wc = w.astype(dtype)
            dst[:] = wc * val + (jnp.asarray(1.0, dtype) - wc) * dst[:]
        _apply_bnd_window(dst, b, start, wr, side, corners=False)

    final, prev = _sweep_loop(sweep, buf_c, buf_b, sweeps, cheby_rho)
    # Corner cells ARE bilinear gather sources (x,y clamp to 0.5 pulls
    # wall-adjacent backtraces onto the corner); fix them before gathering.
    _apply_corners(final, start, wr, side)

    # --- Semi-Lagrangian gather from the swept window ---
    dt0 = jnp.asarray(dt, dtype) * n
    gr = (r0 + jax.lax.broadcasted_iota(jnp.int32, (tm, side), 0)).astype(dtype)
    gc = jax.lax.broadcasted_iota(jnp.int32, (tm, side), 1).astype(dtype)
    x = gc - dt0 * u_ref[0]
    y = gr - dt0 * v_ref[0]
    lo = jnp.asarray(0.5, dtype)
    hi = jnp.asarray(n + 0.5, dtype)
    x = jnp.clip(jnp.clip(x, lo, hi), gc - cmax, gc + cmax)
    y = jnp.clip(jnp.clip(y, lo, hi), gr - cmax, gr + cmax)
    j0 = x.astype(jnp.int32)
    i0 = y.astype(jnp.int32)
    s1 = x - j0.astype(dtype)
    s0 = jnp.asarray(1.0, dtype) - s1
    t1 = y - i0.astype(dtype)
    t0 = jnp.asarray(1.0, dtype) - t1
    nshift = 2 * cmax + 1
    di = i0 - gr.astype(jnp.int32)
    key = (di + cmax) * nshift + (j0 - gc.astype(jnp.int32) + cmax)
    # Strip-local row-shift range — same run-time term skipping as
    # _advect_kernel (bit-exact; see the comment there).
    a_lo = jnp.min(di)
    a_hi = jnp.max(di)

    g00 = xs2.at[slot]   # dead since the guess was copied out
    g01 = rhs2.at[slot]  # dead after the final sweep
    g10 = prev           # the losing ping-pong buffer, dead after the sweeps
    g11 = g11b
    zero = jnp.zeros((tm, side), dtype)
    g00[0:tm, :] = zero
    g01[0:tm, :] = zero
    g10[0:tm, :] = zero
    g11[:] = zero
    off = r0 - start  # dynamic (edge strips clip), 8-aligned

    # One dynamic roll lands global row r0 at static local row 8 of wbuf.
    shift = jax.lax.rem(jnp.int32(wr) + 8 - off, jnp.int32(wr))
    wbuf[:] = pltpu.roll(final[:], shift, 0)[0 : tm + 16, :]

    for a_idx in range(nshift):
        a = a_idx - cmax

        def _term(a_idx=a_idx, a=a):
            v00, v01 = g00[0:tm, :], g01[0:tm, :]
            v10, v11 = g10[0:tm, :], g11[:]
            # Static (tm+1)-row slice: rows r0+a .. r0+a+tm; lane c reads
            # c-cmax.
            qq = pltpu.roll(wbuf[8 + a : 8 + a + tm + 1, :], cmax, 1)
            for bbi in range(nshift):
                m = key == (a_idx * nshift + bbi)
                qn = pltpu.roll(qq, side - 1, 1)  # next shift (+1 lane src)
                v00 = jnp.where(m, qq[0:tm, :], v00)
                v01 = jnp.where(m, qn[0:tm, :], v01)
                v10 = jnp.where(m, qq[1 : tm + 1, :], v10)
                v11 = jnp.where(m, qn[1 : tm + 1, :], v11)
                qq = qn
            g00[0:tm, :] = v00
            g01[0:tm, :] = v01
            g10[0:tm, :] = v10
            g11[:] = v11

        if cmax >= 2:
            # Run-time term skipping pays only for wide windows; at
            # cmax=1 (3 row terms) the scalar range compares + pl.when
            # scheduling measured a 0.1 ms regression on the 2048² fused
            # dens kernel (0.72 -> 0.82 ms, dev/bench_r3g.py round 3).
            pl.when(jnp.logical_and(a_lo <= a, a <= a_hi))(_term)
        else:
            _term()

    ob = out_ref.at[0]
    # Exact reference blend order (FluidSequential.c:136-137).
    ob[:] = s0 * (t0 * g00[0:tm, :] + t1 * g10[0:tm, :]) + s1 * (
        t0 * g01[0:tm, :] + t1 * g11[:]
    )
    _apply_bnd_window(ob, b, r0, tm, side)


def _dens_tm(side: int, iters: int, cmax: int) -> int | None:
    """Strip height for the fused dens kernel.  Its working set (6 sweep
    windows + 4 gather accumulators + staging + u/v/out strips) is ~40%
    larger than plain Jacobi's, so it picks its own height against the
    sweep budget rather than following ``_pick_tm``.

    Capability only — the dispatch-level profitability gate (window/strip
    ratio) lives in ``fused_dens_supported``."""
    base = _pick_tm(side)
    if base is None or base == side:
        return None  # whole-grid case: separate kernels are already fast
    margin = _ceil8(iters + 1 + cmax)
    for tm in (256, 128, 64, 32, 16, 8):
        if tm > base or side % tm != 0 or side // tm < 4:
            continue
        wr = tm + 2 * margin
        if wr <= side and (6 * wr + 8 * tm + 16) * side * 4 <= _SWEEP_BUDGET:
            return tm
    return None


def fused_dens_supported(side: int, iters: int, cmax: int) -> bool:
    """Dispatch gate: single-trip window must fit the grid, the staging
    buffer's static slices need ``cmax <= 7``, the working set must fit the
    raised scoped-vmem cap, AND the strip must amortize its margin
    (``tm >= 2*margin``): every strip re-sweeps its whole
    (tm + 2*margin)-row window, so a VMEM-squeezed short strip against a
    deep margin does MORE total sweep work than the unfused pair — measured
    at 8192^2/40it (tm=32 vs margin=48) the fusion regressed the step 22%."""
    if cmax > 7:
        return False
    tm = _dens_tm(side, iters, cmax)
    return tm is not None and tm >= 2 * _ceil8(iters + 1 + cmax)


def fused_dens_advect(
    b: int,
    src: jnp.ndarray,
    base: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    alpha: float,
    beta: float,
    iters: int,
    dt: float,
    n: int,
    *,
    cmax: int = 4,
    fast: bool = False,
    cheby_rho: float | None = None,
) -> jnp.ndarray:
    """``advect(b, diffuse_src(b, src, base, ...), u, v)`` in one kernel —
    the reference's back-to-back density pair (``FluidSequential.c:176-186``)
    without the HBM round-trip between them.  ``cheby_rho`` switches the
    diffusion sweeps to Chebyshev acceleration (``ops/chebyshev.py``)."""
    return _dens_fused_call(b, src, base, u, v, float(alpha), float(beta),
                            iters, float(dt), n, cmax, fast,
                            None if cheby_rho is None else float(cheby_rho))


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "iters", "dt", "n", "cmax",
                     "fast", "cheby_rho"),
)
def _dens_fused_call(b, src, base, u, v, alpha, beta, iters, dt, n, cmax,
                     fast, cheby_rho=None):
    side = n + 2
    assert base.dtype == jnp.float32, "fused dens kernel is f32-only"
    tm = _dens_tm(side, iters, cmax)
    assert tm is not None and tm != side
    assert 1 <= cmax <= 7, "staging-buffer static slices need cmax <= 7"
    margin = _ceil8(iters + 1 + cmax)
    wr = tm + 2 * margin
    assert wr <= side, "fused dens window exceeds grid"
    squeeze = base.ndim == 2
    if squeeze:
        src = src.reshape(1, side, side)
        base = base.reshape(1, side, side)
        u = u.reshape(1, side, side)
        v = v.reshape(1, side, side)
    nb = base.shape[0]
    nstrips = side // tm
    kernel = functools.partial(
        _dens_fused_kernel, b=b, alpha=alpha, beta=beta, sweeps=iters,
        tm=tm, wr=wr, side=side, margin=margin, nstrips=nstrips,
        total=nb * nstrips, n=n, dt=dt, cmax=cmax, src_dt=dt, fast=fast,
        cheby_rho=cheby_rho,
    )
    blk = pl.BlockSpec((1, tm, side), lambda bi, gi: (bi, gi, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb, nstrips),
        out_shape=jax.ShapeDtypeStruct((nb, side, side), base.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk,
            blk,
        ],
        out_specs=blk,
        scratch_shapes=[
            pltpu.VMEM((2, wr, side), base.dtype),
            pltpu.VMEM((2, wr, side), base.dtype),
            pltpu.VMEM((wr, side), base.dtype),
            pltpu.VMEM((wr, side), base.dtype),
            pltpu.VMEM((tm, side), base.dtype),
            pltpu.VMEM((tm + 16, side), base.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=INTERPRET,
        # Same story as the fused projection: the gather epilogue's live
        # values push the 20-iter working set past Mosaic's default 16MB
        # (~53MB at 2048^2/20it with the pipelined blocked u/v/out strips).
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_SWEEP_KERNEL_CAP
        ),
    )(src, base, u, v)
    return out.reshape(side, side) if squeeze else out


# ---------------------------------------------------------------------------
# Divergence and pressure-gradient kernels (1-halo stencils)
# ---------------------------------------------------------------------------


def _shifted_rows(m1, c0, p1, dt=jnp.float32):
    """Row-shifted views of the center block using neighbor blocks:
    up[r] = global row r0+r-1, down[r] = global row r0+r+1.  Wall strips get
    duplicated (clamped) neighbor rows — garbage that the BC epilogue
    overwrites.  Values are upcast to the f32 compute dtype (bf16 storage
    mode)."""
    cc = c0[:].astype(dt)
    up = jnp.concatenate([m1[-1:, :].astype(dt), cc[:-1, :]], axis=0)
    down = jnp.concatenate([cc[1:, :], p1[:1, :].astype(dt)], axis=0)
    return cc, up, down


def _lane_diff(x, side: int):
    """x[:, c+1] - x[:, c-1] with garbage edge lanes (BC-overwritten)."""
    return jnp.concatenate(
        [x[:, 1:2], x[:, 2:] - x[:, :-2], x[:, side - 2 : side - 1]], axis=1
    )


def _divergence_kernel(
    u_ref, v_m1, v_c, v_p1, out_ref, *, n: int, tm: int, side: int
):
    gi = pl.program_id(1)
    r0 = gi * tm
    dt = jnp.float32
    h = jnp.asarray(1.0, dt) / n
    _, v_up, v_dn = _shifted_rows(v_m1.at[0], v_c.at[0], v_p1.at[0])
    du = _lane_diff(u_ref[0].astype(dt), side)
    ob = out_ref.at[0]
    ob[:] = ((jnp.asarray(-0.5, dt) * h) * (du + (v_dn - v_up))).astype(
        out_ref.dtype
    )
    _apply_bnd_window(ob, 0, r0, tm, side)


def _gradient_kernel(
    p_m1, p_c, p_p1, u_ref, v_ref, uout, vout, *, n: int, tm: int, side: int
):
    gi = pl.program_id(1)
    r0 = gi * tm
    dt = jnp.float32
    h = jnp.asarray(1.0, dt) / n
    half = jnp.asarray(0.5, dt)
    pc, p_up, p_dn = _shifted_rows(p_m1.at[0], p_c.at[0], p_p1.at[0])
    dp = _lane_diff(pc, side)
    uo, vo = uout.at[0], vout.at[0]
    uo[:] = (u_ref[0].astype(dt) - (half * dp) / h).astype(uout.dtype)
    vo[:] = (v_ref[0].astype(dt) - (half * (p_dn - p_up)) / h).astype(
        vout.dtype
    )
    _apply_bnd_window(uo, 1, r0, tm, side)
    _apply_bnd_window(vo, 2, r0, tm, side)


def _halo1_specs(side: int, st: int = 8):
    """(tm, specs3) for a 1-halo stencil over row strips: three shifted
    blocked inputs per halo'd operand (auto-pipelined; no manual DMA).

    Strip height is capped independently of ``_pick_tm``: these kernels
    have no sweep margin to amortize (overhead is a fixed 2 halo rows), and
    Pallas double-buffers every blocked window, so gradient_p's 7 windows
    (x2 buffering) must fit the 48MB scoped cap — at 8192 wide that caps
    the strip at 64 rows (tm=128 hit a 56MB scoped-vmem compile error the
    moment the projection fell back to composition at this size)."""
    tm_cap = 128
    while tm_cap > st and 14 * tm_cap * side * 4 > 40 * 2**20:
        tm_cap //= 2
    tm = _pick_tm(side)
    if tm == side or tm > tm_cap or tm % st != 0:
        for cand in (128, 64, 32, 16, 8):
            if cand <= tm_cap and cand % st == 0 and side % cand == 0:
                tm = cand
                break
        else:
            raise ValueError(f"no strip height divides side={side}")
    nstrips = side // tm

    def blk(shift):
        if shift == 0:
            return pl.BlockSpec((1, tm, side), lambda bi, gi: (bi, gi, 0),
                                memory_space=pltpu.VMEM)
        if shift < 0:
            return pl.BlockSpec(
                (1, tm, side),
                lambda bi, gi: (bi, jnp.maximum(gi - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, tm, side),
            lambda bi, gi: (bi, jnp.minimum(gi + 1, nstrips - 1), 0),
            memory_space=pltpu.VMEM,
        )

    return tm, blk


@functools.partial(jax.jit, static_argnames=("n",))
def divergence_p(u, v, n):
    side = n + 2
    tm, blk = _halo1_specs(side, _sub(u.dtype))
    kernel = functools.partial(_divergence_kernel, n=n, tm=tm, side=side)
    squeeze = u.ndim == 2
    if squeeze:
        u = u.reshape(1, side, side)
        v = v.reshape(1, side, side)
    nb = u.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(nb, side // tm),
        out_shape=jax.ShapeDtypeStruct((nb, side, side), u.dtype),
        in_specs=[blk(0), blk(-1), blk(0), blk(+1)],
        out_specs=blk(0),
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else _cparams(),
    )(u, v, v, v)
    return out.reshape(side, side) if squeeze else out


@functools.partial(jax.jit, static_argnames=("n",))
def gradient_p(u, v, p, n):
    side = n + 2
    tm, blk = _halo1_specs(side, _sub(u.dtype))
    kernel = functools.partial(_gradient_kernel, n=n, tm=tm, side=side)
    squeeze = u.ndim == 2
    if squeeze:
        u = u.reshape(1, side, side)
        v = v.reshape(1, side, side)
        p = p.reshape(1, side, side)
    nb = u.shape[0]
    uo, vo = pl.pallas_call(
        kernel,
        grid=(nb, side // tm),
        out_shape=(
            jax.ShapeDtypeStruct((nb, side, side), u.dtype),
            jax.ShapeDtypeStruct((nb, side, side), u.dtype),
        ),
        in_specs=[blk(-1), blk(0), blk(+1), blk(0), blk(0)],
        out_specs=(blk(0), blk(0)),
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else _cparams(),
    )(p, p, p, u, v)
    if squeeze:
        return uo.reshape(side, side), vo.reshape(side, side)
    return uo, vo


# ---------------------------------------------------------------------------
# OpSet wiring
# ---------------------------------------------------------------------------


def make_opset(cfg: SimConfig) -> OpSet:
    # Interpreter mode (tests) has no Mosaic tiling limits; only gate the
    # compiled path.
    if not (INTERPRET or supports(cfg)):
        raise ValueError(
            f"pallas backend does not support side={cfg.n + 2} (ndim={cfg.ndim})"
        )
    cmax = getattr(cfg, "max_courant", 4)
    fuse = cfg.fuse_sweeps or 20
    fast = cfg.fast_math

    def diffuse(b, x_init, x0, alpha, beta, iters, cheby_rho=None):
        return fused_jacobi(b, x_init, x0, alpha, beta, iters,
                            max_fused=fuse, fast=fast, cheby_rho=cheby_rho)

    def diffuse_src(b, src, base, alpha, beta, iters, dt, cheby_rho=None):
        if iters <= fuse:
            # single chunk: add_source fused into the kernel's rhs
            return fused_jacobi(b, src, base, alpha, beta, iters,
                                max_fused=fuse, src_dt=dt, fast=fast,
                                cheby_rho=cheby_rho)
        rhs = base + jnp.asarray(dt, base.dtype) * src
        return fused_jacobi(b, src, rhs, alpha, beta, iters,
                            max_fused=fuse, fast=fast, cheby_rho=cheby_rho)

    def advect(b, d0, u, v, dt, n):
        return advect_shift(b, d0, u, v, dt, n, cmax=cmax)

    def advect_pair(b1, b2, d1, d2, u, v, dt, n):
        self_adv = d1 is u and d2 is v
        try:
            return advect_shift_fused(
                (b1, b2), (d1, d2), u, v, dt, n, cmax=cmax,
                self_advect=self_adv,
            )
        except ValueError:
            # no viable fused strip height (very wide grids): two singles
            return (
                advect_shift(b1, d1, u, v, dt, n, cmax=cmax),
                advect_shift(b2, d2, u, v, dt, n, cmax=cmax),
            )

    def divergence(u, v, n):
        return divergence_p(u, v, n)

    def pressure_solve(div, iters, cheby_rho=None):
        return fused_jacobi(
            0, div, div, 1.0, 4.0, iters, zero_init=True, max_fused=fuse,
            cheby_rho=cheby_rho,
        )

    def apply_pressure_gradient(u, v, p, n):
        return gradient_p(u, v, p, n)

    def project(u, v, n, iters, cheby_rho=None):
        # The gate must size margins with the same sublane tile the call
        # will use (16 for bf16) or gate and call can disagree on viability.
        if fused_project_supported(n + 2, iters, st=_sub(cfg.dtype)):
            return fused_project(u, v, n, iters, cheby_rho=cheby_rho)
        # Window too deep for this grid/iter combo: unfused composition.
        div = divergence_p(u, v, n)
        p = pressure_solve(div, iters, cheby_rho=cheby_rho)
        return gradient_p(u, v, p, n)

    def diffuse_advect(b, src, base, u, v, alpha, beta, iters, dt, n,
                       cheby_rho=None):
        # f32 only: the fused kernel's gather accumulators alias the bf16
        # DMA slots, and its staging rolls have no bf16 lowering; bf16 mode
        # composes the two (individually bf16-capable) kernels instead.
        if cfg.dtype == jnp.float32 and fused_dens_supported(
            n + 2, iters, cmax
        ):
            return fused_dens_advect(b, src, base, u, v, alpha, beta,
                                     iters, dt, n, cmax=cmax, fast=fast,
                                     cheby_rho=cheby_rho)
        d = diffuse_src(b, src, base, alpha, beta, iters, dt,
                        cheby_rho=cheby_rho)
        return advect(b, d, u, v, dt, n)

    return OpSet(
        diffuse=diffuse,
        advect=advect,
        divergence=divergence,
        pressure_solve=pressure_solve,
        apply_pressure_gradient=apply_pressure_gradient,
        advect_pair=advect_pair,
        project=project,
        diffuse_src=diffuse_src,
        diffuse_advect=diffuse_advect,
        # kernels/pallas_step.fused_advect_project is deliberately NOT an
        # OpSet hook: slope-measured at 2048^2/20it/cmax=1 the fused tail
        # runs 0.98 ms vs 0.82 ms for advect_pair + fused_project — the
        # (tm+2*margin)/tm sweep+gather redundancy at its VMEM-feasible
        # strip heights (tm<=256; tm=512 exceeds even the 96MB scoped cap)
        # costs more than the saved HBM round-trip.  Kept as a tested
        # capability; see docs/PERFORMANCE.md.
    )
