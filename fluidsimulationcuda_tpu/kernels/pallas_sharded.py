"""Pallas TPU kernels for the multi-chip (shard_map) path.

Per-shard compute for ``parallel.sharded``: each chip owns a full-width
*row slab* of the padded grid (1-D "x" decomposition; full-width slabs keep
the lane dimension whole — splitting columns would shrink VPU tiles and
re-introduce lane-boundary halos).  The glue code exchanges K-deep row halos
over ICI with ``lax.ppermute`` once per K fused Jacobi sweeps, then these
kernels run the sweeps entirely in VMEM — the chip-level version of the
single-chip kernels' fused-sweep margins (``pallas_ops.py``), which is itself
the chip-level generalization of the reference's CUDA-block halo tiles
(``smPar/FluidParallelBlockPerElement-SM.cu:169-192``).

SPMD note: ``shard_map`` traces ONE program for all shards, so the physical
wall boundary condition cannot be specialized statically per shard.  Kernels
take an ``(is_top, is_bot, row0)`` scalar vector (SMEM) and apply the wall
rows' ``set_bnd`` under ``pl.when`` predicates; ghost *columns* are owned by
every shard (full-width slabs) and handled exactly like the single-chip
kernels.  Wall-row positions inside a strip window stay provably 8-aligned
(8-aligned halo depths + 8-row block read-modify-write for the odd-offset
bottom ghost), which Mosaic requires for dynamic sublane slices.

Numerics are the same expressions in the same order as the jnp sharded path
(``parallel/sharded.py``) and the single-chip kernels, so the sharded-pallas
step differential-tests against both.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_ops
from .pallas_ops import (
    _VMEM_BUDGET,
    _LANE,
    _ceil8,
    _signs,
    _cparams,
    _sweep_loop,
)

__all__ = [
    "slab_supported",
    "fused_jacobi_slab",
    "fused_jacobi_slab_split",
    "jacobi_slab_split_viable",
    "fused_project_slab",
    "project_slab_supported",
    "project_slab_margin",
    "fused_dens_slab",
    "dens_slab_supported",
    "dens_slab_margin",
    "advect_slab",
    "advect_slab_tm",
    "divergence_slab",
    "gradient_slab",
]


def _interpret() -> bool:
    return pallas_ops.INTERPRET


def slab_supported(m: int, side: int) -> bool:
    """Can the compiled slab kernels run on an (m, side) local slab?"""
    return (
        side >= 128
        and side % 8 == 0
        and m % 8 == 0
        and _slab_tm(m, side, _ceil8(2)) is not None
        and advect_slab_tm(m, side, 1) is not None
    )


def _slab_tm(m: int, side: int, K: int) -> int | None:
    """Jacobi strip height: must divide the slab and keep the working set
    (6 double-buffered (tm+2K)-row windows + out blocks) within the sweep
    budget.  Tallest viable strip first — the sweeps+1 margin is a fixed
    cost per strip, so taller strips amortize it (the round-2 512-row
    retune, docs/PERFORMANCE.md finding 7), under the raised per-kernel
    scoped-vmem cap like the unsharded sweep kernels."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if (
            m % cand == 0
            and (6 * (cand + 2 * K) + 2 * cand) * side * 4
            <= pallas_ops._SWEEP_BUDGET
        ):
            return cand
    budget_ok = (6 * (m + 2 * K) + 2 * m) * side * 4 <= pallas_ops._SWEEP_BUDGET
    if budget_ok or _interpret():
        return m  # whole slab in one strip
    return None


def _slab_window_bc(dst, sx, sy, start, wr: int, side: int, is_top, is_bot,
                    gtop, gbot):
    """``set_bnd`` (edges only) on a (wr, side) window of the extended slab
    whose row 0 is ext row ``start``.  Ghost columns: every shard owns them
    (full-width slabs).  Wall ghost rows are dynamically predicated (one
    SPMD program); the 8-row block read-modify-write keeps dynamic sublane
    offsets 8-aligned (gtop-start is a multiple of 8; gbot-start is
    == 7 mod 8 so the block starts 7 rows above it)."""
    dst[:, 0:1] = sx * dst[:, 1:2]
    dst[:, side - 1 : side] = sx * dst[:, side - 2 : side - 1]

    @pl.when(is_top & (start <= gtop) & (gtop < start + wr))
    def _():
        kw = pl.multiple_of(gtop - start, 8)
        blk = dst[pl.ds(kw, 8), :]
        dst[pl.ds(kw, 8), :] = jnp.concatenate(
            [sy * blk[1:2, :], blk[1:8, :]], axis=0
        )

    @pl.when(is_bot & (start <= gbot) & (gbot < start + wr))
    def _():
        a0 = pl.multiple_of(gbot - 7 - start, 8)
        blk = dst[pl.ds(a0, 8), :]
        dst[pl.ds(a0, 8), :] = jnp.concatenate(
            [blk[0:7, :], sy * blk[6:7, :]], axis=0
        )


# ---------------------------------------------------------------------------
# Fused-sweep Jacobi on a halo-extended slab
# ---------------------------------------------------------------------------


def _jacobi_slab_kernel(
    flags_ref, x_hbm, rhs_hbm, out_ref, xs2, rhs2, buf_b, buf_c, sems,
    *, b: int, alpha: float, beta: float, sweeps: int,
    tm: int, wr: int, side: int, K: int, m: int, zero_init: bool,
    nstrips: int, fast: bool, cheby_rho: float | None = None,
):
    """K-margin fused sweeps over one strip of the extended slab.

    Extended-slab geometry (uniform for every strip — the K halo exactly
    equals the sweep margin, so window start is simply ``gi*tm``):
      ext rows [0,K) = upper halo | [K, K+m) = slab | [K+m, K+2K) = lower halo
      window  = ext rows [gi*tm, gi*tm + wr),  wr = tm + 2K
      output  = window rows [K, K+tm)  <-> slab rows [gi*tm, gi*tm+tm)
      wall ghost rows at ext K (top shard) / ext K+m-1 (bottom shard).
    """
    gi = pl.program_id(0)
    slot = jax.lax.rem(gi, 2)

    def dmas(gi_, slot_):
        start_ = pl.multiple_of(gi_ * tm, 8)
        cps = [
            pltpu.make_async_copy(
                rhs_hbm.at[pl.ds(start_, wr), :], rhs2.at[slot_],
                sems.at[slot_, 0],
            )
        ]
        if not zero_init:
            cps.append(
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(start_, wr), :], xs2.at[slot_],
                    sems.at[slot_, 1],
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

    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
    start = gi * tm
    dt = buf_b.dtype
    if zero_init:
        buf_c[:] = jnp.zeros((wr, side), dt)
    else:
        buf_c[:] = xs2[slot]
    rhs_buf = rhs2.at[slot]
    if fast:
        rhs_buf[:] = rhs_buf[:] * jnp.asarray(1.0 / beta, dt)
    a_c = jnp.asarray(alpha, dt)
    ab_c = jnp.asarray(alpha / beta, dt)
    b_c = jnp.asarray(beta, dt)
    sxf, syf = _signs(b)
    sx = jnp.asarray(sxf, dt)
    sy = jnp.asarray(syf, dt)
    gtop = K          # ext row of the global top ghost row
    gbot = K + m - 1  # ext row of the global bottom ghost row

    def bc(dst):
        _slab_window_bc(dst, sx, sy, start, wr, side, is_top, is_bot,
                        gtop, gbot)

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
        else:  # Chebyshev three-term update (pallas_ops._sweep_loop)
            wc = w.astype(dt)
            dst[:] = wc * val + (jnp.asarray(1.0, dt) - wc) * dst[:]
        bc(dst)

    final, _ = _sweep_loop(sweep, buf_c, buf_b, sweeps, cheby_rho)

    ob = out_ref
    ob[:] = final[pl.ds(K, tm), :]
    _slab_corners(ob, gi, tm, side, nstrips, is_top, is_bot)


def _slab_corners(ob, gi, tm: int, side: int, nstrips: int, is_top, is_bot):
    """Corner averaging (``FluidSequential.c:71-74``) for whichever global
    corners fall inside this output strip of a wall shard."""
    half = jnp.asarray(0.5, ob.dtype)

    @pl.when(is_top & (gi == 0))
    def _():
        ob[0:1, 0:1] = half * (ob[0:1, 1:2] + ob[1:2, 0:1])
        ob[0:1, side - 1 : side] = half * (
            ob[0:1, side - 2 : side - 1] + ob[1:2, side - 1 : side]
        )

    @pl.when(is_bot & (gi == nstrips - 1))
    def _():
        ob[tm - 1 : tm, 0:1] = half * (
            ob[tm - 1 : tm, 1:2] + ob[tm - 2 : tm - 1, 0:1]
        )
        ob[tm - 1 : tm, side - 1 : side] = half * (
            ob[tm - 1 : tm, side - 2 : side - 1]
            + ob[tm - 2 : tm - 1, side - 1 : side]
        )


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "sweeps", "m", "K", "zero_init",
                     "fast", "cheby_rho"),
)
def fused_jacobi_slab(
    b: int,
    x_ext: jnp.ndarray,
    rhs_ext: jnp.ndarray,
    flags: jnp.ndarray,
    *,
    m: int,
    K: int,
    alpha: float,
    beta: float,
    sweeps: int,
    zero_init: bool = False,
    fast: bool = False,
    cheby_rho: float | None = None,
) -> jnp.ndarray:
    """``sweeps`` Jacobi sweeps on an ``(m+2K, side)`` halo-extended slab.
    Requires ``K >= ceil8(sweeps+1)`` (halo = validity margin).  Returns the
    (m, side) slab.  ``cheby_rho`` switches the sweeps to Chebyshev
    acceleration (``ops/chebyshev.py``) — same margins, and the whole
    solve must fit in this one call (the three-term recurrence cannot be
    restarted across halo exchanges without carrying x_{k-1})."""
    me, side = rhs_ext.shape
    assert me == m + 2 * K, (me, m, K)
    assert K >= _ceil8(sweeps + 1) or _interpret()
    tm = _slab_tm(m, side, K)
    assert tm is not None, f"no viable slab strip for m={m}, side={side}"
    wr = tm + 2 * K
    nstrips = m // tm
    kernel = functools.partial(
        _jacobi_slab_kernel, b=b, alpha=float(alpha), beta=float(beta),
        sweeps=sweeps, tm=tm, wr=wr, side=side, K=K, m=m,
        zero_init=zero_init, nstrips=nstrips, fast=fast,
        cheby_rho=None if cheby_rho is None else float(cheby_rho),
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=jax.ShapeDtypeStruct((m, side), rhs_ext.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tm, side), lambda gi: (gi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wr, side), rhs_ext.dtype),
            pltpu.VMEM((2, wr, side), rhs_ext.dtype),
            pltpu.VMEM((wr, side), rhs_ext.dtype),
            pltpu.VMEM((wr, side), rhs_ext.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=_interpret(),
        # Tall (512-row) strips need the raised per-kernel scoped-vmem cap,
        # same as the unsharded sweep kernels (96MB scratch verified).
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=pallas_ops._SWEEP_KERNEL_CAP
        ),
    )(flags, x_ext, rhs_ext)


# ---------------------------------------------------------------------------
# Split-operand Jacobi slab: halos as separate refs, no ext concat
# ---------------------------------------------------------------------------


def jacobi_slab_split_viable(m: int, side: int, K: int) -> bool:
    """The 3-piece window DMA needs tm >= K (only the first/last strips
    then touch the halo refs)."""
    tm = _slab_tm(m, side, K)
    return tm is not None and tm >= K


def _jacobi_slab_split_kernel(
    flags_ref, x_top, x_hbm, x_bot, rhs_top, rhs_hbm, rhs_bot,
    out_ref, xs2, rhs2, buf_b, buf_c, sems,
    *, b: int, alpha: float, beta: float, sweeps: int,
    tm: int, wr: int, side: int, K: int, m: int, zero_init: bool,
    nstrips: int, fast: bool,
):
    """``_jacobi_slab_kernel`` with the halo-extended operand REPLACED by
    (top, slab, bottom) refs: the jnp-level ``concatenate`` that assembled
    the extended slab materialized a full HBM copy per solve (the
    round-3-measured residual of the sharded path).  Each strip's window
    is three fixed-size DMAs — K | tm | K rows — whose K-row pieces come
    from the halo refs on the first/last strip (``pl.when``-selected
    source, unconditional wait: both variants move identical bytes on the
    same semaphore).  Requires tm >= K so interior strips never touch the
    halo refs."""
    gi = pl.program_id(0)
    slot = jax.lax.rem(gi, 2)

    def start_dmas(gi_, slot_):
        start_ = pl.multiple_of(gi_ * tm, 8)
        ops = [(rhs_top, rhs_hbm, rhs_bot, rhs2, 0)]
        if not zero_init:
            ops.append((x_top, x_hbm, x_bot, xs2, 1))
        for top, slab, bot, buf2, oi in ops:
            # P2: center tm rows, always from the slab.
            pltpu.make_async_copy(
                slab.at[pl.ds(start_, tm)],
                buf2.at[slot_, pl.ds(K, tm)],
                sems.at[slot_, oi, 1],
            ).start()

            # P1: leading K rows.
            @pl.when(gi_ == 0)
            def _(top=top, buf2=buf2, oi=oi):
                pltpu.make_async_copy(
                    top, buf2.at[slot_, pl.ds(0, K)], sems.at[slot_, oi, 0]
                ).start()

            @pl.when(gi_ > 0)
            def _(slab=slab, buf2=buf2, oi=oi, start_=start_):
                pltpu.make_async_copy(
                    slab.at[pl.ds(pl.multiple_of(start_ - K, 8), K)],
                    buf2.at[slot_, pl.ds(0, K)], sems.at[slot_, oi, 0],
                ).start()

            # P3: trailing K rows.
            @pl.when(gi_ == nstrips - 1)
            def _(bot=bot, buf2=buf2, oi=oi):
                pltpu.make_async_copy(
                    bot, buf2.at[slot_, pl.ds(K + tm, K)],
                    sems.at[slot_, oi, 2],
                ).start()

            @pl.when(gi_ < nstrips - 1)
            def _(slab=slab, buf2=buf2, oi=oi, start_=start_):
                pltpu.make_async_copy(
                    slab.at[pl.ds(pl.multiple_of(start_ + tm, 8), K)],
                    buf2.at[slot_, pl.ds(K + tm, K)],
                    sems.at[slot_, oi, 2],
                ).start()

    def wait_dmas(slot_):
        ops = [(rhs_top, rhs_hbm, rhs2, 0)]
        if not zero_init:
            ops.append((x_top, x_hbm, xs2, 1))
        for top, slab, buf2, oi in ops:
            # Waits keyed on (sem, byte count) — source choice irrelevant.
            pltpu.make_async_copy(
                top, buf2.at[slot_, pl.ds(0, K)], sems.at[slot_, oi, 0]
            ).wait()
            pltpu.make_async_copy(
                slab.at[pl.ds(0, tm)], buf2.at[slot_, pl.ds(K, tm)],
                sems.at[slot_, oi, 1],
            ).wait()
            pltpu.make_async_copy(
                top, buf2.at[slot_, pl.ds(K + tm, K)],
                sems.at[slot_, oi, 2],
            ).wait()

    @pl.when(gi == 0)
    def _():
        start_dmas(gi, slot)

    @pl.when(gi + 1 < nstrips)
    def _():
        start_dmas(gi + 1, jax.lax.rem(gi + 1, 2))

    wait_dmas(slot)

    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
    start = gi * tm
    dt = buf_b.dtype
    if zero_init:
        buf_c[:] = jnp.zeros((wr, side), dt)
    else:
        buf_c[:] = xs2[slot]
    rhs_buf = rhs2.at[slot]
    if fast:
        rhs_buf[:] = rhs_buf[:] * jnp.asarray(1.0 / beta, dt)
    a_c = jnp.asarray(alpha, dt)
    ab_c = jnp.asarray(alpha / beta, dt)
    b_c = jnp.asarray(beta, dt)
    sxf, syf = _signs(b)
    sx = jnp.asarray(sxf, dt)
    sy = jnp.asarray(syf, dt)
    gtop = K
    gbot = K + m - 1

    def sweep(src, dst):
        s = src[:]
        sL = pltpu.roll(s, 1, 1)
        sR = pltpu.roll(s, side - 1, 1)
        sU = pltpu.roll(s, 1, 0)
        sD = pltpu.roll(s, wr - 1, 0)
        neigh = ((sL + sR) + sU) + sD
        if fast:
            dst[:] = rhs_buf[:] + ab_c * neigh
        else:
            dst[:] = (rhs_buf[:] + a_c * neigh) / b_c
        _slab_window_bc(dst, sx, sy, start, wr, side, is_top, is_bot,
                        gtop, gbot)

    def double_sweep(_, carry):
        sweep(buf_c, buf_b)
        sweep(buf_b, buf_c)
        return carry

    jax.lax.fori_loop(0, sweeps // 2, double_sweep, 0)
    if sweeps % 2:
        sweep(buf_c, buf_b)
        buf_c[:] = buf_b[:]

    ob = out_ref
    ob[:] = buf_c[pl.ds(K, tm), :]
    _slab_corners(ob, gi, tm, side, nstrips, is_top, is_bot)


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "sweeps", "m", "K", "zero_init",
                     "fast"),
)
def fused_jacobi_slab_split(
    b: int,
    x: jnp.ndarray,
    x_top: jnp.ndarray,
    x_bot: jnp.ndarray,
    rhs: jnp.ndarray,
    rhs_top: jnp.ndarray,
    rhs_bot: jnp.ndarray,
    flags: jnp.ndarray,
    *,
    m: int,
    K: int,
    alpha: float,
    beta: float,
    sweeps: int,
    zero_init: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """``fused_jacobi_slab`` taking (slab, top-halo, bottom-halo) operand
    triples instead of pre-concatenated extended slabs.  Halos are (K,
    side) arrays straight from the ppermute exchange."""
    side = rhs.shape[-1]
    assert rhs.shape == (m, side) and rhs_top.shape == (K, side)
    assert K >= _ceil8(sweeps + 1) or _interpret()
    tm = _slab_tm(m, side, K)
    assert tm is not None and tm >= K, (tm, K)
    wr = tm + 2 * K
    nstrips = m // tm
    kernel = functools.partial(
        _jacobi_slab_split_kernel, b=b, alpha=float(alpha),
        beta=float(beta), sweeps=sweeps, tm=tm, wr=wr, side=side, K=K, m=m,
        zero_init=zero_init, nstrips=nstrips, fast=fast,
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=jax.ShapeDtypeStruct((m, side), rhs.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec((tm, side), lambda gi: (gi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wr, side), rhs.dtype),
            pltpu.VMEM((2, wr, side), rhs.dtype),
            pltpu.VMEM((wr, side), rhs.dtype),
            pltpu.VMEM((wr, side), rhs.dtype),
            pltpu.SemaphoreType.DMA((2, 2, 3)),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=pallas_ops._SWEEP_KERNEL_CAP
        ),
    )(flags, x_top, x, x_bot, rhs_top, rhs, rhs_bot)


# ---------------------------------------------------------------------------
# Fused projection on a halo-extended slab (div + sweeps + gradient)
# ---------------------------------------------------------------------------


def project_slab_margin(iters: int) -> int:
    """Halo/margin depth for the fused projection: the in-window divergence
    has garbage on the 2 window edge rows, each sweep propagates it 1 row,
    and the gradient reads 1 more (same accounting as the unsharded
    ``pallas_ops._project_kernel`` margin)."""
    return _ceil8(iters + 3)


def _proj_slab_tm(m: int, side: int, K: int) -> int | None:
    """Strip height for the fused projection slab kernel: 7 (wr, side)
    window buffers (2x2 double-buffered u/v inputs + rhs + p ping-pong)
    + pipelined out blocks, with the profitability guard of
    ``pallas_ops.fused_project_supported`` (wr <= 1.5*tm, or the margin
    redundancy out-costs the saved HBM round-trips)."""
    # 7 wr-row window buffers, same accounting as the unsharded
    # _fused_project_call (tm=512 verified under the 64MB cap at 2048²).
    for cand in (512, 256, 128, 64, 32, 16, 8):
        wr = cand + 2 * K
        if (
            m % cand == 0
            and wr <= 3 * cand // 2
            and 7 * wr * side * 4 <= pallas_ops._SWEEP_BUDGET
        ):
            return cand
    if _interpret():
        return m  # whole slab in one strip (profitability is perf-only)
    return None


def project_slab_supported(m: int, side: int, iters: int) -> bool:
    K = project_slab_margin(iters)
    # K <= m: the halo exchange sources K rows from the ADJACENT shard
    # (x[-K:] / x[:K]); deeper-than-slab halos would need multi-hop
    # exchange, which the margin scheme deliberately avoids.
    return K <= m and _proj_slab_tm(m, side, K) is not None


def _project_slab_kernel(
    flags_ref, u_hbm, v_hbm, uout, vout, ubuf2, vbuf2, rhs_buf, p_a, p_b,
    sems,
    *, n: int, iters: int, tm: int, wr: int, side: int, K: int, m: int,
    nstrips: int, cheby_rho: float | None = None,
):
    """Whole projection (``FluidSequential.c:213-226``) in one kernel per
    strip of the K-extended slab — the SPMD port of
    ``pallas_ops._project_kernel``: divergence computed in-window from the
    u/v windows, ``iters`` pressure sweeps in VMEM, gradient subtraction as
    the epilogue.  Replaces three slab kernels (divergence, Jacobi,
    gradient) AND their three separate halo exchanges with ONE K-deep
    u/v exchange: p never leaves VMEM, div never touches HBM.

    Geometry is uniform like ``_jacobi_slab_kernel`` (halo == margin):
    window = ext rows [gi*tm, gi*tm + wr), wr = tm + 2K, output rows at
    static window offset K.  Validity: ext-edge garbage propagates 1
    row/sweep from the 2 window edge rows; K >= iters+3 covers
    divergence + iters sweeps + gradient.
    """
    gi = pl.program_id(0)
    slot = jax.lax.rem(gi, 2)

    def dmas(gi_, slot_):
        start_ = pl.multiple_of(gi_ * tm, 8)
        return [
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(start_, wr), :], ubuf2.at[slot_],
                sems.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(start_, wr), :], vbuf2.at[slot_],
                sems.at[slot_, 1],
            ),
        ]

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

    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
    start = gi * tm
    gtop = K
    gbot = K + m - 1
    dt = rhs_buf.dtype
    one = jnp.asarray(1.0, dt)
    h = one / n
    half = jnp.asarray(0.5, dt)
    ubuf = ubuf2.at[slot]
    vbuf = vbuf2.at[slot]

    # Divergence on the whole window via static rolls (wrap garbage on the
    # 2 window edge rows only — covered by the margin).
    uu = ubuf[:]
    vv = vbuf[:]
    du = pltpu.roll(uu, side - 1, 1) - pltpu.roll(uu, 1, 1)
    dv = pltpu.roll(vv, wr - 1, 0) - pltpu.roll(vv, 1, 0)
    rhs_buf[:] = (jnp.asarray(-0.5, dt) * h) * (du + dv)
    _slab_window_bc(rhs_buf, one, one, start, wr, side, is_top, is_bot,
                    gtop, gbot)

    # Pressure Poisson: alpha=1, beta=4, zero initial guess.
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
        else:  # Chebyshev three-term update (pallas_ops._sweep_loop)
            wc = w.astype(dt)
            dst[:] = wc * val + (jnp.asarray(1.0, dt) - wc) * dst[:]
        _slab_window_bc(dst, one, one, start, wr, side, is_top, is_bot,
                        gtop, gbot)

    p_fin, p_scr = _sweep_loop(sweep, p_a, p_b, iters, cheby_rho)

    # Gradient subtraction (lastProject, FluidSequential.c:161-173) on the
    # output strip at static window offset K.
    p_c = p_fin[K : K + tm, :]
    p_scr[:] = pltpu.roll(p_fin[:], 1, 0)       # p[r-1] (up neighbor)
    p_up = p_scr[K : K + tm, :]
    p_scr[:] = pltpu.roll(p_fin[:], wr - 1, 0)  # p[r+1] (down neighbor)
    p_dn = p_scr[K : K + tm, :]
    dp = pltpu.roll(p_c, side - 1, 1) - pltpu.roll(p_c, 1, 1)
    u_c = ubuf[K : K + tm, :]
    v_c = vbuf[K : K + tm, :]
    uout[:] = u_c - (half * dp) / h
    vout[:] = v_c - (half * (p_dn - p_up)) / h
    _apply_bnd_slab_block(uout, 1, gi, tm, side, nstrips, is_top, is_bot)
    _apply_bnd_slab_block(vout, 2, gi, tm, side, nstrips, is_top, is_bot)


@functools.partial(jax.jit,
                   static_argnames=("n", "iters", "m", "K", "cheby_rho"))
def fused_project_slab(u_ext, v_ext, flags, *, n: int, iters: int, m: int,
                       K: int, cheby_rho: float | None = None):
    """Projection (div + ``iters``-sweep pressure solve + gradient) on
    (m+2K, side) halo-extended slabs in one kernel; returns (u, v) slabs.
    Requires ``K == project_slab_margin(iters)``.  ``cheby_rho`` switches
    the pressure sweeps to Chebyshev acceleration (``ops/chebyshev.py``)."""
    me, side = u_ext.shape
    assert me == m + 2 * K, (me, m, K)
    assert K >= iters + 3 or _interpret()
    tm = _proj_slab_tm(m, side, K)
    assert tm is not None, f"no viable projection strip for m={m}, side={side}"
    wr = tm + 2 * K
    nstrips = m // tm
    kernel = functools.partial(
        _project_slab_kernel, n=n, iters=iters, tm=tm, wr=wr, side=side,
        K=K, m=m, nstrips=nstrips,
        cheby_rho=None if cheby_rho is None else float(cheby_rho),
    )
    blk = pl.BlockSpec((tm, side), lambda gi: (gi, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=(
            jax.ShapeDtypeStruct((m, side), u_ext.dtype),
            jax.ShapeDtypeStruct((m, side), u_ext.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(blk, blk),
        scratch_shapes=[
            pltpu.VMEM((2, wr, side), u_ext.dtype),
            pltpu.VMEM((2, wr, side), u_ext.dtype),
            pltpu.VMEM((wr, side), jnp.float32),
            pltpu.VMEM((wr, side), jnp.float32),
            pltpu.VMEM((wr, side), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=pallas_ops._SWEEP_KERNEL_CAP
        ),
    )(flags, u_ext, v_ext)


# ---------------------------------------------------------------------------
# Fused density pair on a halo-extended slab (src + diffuse + advect)
# ---------------------------------------------------------------------------


def dens_slab_margin(iters: int, cmax: int) -> int:
    """Halo/margin depth for the fused dens kernel: the gather reads the
    diffused field ``cmax`` rows beyond the output strip, so those rows
    must be converged too (same accounting as ``pallas_ops._dens_tm``)."""
    return _ceil8(iters + 1 + cmax)


def _dens_slab_tm(m: int, side: int, K: int) -> int | None:
    """Strip height for the fused dens slab kernel (6 sweep windows + 4
    gather accumulators + staging + u/v/out strips), with the
    margin-amortization guard ``tm >= 2*K`` of
    ``pallas_ops.fused_dens_supported``."""
    # Coefficients are EMPIRICAL: the unsharded _dens_tm formula
    # (6*wr + 8*tm + 16 rows) undercounts this kernel's compiled footprint
    # ~2x (measured 66.13M scoped vs 32.6M estimated at tm=256/side=2048 —
    # the SPMD wall-BC/corner predication keeps more window-sized values
    # live through the gather chain), so the row weights are doubled and
    # checked against the RAISED 80MB cap this kernel compiles with
    # (96MB scratch verified on this part; tm=256 at 2048² compiles at
    # 66.1M and beats tm=128's 1.5x margin redundancy).
    for cand in (256, 128, 64, 32, 16, 8):
        wr = cand + 2 * K
        if (
            m % cand == 0
            and cand >= 2 * K
            and (12 * wr + 16 * cand + 32) * side * 4 <= _DENS_SLAB_CAP - 8 * 2**20
        ):
            return cand
    if _interpret():
        return m
    return None


_DENS_SLAB_CAP = 80 * 2**20


def dens_slab_supported(m: int, side: int, iters: int, cmax: int) -> bool:
    if cmax > 7:  # staging-buffer static slices need cmax <= 7
        return False
    K = dens_slab_margin(iters, cmax)
    return K <= m and _dens_slab_tm(m, side, K) is not None


def _slab_window_corners(dst, start, wr: int, side: int, is_top, is_bot,
                         gtop, gbot):
    """Corner averaging (``FluidSequential.c:71-74``) on a swept window —
    needed pre-gather because corners ARE bilinear gather sources (the
    backtrace clamp pulls wall-adjacent cells onto them).  Same 8-row
    block read-modify-write alignment trick as ``_slab_window_bc``."""
    half = jnp.asarray(0.5, dst.dtype)

    @pl.when(is_top & (start <= gtop) & (gtop < start + wr))
    def _():
        kw = pl.multiple_of(gtop - start, 8)
        blk = dst[pl.ds(kw, 8), :]
        r0, r1 = blk[0:1, :], blk[1:2, :]
        new0 = jnp.concatenate(
            [
                half * (r0[:, 1:2] + r1[:, 0:1]),
                r0[:, 1 : side - 1],
                half * (r0[:, side - 2 : side - 1] + r1[:, side - 1 : side]),
            ],
            axis=1,
        )
        dst[pl.ds(kw, 8), :] = jnp.concatenate([new0, blk[1:8, :]], axis=0)

    @pl.when(is_bot & (start <= gbot) & (gbot < start + wr))
    def _():
        a0 = pl.multiple_of(gbot - 7 - start, 8)
        blk = dst[pl.ds(a0, 8), :]
        r7, r6 = blk[7:8, :], blk[6:7, :]
        new7 = jnp.concatenate(
            [
                half * (r7[:, 1:2] + r6[:, 0:1]),
                r7[:, 1 : side - 1],
                half * (r7[:, side - 2 : side - 1] + r6[:, side - 1 : side]),
            ],
            axis=1,
        )
        dst[pl.ds(a0, 8), :] = jnp.concatenate([blk[0:7, :], new7], axis=0)


def _dens_slab_kernel(
    flags_ref, src_hbm, base_hbm, u_ref, v_ref, out_ref,
    xs2, rhs2, buf_b, buf_c, g11b, wbuf, sems,
    *, b: int, alpha: float, beta: float, sweeps: int, tm: int, wr: int,
    side: int, K: int, m: int, nstrips: int, n: int, dt: float, cmax: int,
    fast: bool,
):
    """The whole ``dens_step`` (``FluidSequential.c:176-186``) per strip of
    the K-extended slab — the SPMD port of
    ``pallas_ops._dens_fused_kernel``: add_source folded into the Jacobi
    rhs, ``sweeps`` diffusion sweeps in VMEM, then the semi-Lagrangian
    gather reads the diffused field straight out of the sweep window.  One
    K-deep src/base halo exchange replaces the separate diffusion exchange
    + advection exchange, and the diffused density never round-trips HBM.

    Uniform geometry (halo == margin, like ``_jacobi_slab_kernel``), which
    makes the gather staging offset STATIC (output row 0 is always window
    row K): the unsharded kernel's dynamic normalization roll becomes a
    static slice."""
    gi = pl.program_id(0)
    slot = jax.lax.rem(gi, 2)

    def dmas(gi_, slot_):
        start_ = pl.multiple_of(gi_ * tm, 8)
        return [
            pltpu.make_async_copy(
                base_hbm.at[pl.ds(start_, wr), :], rhs2.at[slot_],
                sems.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(start_, wr), :], xs2.at[slot_],
                sems.at[slot_, 1],
            ),
        ]

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

    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
    row0 = flags_ref[2]
    start = gi * tm
    gtop = K
    gbot = K + m - 1
    dtype = buf_b.dtype
    sxf, syf = _signs(b)
    sx = jnp.asarray(sxf, dtype)
    sy = jnp.asarray(syf, dtype)

    # --- Jacobi diffusion with the source folded into the rhs ---
    buf_c[:] = xs2[slot]  # the source buffer is the Jacobi guess
    rhs_buf = rhs2.at[slot]
    inv_b = jnp.asarray(1.0 / beta, dtype)
    src_term = jnp.asarray(dt, dtype) * buf_c[:]
    if fast:
        rhs_buf[:] = (rhs_buf[:] + src_term) * inv_b
    else:
        rhs_buf[:] = rhs_buf[:] + src_term
    a_c = jnp.asarray(alpha, dtype)
    ab_c = jnp.asarray(alpha / beta, dtype)
    b_c = jnp.asarray(beta, dtype)

    def sweep(src, dst):
        s = src[:]
        sL = pltpu.roll(s, 1, 1)
        sR = pltpu.roll(s, side - 1, 1)
        sU = pltpu.roll(s, 1, 0)
        sD = pltpu.roll(s, wr - 1, 0)
        neigh = ((sL + sR) + sU) + sD
        if fast:
            dst[:] = rhs_buf[:] + ab_c * neigh
        else:
            dst[:] = (rhs_buf[:] + a_c * neigh) / b_c
        _slab_window_bc(dst, sx, sy, start, wr, side, is_top, is_bot,
                        gtop, gbot)

    def double_sweep(_, carry):
        sweep(buf_c, buf_b)
        sweep(buf_b, buf_c)
        return carry

    jax.lax.fori_loop(0, sweeps // 2, double_sweep, 0)
    if sweeps % 2:
        sweep(buf_c, buf_b)
        buf_c[:] = buf_b[:]
    # Corner cells ARE gather sources; fix them before gathering.
    _slab_window_corners(buf_c, start, wr, side, is_top, is_bot, gtop, gbot)

    # --- Semi-Lagrangian gather from the swept window ---
    dt0 = jnp.asarray(dt, dtype) * n
    gri = row0 + gi * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, side), 0)
    gci = jax.lax.broadcasted_iota(jnp.int32, (tm, side), 1)
    gr = gri.astype(dtype)
    gc = gci.astype(dtype)
    x = gc - dt0 * u_ref[:]
    y = gr - dt0 * v_ref[:]
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
    di = i0 - gri
    key = (di + cmax) * nshift + (j0 - gci + cmax)
    a_lo = jnp.min(di)
    a_hi = jnp.max(di)

    g00 = xs2.at[slot]   # dead since the guess was copied out
    g01 = rhs2.at[slot]  # dead after the final sweep
    g10 = buf_b          # dead after the final sweep
    g11 = g11b
    zero = jnp.zeros((tm, side), dtype)
    g00[0:tm, :] = zero
    g01[0:tm, :] = zero
    g10[0:tm, :] = zero
    g11[:] = zero

    # Output row 0 is window row K (uniform geometry): stage the gather
    # sub-window with it at static local row 8 via a static slice.
    wbuf[:] = buf_c[K - 8 : K + tm + 8, :]

    for a_idx in range(nshift):
        a = a_idx - cmax

        def _term(a_idx=a_idx, a=a):
            v00, v01 = g00[0:tm, :], g01[0:tm, :]
            v10, v11 = g10[0:tm, :], g11[:]
            qq = pltpu.roll(wbuf[8 + a : 8 + a + tm + 1, :], cmax, 1)
            for bbi in range(nshift):
                mk = key == (a_idx * nshift + bbi)
                qn = pltpu.roll(qq, side - 1, 1)
                v00 = jnp.where(mk, qq[0:tm, :], v00)
                v01 = jnp.where(mk, qn[0:tm, :], v01)
                v10 = jnp.where(mk, qq[1 : tm + 1, :], v10)
                v11 = jnp.where(mk, qn[1 : tm + 1, :], v11)
                qq = qn
            g00[0:tm, :] = v00
            g01[0:tm, :] = v01
            g10[0:tm, :] = v10
            g11[:] = v11

        if cmax >= 2:
            pl.when(jnp.logical_and(a_lo <= a, a <= a_hi))(_term)
        else:
            _term()

    # Exact reference blend order (FluidSequential.c:136-137).
    out_ref[:] = s0 * (t0 * g00[0:tm, :] + t1 * g10[0:tm, :]) + s1 * (
        t0 * g01[0:tm, :] + t1 * g11[:]
    )
    _apply_bnd_slab_block(out_ref, b, gi, tm, side, nstrips, is_top, is_bot)


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "iters", "dt", "n", "cmax", "m",
                     "K", "fast"),
)
def fused_dens_slab(b, src_ext, base_ext, u_slab, v_slab, flags, *,
                    alpha, beta, iters, dt, n, cmax, m, K, fast=False):
    """``advect(b, diffuse_src(b, src, base, ...), u, v)`` in one slab
    kernel on (m+2K, side) halo-extended src/base;
    requires ``K == dens_slab_margin(iters, cmax)``.  Returns the (m, side)
    density slab."""
    me, side = base_ext.shape
    assert me == m + 2 * K, (me, m, K)
    assert base_ext.dtype == jnp.float32, "fused dens slab kernel is f32-only"
    assert 1 <= cmax <= 7, "staging-buffer static slices need cmax <= 7"
    assert K >= iters + 1 + cmax or _interpret()
    tm = _dens_slab_tm(m, side, K)
    assert tm is not None, f"no viable dens strip for m={m}, side={side}"
    wr = tm + 2 * K
    nstrips = m // tm
    kernel = functools.partial(
        _dens_slab_kernel, b=b, alpha=float(alpha), beta=float(beta),
        sweeps=iters, tm=tm, wr=wr, side=side, K=K, m=m, nstrips=nstrips,
        n=n, dt=float(dt), cmax=cmax, fast=fast,
    )
    blk = pl.BlockSpec((tm, side), lambda gi: (gi, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=jax.ShapeDtypeStruct((m, side), base_ext.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk,
            blk,
        ],
        out_specs=blk,
        scratch_shapes=[
            pltpu.VMEM((2, wr, side), base_ext.dtype),
            pltpu.VMEM((2, wr, side), base_ext.dtype),
            pltpu.VMEM((wr, side), base_ext.dtype),
            pltpu.VMEM((wr, side), base_ext.dtype),
            pltpu.VMEM((tm, side), base_ext.dtype),
            pltpu.VMEM((tm + 16, side), base_ext.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=_DENS_SLAB_CAP
        ),
    )(flags, src_ext, base_ext, u_slab, v_slab)


# ---------------------------------------------------------------------------
# Windowed semi-Lagrangian advection on a halo-extended slab
# ---------------------------------------------------------------------------


def advect_slab_tm(m: int, side: int, nf: int) -> int | None:
    """Advection strip height for an (m, side) slab; the extended slab pads
    the halo to exactly ``tm`` rows so blocks align (gi, gi+1, gi+2)."""
    rows_per_tm = 36 if nf == 1 else 50
    for cand in (pallas_ops._ADVECT_TM, 128, 64, 32, 16, 8):
        if m % cand == 0 and rows_per_tm * cand * side * 4 <= _VMEM_BUDGET:
            return cand
    if _interpret() and m >= 1:
        return m
    return None


def _advect_slab_kernel(
    *refs,
    nf: int, bs: tuple, dt: float, n: int, tm: int, side: int, m: int,
    cmax: int, lpad: int, self_adv: bool, static_rows: bool, nstrips: int,
):
    # Argument layout: flags (SMEM); per field 3 blocks of the extended slab
    # (gi, gi+1, gi+2 — center block gi+1 holds the out rows); then (u, v)
    # center blocks unless self_adv; then nf out blocks; scratch wbuf + 4
    # corner accumulators.  Same gather machinery as pallas_ops._advect_kernel
    # (masked shift-accumulate over a VMEM window), with global coordinates
    # offset by the shard's row0 and wall BCs predicated.
    flags_ref = refs[0]
    blocks = refs[1 : 1 + 3 * nf]
    idx = 1 + 3 * nf
    if self_adv:
        u_ref, v_ref = blocks[1], blocks[4]
    else:
        u_ref, v_ref = refs[idx], refs[idx + 1]
        idx += 2
    out_refs = refs[idx : idx + nf]
    wbuf, g00, g01, g10, g11 = refs[idx + nf :]

    gi = pl.program_id(0)
    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
    row0 = flags_ref[2]  # global row of slab row 0

    dtype = u_ref.dtype
    dt0 = jnp.asarray(dt, dtype) * n
    gri = row0 + gi * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, side), 0)
    gci = jax.lax.broadcasted_iota(jnp.int32, (tm, side), 1)
    gr = gri.astype(dtype)
    gc = gci.astype(dtype)

    x = gc - dt0 * u_ref[:]
    y = gr - dt0 * v_ref[:]
    lo = jnp.asarray(0.5, dtype)
    hi = jnp.asarray(n + 0.5, dtype)
    x = jnp.clip(x, lo, hi)
    y = jnp.clip(y, lo, hi)
    x = jnp.clip(x, gc - cmax, gc + cmax)
    y = jnp.clip(y, gr - cmax, gr + cmax)

    j0 = x.astype(jnp.int32)
    i0 = y.astype(jnp.int32)
    s1 = x - j0.astype(dtype)
    s0 = jnp.asarray(1.0, dtype) - s1
    t1 = y - i0.astype(dtype)
    t0 = jnp.asarray(1.0, dtype) - t1

    nshift = 2 * cmax + 1
    di = i0 - gri
    dj = j0 - gci
    key = (di + cmax) * nshift + (dj + cmax)
    # Strip-local row-shift range (round 3): skip row terms no cell in
    # this strip backtraces into — bit-exact, same gating as
    # pallas_ops._advect_kernel (the masks of skipped terms are provably
    # all-false).  Keeps the sharded slab path at parity with the
    # unsharded kernels' wide-window cost (measured 2x the whole sharded
    # step at cmax=4 otherwise, dev/validate_sharded_tpu.py round 3).
    a_lo = jnp.min(di)
    a_hi = jnp.max(di)

    h3 = 3 * tm
    for f in range(nf):
        m1, c0, p1 = blocks[3 * f : 3 * f + 3]
        wbuf[0:tm, lpad : lpad + side] = m1[:]
        wbuf[tm : 2 * tm, lpad : lpad + side] = c0[:]
        wbuf[2 * tm : h3, lpad : lpad + side] = p1[:]
        zero = jnp.zeros((tm, side), dtype)
        g00[:] = zero
        g01[:] = zero
        g10[:] = zero
        g11[:] = zero

        def row_body(a_idx, rows):
            v00, v01, v10, v11 = g00[:], g01[:], g10[:], g11[:]
            wide_ = rows.shape[-1]
            q = pltpu.roll(rows, cmax, 1)
            for bbi in range(nshift):
                t = a_idx * nshift + bbi
                mk = key == t
                qn = pltpu.roll(q, wide_ - 1, 1)
                v00 = jnp.where(mk, q[0:tm, lpad : lpad + side], v00)
                v01 = jnp.where(mk, qn[0:tm, lpad : lpad + side], v01)
                v10 = jnp.where(mk, q[1 : tm + 1, lpad : lpad + side], v10)
                v11 = jnp.where(mk, qn[1 : tm + 1, lpad : lpad + side], v11)
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
                    # (-a) mod h3: compiled Mosaic mis-rotates negative
                    # dynamic sublane shifts (see
                    # pallas_ops._advect_kernel).
                    shift = jax.lax.rem(h3 + cmax - a_idx, h3)
                    q = pltpu.roll(wbuf[0:h3, :], shift, 0)
                    row_body(a_idx, q[tm : 2 * tm + 1, :])

                return carry

            jax.lax.fori_loop(0, nshift, row_term, 0)

        ob = out_refs[f]
        ob[:] = s0 * (t0 * g00[:] + t1 * g10[:]) + s1 * (
            t0 * g01[:] + t1 * g11[:]
        )
        _apply_bnd_slab_block(
            ob, bs[f], gi, tm, side, nstrips, is_top, is_bot
        )


def _apply_bnd_slab_block(dst, b: int, gi, tm: int, side: int, nstrips: int,
                          is_top, is_bot):
    """``set_bnd`` on an output strip of a slab: ghost columns always
    (full-width), wall ghost rows + corners predicated on shard position."""
    sxf, syf = _signs(b)
    dt = dst.dtype
    sx = jnp.asarray(sxf, dt)
    sy = jnp.asarray(syf, dt)
    dst[:, 0:1] = sx * dst[:, 1:2]
    dst[:, side - 1 : side] = sx * dst[:, side - 2 : side - 1]

    @pl.when(is_top & (gi == 0))
    def _():
        dst[0:1, :] = sy * dst[1:2, :]

    @pl.when(is_bot & (gi == nstrips - 1))
    def _():
        dst[tm - 1 : tm, :] = sy * dst[tm - 2 : tm - 1, :]

    _slab_corners(dst, gi, tm, side, nstrips, is_top, is_bot)


@functools.partial(
    jax.jit, static_argnames=("bs", "dt", "n", "cmax", "m", "self_adv")
)
def advect_slab(bs, exts, u_slab, v_slab, flags, *, dt, n, cmax, m, self_adv):
    """Windowed advection of ``len(bs)`` fields on halo-extended slabs
    (shape ``(m + 2*tm, side)`` with the halo padded to ``tm`` rows — build
    with ``advect_slab_tm``).  ``u_slab``/``v_slab`` are plain (m, side)
    slabs (ignored when ``self_adv``: the velocities are the fields)."""
    nf = len(bs)
    side = exts[0].shape[-1]
    tm = advect_slab_tm(m, side, nf)
    if tm is None:
        raise ValueError(f"advect_slab: no viable strip for m={m}, side={side}")
    assert exts[0].shape[0] == m + 2 * tm, (exts[0].shape, m, tm)
    assert cmax + 1 <= tm or _interpret()
    lpad = _LANE
    wide = side + 2 * _LANE
    nstrips = m // tm
    static_rows = (2 * cmax + 1) <= 5 and tm * side * 4 <= 288 * 1024
    kernel = functools.partial(
        _advect_slab_kernel, nf=nf, bs=tuple(bs), dt=float(dt), n=n, tm=tm,
        side=side, m=m, cmax=cmax, lpad=lpad, self_adv=self_adv,
        static_rows=static_rows, nstrips=nstrips,
    )

    def blk(shift):
        # Extended-slab blocks: out strip gi's rows live in ext block gi+1.
        return pl.BlockSpec(
            (tm, side), lambda gi, s=shift: (gi + 1 + s, 0),
            memory_space=pltpu.VMEM,
        )

    cblk = pl.BlockSpec((tm, side), lambda gi: (gi, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [flags]
    for ext in exts:
        in_specs += [blk(-1), blk(0), blk(+1)]
        operands += [ext, ext, ext]
    if not self_adv:
        in_specs += [cblk, cblk]
        operands += [u_slab, v_slab]
    dtype = exts[0].dtype
    out = pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((m, side), dtype) for _ in range(nf)
        ),
        in_specs=in_specs,
        out_specs=tuple(cblk for _ in range(nf)),
        scratch_shapes=[
            pltpu.VMEM((3 * tm, wide), dtype),
            pltpu.VMEM((tm, side), dtype),
            pltpu.VMEM((tm, side), dtype),
            pltpu.VMEM((tm, side), dtype),
            pltpu.VMEM((tm, side), dtype),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _cparams(),
    )(*operands)
    return out if isinstance(out, tuple) else (out,)


# ---------------------------------------------------------------------------
# Divergence and pressure-gradient (1-halo stencils with halo-row operands)
# ---------------------------------------------------------------------------


def _halo1_slab_specs(m: int, side: int):
    # Independent of the sweep-strip tuner: the 1-halo kernels run under
    # the default 48MB cap and their blocked specs (3-shifted inputs +
    # outs, ~10 strips live) blow scoped vmem at 512-row strips (measured:
    # gradient_slab 56.1M at tm=512/side=2048).  128 rows is plenty — these
    # kernels are pure HBM streaming.
    for cand in (128, 64, 32, 16, 8):
        if m % cand == 0 and 10 * cand * side * 4 <= _VMEM_BUDGET:
            tm = cand
            break
    else:
        tm = m
    nstrips = m // tm

    def blk(shift):
        if shift == 0:
            return pl.BlockSpec((tm, side), lambda gi: (gi, 0),
                                memory_space=pltpu.VMEM)
        if shift < 0:
            return pl.BlockSpec(
                (tm, side), lambda gi: (jnp.maximum(gi - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (tm, side), lambda gi: (jnp.minimum(gi + 1, nstrips - 1), 0),
            memory_space=pltpu.VMEM,
        )

    hblk = pl.BlockSpec((8, side), lambda gi: (0, 0), memory_space=pltpu.VMEM)
    return tm, blk, hblk


def _shifted_rows_slab(m1, c0, p1, htop, hbot, gi, nstrips):
    """Row-shifted views of the center block; slab-edge strips read the
    received halo rows instead of the clamped (garbage) neighbor block."""
    cc = c0[:]
    top_row = jnp.where(gi == 0, htop[7:8, :], m1[-1:, :])
    bot_row = jnp.where(gi == nstrips - 1, hbot[0:1, :], p1[:1, :])
    up = jnp.concatenate([top_row, cc[:-1, :]], axis=0)
    down = jnp.concatenate([cc[1:, :], bot_row], axis=0)
    return cc, up, down


def _divergence_slab_kernel(
    flags_ref, u_c, v_m1, v_c, v_p1, vtop, vbot, out_ref,
    *, n: int, tm: int, side: int, nstrips: int,
):
    gi = pl.program_id(0)
    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
    dt = out_ref.dtype
    h = jnp.asarray(1.0, dt) / n
    _, v_up, v_dn = _shifted_rows_slab(v_m1, v_c, v_p1, vtop, vbot, gi, nstrips)
    du = pallas_ops._lane_diff(u_c[:], side)
    out_ref[:] = (jnp.asarray(-0.5, dt) * h) * (du + (v_dn - v_up))
    _apply_bnd_slab_block(out_ref, 0, gi, tm, side, nstrips, is_top, is_bot)


def _gradient_slab_kernel(
    flags_ref, p_m1, p_c, p_p1, ptop, pbot, u_c, v_c, uout, vout,
    *, n: int, tm: int, side: int, nstrips: int,
):
    gi = pl.program_id(0)
    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
    dt = uout.dtype
    h = jnp.asarray(1.0, dt) / n
    half = jnp.asarray(0.5, dt)
    pc, p_up, p_dn = _shifted_rows_slab(p_m1, p_c, p_p1, ptop, pbot, gi, nstrips)
    dp = pallas_ops._lane_diff(pc, side)
    uout[:] = u_c[:] - (half * dp) / h
    vout[:] = v_c[:] - (half * (p_dn - p_up)) / h
    _apply_bnd_slab_block(uout, 1, gi, tm, side, nstrips, is_top, is_bot)
    _apply_bnd_slab_block(vout, 2, gi, tm, side, nstrips, is_top, is_bot)


@functools.partial(jax.jit, static_argnames=("n",))
def divergence_slab(u, v, vtop, vbot, flags, n):
    """Divergence on an (m, side) slab; ``vtop``/``vbot`` are (8, side)
    neighbor-row buffers (last/first 8 rows of the adjacent shards)."""
    m, side = u.shape
    tm, blk, hblk = _halo1_slab_specs(m, side)
    kernel = functools.partial(
        _divergence_slab_kernel, n=n, tm=tm, side=side, nstrips=m // tm
    )
    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        out_shape=jax.ShapeDtypeStruct((m, side), u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(0), blk(-1), blk(0), blk(+1), hblk, hblk],
        out_specs=blk(0),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _cparams(),
    )(flags, u, v, v, v, vtop, vbot)


@functools.partial(jax.jit, static_argnames=("n",))
def gradient_slab(u, v, p, ptop, pbot, flags, n):
    """Pressure-gradient subtraction on (m, side) slabs (``lastProject``,
    ``FluidSequential.c:161-173``)."""
    m, side = u.shape
    tm, blk, hblk = _halo1_slab_specs(m, side)
    kernel = functools.partial(
        _gradient_slab_kernel, n=n, tm=tm, side=side, nstrips=m // tm
    )
    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        out_shape=(
            jax.ShapeDtypeStruct((m, side), u.dtype),
            jax.ShapeDtypeStruct((m, side), u.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(-1), blk(0), blk(+1), hblk, hblk, blk(0), blk(0)],
        out_specs=(blk(0), blk(0)),
        interpret=_interpret(),
        compiler_params=None if _interpret() else _cparams(),
    )(flags, p, p, p, ptop, pbot, u, v)
