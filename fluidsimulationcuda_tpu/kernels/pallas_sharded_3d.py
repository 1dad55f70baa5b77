"""Pallas TPU kernels for the multi-chip 3-D (z-slab shard_map) path.

Per-shard compute for ``parallel.sharded3d``: each chip owns a z-slab of
``mz`` whole (side, side) planes.  The glue exchanges K-deep *plane* halos
over ICI once per K fused Jacobi sweeps; these kernels then run entirely in
VMEM — the 3-D twin of ``pallas_sharded.py``, built on the flattened-sweep
machinery of ``pallas_ops_3d`` (z collapses into the sublane axis, every
neighbor one 2-D rotate; boundary rule folded into neighbor reads).

SPMD notes (cf. ``pallas_sharded.py``): one traced program serves all
shards, so the z-wall boundary is predicated on an ``(is_top, is_bot,
plane0)`` scalar vector (SMEM); y/x ghost faces are owned by every shard
(slabs keep planes whole) and handled exactly like the single-chip
kernels.  Slab geometry is uniform (halo depth == sweep margin), so the
gather staging offset is static.

Numerics are the same expressions in the same order as the jnp sharded-3D
path (``parallel/sharded3d.py``) and the single-chip 3-D kernels; the
sharded-pallas 3-D step differential-tests against both
(``tests/test_sharded_3d.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_ops
from .pallas_ops_3d import (_advect3_flat_need, _flat_gather_body,
                            _jacobi3_need, _jacobi3_need_hw, _plane_bytes,
                            _signs3, _JAC3_DMA_WEIGHT, _VMEM3_CEIL)

__all__ = [
    "slab3_supported",
    "jacobi3_slab_plan",
    "cheby3_slab_plan",
    "fused_jacobi3_slab",
    "fused_cheby3_slab",
    "advect3_slab_plan",
    "advect3_flat_slab",
]


def _interpret() -> bool:
    return pallas_ops.INTERPRET


# ---------------------------------------------------------------------------
# Fused-sweep 6-neighbor Jacobi on a plane-halo-extended slab
# ---------------------------------------------------------------------------


def jacobi3_slab_plan(mz: int, side: int, max_fused: int,
                      nin: int = 2, nout: int = 1):
    """(tz, K): strip height (planes) and sweeps per exchange, minimizing
    the calibrated single-chip cost model (compute redundancy wz/tz plus
    0.62× the DMA term — see ``_jacobi3_plan``; the slab kernel always
    streams both windows) over plans whose modeled VMEM need fits the
    verified ceiling.  ``nin``/``nout`` are the streamed-operand counts
    (Jacobi 2/1; the Chebyshev chain 3/2, see ``cheby3_slab_plan``).
    The slab halo depth is H = K + 1 planes, bounded by the slab itself
    (single-hop exchange).  Returns (None, None) if no viable plan."""
    best = None
    best_cost = None
    for tz in (16, 8, 4, 2, 1):
        if mz % tz:
            continue
        for K in range(max_fused, 0, -1):
            if K + 1 > mz:
                continue
            wz = tz + 2 * (K + 1)
            if _jacobi3_need(tz, K, side, nin, nout) > _VMEM3_CEIL:
                continue
            cost = (wz / tz
                    + _JAC3_DMA_WEIGHT * (nin * wz + nout * tz) / (tz * K))
            if best is None or cost < best_cost:
                best, best_cost = (tz, K), cost
    return best if best is not None else (None, None)


def cheby3_slab_plan(mz: int, side: int, max_fused: int):
    """(tz, K) for the Chebyshev CHAIN slab segments (nin=3: x, x_{k-1},
    rhs streamed; nout=2: both final iterates written) — the slab twin
    of ``pallas_ops_3d._jacobi3_plan(nin=3, nout=2)``."""
    return jacobi3_slab_plan(mz, side, max_fused, nin=3, nout=2)


def slab3_supported(mz: int, side: int, cmax: int) -> bool:
    """Can the compiled 3-D slab kernels run on (mz, side, side) slabs?"""
    if _interpret():
        return True
    tz, _ = jacobi3_slab_plan(mz, side, 1)
    return (
        side >= 128
        and side % 8 == 0
        and tz is not None
        and advect3_slab_plan(mz, side, cmax) is not None
        and cmax + 1 <= mz
    )


def _jacobi3_slab_kernel(
    *refs,
    b: int, alpha: float, beta: float, sweeps: int,
    tz: int, wz: int, side: int, H: int, mz: int, zero_init: bool,
    nstrips: int, fast: bool, ws: tuple | None = None,
    carry_in: bool = False, carry_out: bool = False,
):
    """K-margin fused sweeps over one strip of the extended slab.

    Extended-slab geometry (uniform — halo H == sweep margin):
      ext planes [0,H) = upper halo | [H, H+mz) = slab | lower halo
      window = ext planes [gi*tz, gi*tz + wz), wz = tz + 2H
      output = window planes [H, H+tz) <-> slab planes [gi*tz, ...)
      global ghost planes at ext H (top shard) / ext H+mz-1 (bottom).

    Chebyshev chain mode (``ws`` set — the slab twin of
    ``pallas_ops_3d._jacobi3_kernel``'s chain): static per-sweep w
    factors, ``carry_in`` streams the halo-extended x_{k-1} slab (the
    three-term combine is POINTWISE, but margin-region cells inside the
    validity cone combine with x_{k-1} values the neighbor shard owns,
    so the carry is exchanged like x), ``carry_out`` writes BOTH final
    iterates for the next chained segment."""
    flags_ref = refs[0]
    if carry_in:
        x_hbm, xm_hbm, rhs_hbm = refs[1:4]
        idx = 4
    else:
        x_hbm, rhs_hbm = refs[1:3]
        xm_hbm = None
        idx = 3
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
        start_ = gi_ * tz
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

    is_top = flags_ref[0] == 1
    is_bot = flags_ref[1] == 1
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

    L = wz * side
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    rows_plane = rows // side
    y_in_plane = jax.lax.rem(rows, side)
    y0m = y_in_plane == 0
    y1m = y_in_plane == (side - 1)
    # BC-fold masks (cf. pallas_ops_3d._jacobi3_kernel finding 12): the
    # boundary rule is folded into the neighbor READS; ghost cells carry
    # garbage through the sweeps and faces are derived once in the
    # epilogue.  z-wall folds are SPMD-predicated: the ghost planes sit at
    # dynamic window positions wp_top/wp_bot and exist only on wall shards.
    y1f = y_in_plane == 1
    ym2f = y_in_plane == (side - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, side), 1)
    c1f = col == 1
    cm2f = col == (side - 2)
    wp_top = H - gi * tz           # window plane of the global top ghost
    wp_bot = H + mz - 1 - gi * tz  # window plane of the global bottom ghost
    z1f = (rows_plane == wp_top + 1) & is_top
    zm2f = (rows_plane == wp_bot - 1) & is_bot

    def sweep(src, dst, fold: bool, w=None):
        s = src[:].reshape(L, side)
        sL = pltpu.roll(s, 1, 1)
        sR = pltpu.roll(s, side - 1, 1)
        sU = pltpu.roll(s, 1, 0)
        sD = pltpu.roll(s, L - 1, 0)
        sF = pltpu.roll(s, side, 0)
        sB = pltpu.roll(s, L - side, 0)
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
        if w is not None:  # Chebyshev three-term combine (dst = x_{k-1})
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
        # Static unroll (<= K sweeps/segment): per-sweep w's differ.  The
        # global first sweep keeps the unfolded raw-guess ghost quirk;
        # chained segments re-enter folded (the previous segment's
        # epilogue derived faces = what a folded read computes).
        cur, oth = buf_c, buf_b
        for i, w in enumerate(ws):
            sweep(cur, oth, carry_in or i > 0, w)
            cur, oth = oth, cur
        final = cur
        prev = oth

    # Epilogue: derive ghost faces once (y/x everywhere; z on wall shards
    # at their dynamic window planes).
    f2 = final[:].reshape(L, side)
    f2 = jnp.where(y0m, sy * pltpu.roll(f2, L - 1, 0), f2)
    f2 = jnp.where(y1m, sy * pltpu.roll(f2, 1, 0), f2)
    final[:] = f2.reshape(wz, side, side)
    final[:, :, 0:1] = sx * final[:, :, 1:2]
    final[:, :, side - 1 : side] = sx * final[:, :, side - 2 : side - 1]

    @pl.when(is_top & (0 <= wp_top) & (wp_top < wz - 1))
    def _():
        final[pl.ds(wp_top, 1)] = sz * final[pl.ds(wp_top + 1, 1)]

    @pl.when(is_bot & (1 <= wp_bot) & (wp_bot < wz))
    def _():
        final[pl.ds(wp_bot, 1)] = sz * final[pl.ds(wp_bot - 1, 1)]

    out_ref[:] = final[H : H + tz]
    if carry_out:
        # x_{k+s-1} for the next chained segment's combine.  No face
        # derivation: the combine reads it POINTWISE and its validity at
        # the output planes exceeds final's by one sweep (cf. the
        # unsharded chain kernel, pallas_ops_3d._jacobi3_kernel).
        outp_ref[:] = prev[H : H + tz]


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "sweeps", "mz", "H", "zero_init",
                     "fast"),
)
def fused_jacobi3_slab(
    b: int,
    x_ext: jnp.ndarray,
    rhs_ext: jnp.ndarray,
    flags: jnp.ndarray,
    *,
    mz: int,
    H: int,
    alpha: float,
    beta: float,
    sweeps: int,
    zero_init: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """``sweeps`` 6-neighbor Jacobi sweeps on an (mz+2H, side, side)
    plane-halo-extended slab; requires ``H >= sweeps + 1``.  Returns the
    (mz, side, side) slab."""
    me, side, _ = rhs_ext.shape
    assert me == mz + 2 * H, (me, mz, H)
    assert H >= sweeps + 1 or _interpret()
    # Strip height against the PASSED halo depth (the caller's chunk plan
    # fixes H; re-planning here could disagree on the last, shorter chunk).
    tz = None
    for cand in (16, 8, 4, 2, 1):
        if (mz % cand == 0
                and _jacobi3_need_hw(cand, cand + 2 * H, sweeps, side, 2)
                <= _VMEM3_CEIL):
            tz = cand
            break
    if tz is None and _interpret():
        tz = mz
    assert tz is not None, f"no viable 3-D slab strip for mz={mz}, side={side}"
    wz = tz + 2 * H
    nstrips = mz // tz
    kernel = functools.partial(
        _jacobi3_slab_kernel, b=b, alpha=float(alpha), beta=float(beta),
        sweeps=sweeps, tz=tz, wz=wz, side=side, H=H, mz=mz,
        zero_init=zero_init, nstrips=nstrips, fast=fast,
    )
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=jax.ShapeDtypeStruct((mz, side, side), rhs_ext.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wz, side, side), rhs_ext.dtype),
            pltpu.VMEM((2, wz, side, side), rhs_ext.dtype),
            pltpu.VMEM((wz, side, side), rhs_ext.dtype),
            pltpu.VMEM((wz, side, side), rhs_ext.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM3_CEIL, _jacobi3_need_hw(tz, wz, sweeps, side, 2)
            )
        ),
    )(flags, x_ext, rhs_ext)


@functools.partial(
    jax.jit,
    static_argnames=("b", "alpha", "beta", "ws", "mz", "H", "zero_init",
                     "fast", "carry_in", "carry_out"),
)
def fused_cheby3_slab(
    b: int,
    x_ext: jnp.ndarray,
    xm_ext: jnp.ndarray | None,
    rhs_ext: jnp.ndarray,
    flags: jnp.ndarray,
    *,
    mz: int,
    H: int,
    alpha: float,
    beta: float,
    ws: tuple,
    zero_init: bool = False,
    fast: bool = False,
    carry_in: bool = False,
    carry_out: bool = False,
):
    """One Chebyshev chain segment on plane-halo-extended slabs:
    ``len(ws)`` sweeps with static w factors (``ws[0] is None`` = the
    global first plain sweep).  Returns the (mz, side, side) final slab,
    plus the previous iterate when ``carry_out`` (both feed the next
    segment; the caller re-exchanges both halos).  Requires
    ``H >= len(ws) + 1``."""
    me, side, _ = rhs_ext.shape
    sweeps = len(ws)
    assert me == mz + 2 * H, (me, mz, H)
    assert H >= sweeps + 1 or _interpret()
    assert carry_in == (xm_ext is not None)
    nin = 3 if carry_in else 2
    nout = 2 if carry_out else 1
    tz = None
    for cand in (16, 8, 4, 2, 1):
        if (mz % cand == 0
                and _jacobi3_need_hw(cand, cand + 2 * H, sweeps, side, nin,
                                     nout) <= _VMEM3_CEIL):
            tz = cand
            break
    if tz is None and _interpret():
        tz = mz
    assert tz is not None, \
        f"no viable 3-D cheby slab strip for mz={mz}, side={side}"
    wz = tz + 2 * H
    nstrips = mz // tz
    kernel = functools.partial(
        _jacobi3_slab_kernel, b=b, alpha=float(alpha), beta=float(beta),
        sweeps=sweeps, tz=tz, wz=wz, side=side, H=H, mz=mz,
        zero_init=zero_init, nstrips=nstrips, fast=fast, ws=ws,
        carry_in=carry_in, carry_out=carry_out,
    )
    slab = jax.ShapeDtypeStruct((mz, side, side), rhs_ext.dtype)
    blk = pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                       memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((2, wz, side, side), rhs_ext.dtype)
               for _ in range(nin)]
    scratch += [
        pltpu.VMEM((wz, side, side), rhs_ext.dtype),
        pltpu.VMEM((wz, side, side), rhs_ext.dtype),
        pltpu.SemaphoreType.DMA((2, 3 if carry_in else 2)),
    ]
    operands = ((flags, x_ext, xm_ext, rhs_ext) if carry_in
                else (flags, x_ext, rhs_ext))
    return pl.pallas_call(
        kernel,
        grid=(nstrips,),
        out_shape=(slab, slab) if carry_out else slab,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * nin,
        out_specs=(blk, blk) if carry_out else blk,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM3_CEIL,
                _jacobi3_need_hw(tz, wz, sweeps, side, nin, nout),
            )
        ),
    )(*operands)


# ---------------------------------------------------------------------------
# Flattened windowed trilinear advection on a plane-halo-extended slab
# ---------------------------------------------------------------------------


def advect3_slab_plan(mz: int, side: int, cmax: int):
    """Strip height for the flattened slab gather, or None (shares the
    single-chip need model — measured compiled footprint ~1.75× the raw
    row estimate, verified 96MB ceiling)."""
    if cmax > 2:
        return None
    if cmax + 1 > mz:
        return None
    for tz in (8, 4, 2, 1):
        if mz % tz:
            continue
        if _advect3_flat_need(side, tz, cmax) <= _VMEM3_CEIL:
            return tz
    if _interpret():
        return mz
    return None


def _advect3_flat_slab_kernel(
    flags_ref, d0_hbm, u_blk, v_blk, w_blk, out_ref, win, wbuf,
    g000, g001, g010, g011, g100, g101, g110, g111, sem,
    *, dt: float, n: int, tz: int, wz: int, side: int, cmax: int,
):
    """Flattened masked-shift trilinear gather on one slab strip — the
    SPMD port of ``pallas_ops_3d._advect3_flat_kernel``.  Uniform slab
    geometry makes the staging offset static (no normalization roll);
    global z enters through ``plane0`` (SMEM flags)."""
    gi = pl.program_id(0)
    plane0 = flags_ref[2]  # global z index of slab plane 0
    cp = pltpu.make_async_copy(d0_hbm.at[pl.ds(gi * tz, wz)], win, sem)
    cp.start()
    cp.wait()

    W = wz * side
    wbuf[0:W, :] = win[:].reshape(W, side)

    interior = _flat_gather_body(
        wbuf, u_blk, v_blk, w_blk,
        (g000, g001, g010, g011, g100, g101, g110, g111),
        plane0 + gi * tz, dt=dt, n=n, tz=tz, side=side, cmax=cmax,
    )
    out_ref[:] = interior.reshape(tz, side, side)


@functools.partial(jax.jit, static_argnames=("dt", "n", "cmax", "mz"))
def advect3_flat_slab(d0_ext, u_slab, v_slab, w_slab, flags, *, dt, n,
                      cmax, mz):
    """Windowed trilinear advection on a (mz + 2*(cmax+1), side, side)
    plane-halo-extended slab; velocities are plain (mz, side, side) slabs.
    Output ghost layer is raw — apply the slab BC at the jnp level."""
    side = n + 2
    tz = advect3_slab_plan(mz, side, cmax)
    assert tz is not None, f"no viable 3-D slab advect strip for mz={mz}"
    C = cmax + 1
    wz = tz + 2 * C
    assert d0_ext.shape[0] == mz + 2 * C, (d0_ext.shape, mz, C)
    W = wz * side
    pad = (cmax + 8) // 8 * 8
    kernel = functools.partial(
        _advect3_flat_slab_kernel, dt=float(dt), n=n, tz=tz, wz=wz,
        side=side, cmax=cmax,
    )
    sblk = pl.BlockSpec((tz, side, side), lambda gi: (gi, 0, 0),
                        memory_space=pltpu.VMEM)
    L = tz * side
    return pl.pallas_call(
        kernel,
        grid=(mz // tz,),
        out_shape=jax.ShapeDtypeStruct((mz, side, side), d0_ext.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            sblk, sblk, sblk,
        ],
        out_specs=sblk,
        scratch_shapes=[
            pltpu.VMEM((wz, side, side), d0_ext.dtype),
            pltpu.VMEM((W + pad, side), d0_ext.dtype),
        ]
        + [pltpu.VMEM((L, side), d0_ext.dtype) for _ in range(8)]
        + [pltpu.SemaphoreType.DMA],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM3_CEIL, _advect3_flat_need(side, tz, cmax)
            )
        ),
    )(flags, d0_ext, u_slab, v_slab, w_slab)
