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
)

__all__ = [
    "slab_supported",
    "fused_jacobi_slab",
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
    (6 double-buffered (tm+2K)-row windows + out blocks) within budget."""
    for cand in (128, 256, 512, 64, 32, 16, 8):
        if m % cand == 0 and (6 * (cand + 2 * K) + 2 * cand) * side * 4 <= _VMEM_BUDGET:
            return cand
    if (6 * (m + 2 * K) + 2 * m) * side * 4 <= _VMEM_BUDGET or _interpret():
        return m  # whole slab in one strip
    return None


# ---------------------------------------------------------------------------
# Fused-sweep Jacobi on a halo-extended slab
# ---------------------------------------------------------------------------


def _jacobi_slab_kernel(
    flags_ref, x_hbm, rhs_hbm, out_ref, xs2, rhs2, buf_b, buf_c, sems,
    *, b: int, alpha: float, beta: float, sweeps: int,
    tm: int, wr: int, side: int, K: int, m: int, zero_init: bool,
    nstrips: int, fast: bool,
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
        # Ghost columns: every shard owns them (full-width slabs).
        dst[:, 0:1] = sx * dst[:, 1:2]
        dst[:, side - 1 : side] = sx * dst[:, side - 2 : side - 1]

        # Wall ghost rows, dynamically predicated (one SPMD program).  The
        # 8-row block read-modify-write keeps dynamic sublane offsets
        # 8-aligned (gtop-start is a multiple of 8; gbot-start is == 7 mod 8
        # so the block starts 7 rows above it).
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
        bc(dst)

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
                     "fast"),
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
) -> jnp.ndarray:
    """``sweeps`` Jacobi sweeps on an ``(m+2K, side)`` halo-extended slab.
    Requires ``K >= ceil8(sweeps+1)`` (halo = validity margin).  Returns the
    (m, side) slab."""
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
        compiler_params=None if _interpret() else _cparams(),
    )(flags, x_ext, rhs_ext)


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
    tm = _slab_tm(m, side, 8)
    if tm is None or tm == m:
        for cand in (128, 64, 32, 16, 8):
            if m % cand == 0:
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
