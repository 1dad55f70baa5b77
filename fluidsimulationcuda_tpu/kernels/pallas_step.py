"""Step-level fused Pallas kernels (round 3).

``fused_advect_project`` collapses the tail of ``vel_step``
(``FluidSequential.c:232-240``: self-advect u,v then the second projection)
into ONE kernel per strip: the pair advection gathers into VMEM, the
divergence reads the advected fields straight out of the gather window, the
pressure Poisson sweeps run in place, and the gradient subtraction is the
epilogue.  The advected velocities and the divergence never round-trip HBM.

**Measured SLOWER than the composition — deliberately not wired into the
step** (same policy as round 2's u+v pair kernel).  Slope-measured at
2048²/20it/cmax=1 on v5e: 0.98 ms (tm=256) / 1.01 ms (tm=128) vs 0.82 ms
for ``advect_pair + fused_project``; tm=512 exceeds even the 96MB scoped
cap.  The physics: at its VMEM-feasible strip heights the kernel re-sweeps
and re-gathers a ``(tm + 2*margin)/tm ≈ 1.19-1.37x`` window per strip,
which costs more VPU time than the ~67MB of HBM round-trip it saves
(~0.08 ms at HBM bandwidth) — the sweep path is VPU-bound, not HBM-bound
(see docs/PERFORMANCE.md roofline).  Kept as a tested capability; the gate
is ``advect_project_supported`` and the OpSet hook is ``advect_project``
(None by default).

Structure per strip (cf. ``pallas_ops._project_kernel`` /
``_dens_fused_kernel``, whose staging and margin rules this reuses):

- input window: u, v rows ``[start_p - C8, start_p + wr + C8)`` where
  ``wr = tm + 2*margin``, ``margin = ceil_t(iters + 3)`` (divergence edge
  garbage propagates 1 row/sweep, same as the fused projection) and
  ``C8 = ceil_t(cmax)`` extra rows feed the gather;
- the pair gather (masked shifts, shared backtrace, exact while
  displacement < cmax — proof in ``ops/advect.py:advect_windowed``) runs
  one field at a time so the four corner accumulators are reused; the
  staging roll is cyclic — wrapped rows are only ever READ where the mask
  is provably unselected (selected reads imply a global row in [0, n],
  which lands inside the non-wrapped span), and every slice stays inside
  the buffer, honoring the round-2 OOB-clamp rule;
- divergence, ``iters`` pressure sweeps, and the gradient epilogue are the
  fused projection's code paths on the in-VMEM advected fields; the p
  ping-pong aliases the dead gather accumulators.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_ops as po
from .pallas_ops import (
    _apply_bnd_window,
    _ceil_t,
    _sub,
    _sweep_loop,
    _LANE,
)

__all__ = ["fused_advect_project", "advect_project_supported"]


def _ap_plan(side: int, iters: int, cmax: int, st: int = 8):
    """(tm, margin, C8) or None.  Strip height sized so the peak working
    set (double-buffered input windows, lane-padded staging, 4 gather
    accumulators (reused as the p ping-pong), advected pair, rhs, and the
    pipelined out blocks) stays within the raised per-kernel cap."""
    # C8 >= cmax + 1 keeps every staging slice inside the buffer; the
    # static gather unroll is (2C+1)^2 terms, so big windows are gated off
    # (they would blow the Mosaic value stack; the unfused path serves them).
    if cmax + 1 > _ceil_t(cmax, st) or cmax > 3:
        return None
    margin = _ceil_t(iters + 3, st)
    C8 = _ceil_t(cmax, st)
    for tm in (256, 128, 64, 32):
        if side % tm or side // tm < 4 or tm % st:
            continue
        wr = tm + 2 * margin
        win = wr + 2 * C8
        if win > side:
            continue
        # f32 VMEM rows: 2x2 input windows + staging (wide/side ~ 1.13) +
        # 4 (wr+1) accumulators + adv pair + rhs + 2x2 out + gather stack
        # headroom (~8 wr-row live values in the unrolled mask chain).
        rows = 4 * win + (win * (side + 2 * _LANE)) // side \
            + 4 * (wr + 1) + 3 * wr + 4 * tm + 8 * wr
        if rows * side * 4 <= 80 * 2**20:
            return tm, margin, C8
    return None


def advect_project_supported(side: int, iters: int, cmax: int,
                             st: int = 8) -> bool:
    return _ap_plan(side, iters, cmax, st) is not None


def _ap_kernel(
    u_hbm, v_hbm, uout, vout,
    ubuf2, vbuf2, wbuf, g00, g01, g10, g11, adv_u, adv_v, rhs_buf, sems,
    *, n: int, iters: int, dt: float, cmax: int, tm: int, wr: int,
    side: int, margin: int, C8: int, nstrips: int, total: int, st: int,
    cheby_rho: float | None = None,
):
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    lin = bi * nstrips + gi
    slot = jax.lax.rem(lin, 2)
    win = wr + 2 * C8

    def dmas(bi_, gi_, slot_):
        sp = jnp.clip(gi_ * tm - margin, 0, side - wr)
        si = pl.multiple_of(jnp.clip(sp - C8, 0, side - win), st)
        return [
            pltpu.make_async_copy(
                u_hbm.at[bi_, pl.ds(si, win), :], ubuf2.at[slot_],
                sems.at[slot_, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[bi_, pl.ds(si, win), :], vbuf2.at[slot_],
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
    start_p = jnp.clip(r0 - margin, 0, side - wr)    # pressure-window origin
    start_i = jnp.clip(start_p - C8, 0, side - win)  # input-window origin
    delta = pl.multiple_of(start_p - start_i, st)    # in [0, 2*C8], aligned
    dtype = jnp.float32
    dt0 = jnp.asarray(dt, dtype) * n

    # Backtrace coordinates for every pressure-window row (the advected
    # fields must be valid on all wr rows so the divergence/gradient see
    # real data everywhere but the 2 roll-wrap edge rows, like the fused
    # projection).  u/v center rows staged via an aligned dynamic slice.
    u_c = ubuf2[slot, pl.ds(delta, wr), :]
    v_c = vbuf2[slot, pl.ds(delta, wr), :]
    gr = (start_p + jax.lax.broadcasted_iota(jnp.int32, (wr, side), 0)
          ).astype(dtype)
    gc = jax.lax.broadcasted_iota(jnp.int32, (wr, side), 1).astype(dtype)
    x = gc - dt0 * u_c
    y = gr - dt0 * v_c
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
    key = (i0 - gr.astype(jnp.int32) + cmax) * nshift + (
        j0 - gc.astype(jnp.int32) + cmax
    )

    # Stage one field into wbuf with pressure-window row 0 at STATIC local
    # row C8, lane-padded so every gather read is a static slice.  The roll
    # is cyclic and positive-normalized (negative dynamic sublane shifts
    # mis-rotate in compiled Mosaic, cf. _advect_kernel); see module doc
    # for why wrapped rows are never mask-selected.
    base = C8

    def gather_field(src2):
        shift = jax.lax.rem(jnp.int32(win) + base - delta, jnp.int32(win))
        wbuf[:, _LANE : _LANE + side] = pltpu.roll(
            src2[slot], shift, 0
        )
        zero = jnp.zeros((wr, side), dtype)
        g00[:] = zero
        g01[:] = zero
        g10[:] = zero
        g11[:] = zero
        for a_idx in range(nshift):
            a = a_idx - cmax
            v00, v01 = g00[:], g01[:]
            v10, v11 = g10[:], g11[:]
            qq = pltpu.roll(wbuf[base + a : base + a + wr + 1, :], cmax, 1)
            for bbi in range(nshift):
                m = key == (a_idx * nshift + bbi)
                qn = pltpu.roll(qq, qq.shape[-1] - 1, 1)
                v00 = jnp.where(m, qq[0:wr, _LANE : _LANE + side], v00)
                v01 = jnp.where(m, qn[0:wr, _LANE : _LANE + side], v01)
                v10 = jnp.where(m, qq[1 : wr + 1, _LANE : _LANE + side], v10)
                v11 = jnp.where(m, qn[1 : wr + 1, _LANE : _LANE + side], v11)
                qq = qn
            g00[:] = v00
            g01[:] = v01
            g10[:] = v10
            g11[:] = v11
        # Exact reference blend order (FluidSequential.c:136-137).
        return s0 * (t0 * g00[:] + t1 * g10[:]) + s1 * (
            t0 * g01[:] + t1 * g11[:]
        )

    # Both self-advections read the same pre-advection velocity
    # (FluidSequential.c:232,237): coordinates computed once above.
    adv_u[:] = gather_field(ubuf2)
    _apply_bnd_window(adv_u, 1, start_p, wr, side, corners=False)
    adv_v[:] = gather_field(vbuf2)
    _apply_bnd_window(adv_v, 2, start_p, wr, side, corners=False)

    # --- Projection on the in-VMEM advected pair (cf. _project_kernel) ---
    h = jnp.asarray(1.0, dtype) / n
    half = jnp.asarray(0.5, dtype)
    uu = adv_u[:]
    vv = adv_v[:]
    du = pltpu.roll(uu, side - 1, 1) - pltpu.roll(uu, 1, 1)
    dv = pltpu.roll(vv, wr - 1, 0) - pltpu.roll(vv, 1, 0)
    rhs_buf[:] = (jnp.asarray(-0.5, dtype) * h) * (du + dv)
    _apply_bnd_window(rhs_buf, 0, start_p, wr, side, corners=False)

    # p ping-pong lives in the dead gather accumulators.
    p_a = g00
    p_b = g01
    p_a[:] = jnp.zeros((wr, side), dtype)
    quarter = jnp.asarray(0.25, dtype)

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
            wc = w.astype(dtype)
            dst[:] = wc * val + (jnp.asarray(1.0, dtype) - wc) * dst[:]
        _apply_bnd_window(dst, 0, start_p, wr, side, corners=False)

    p_fin, p_scr = _sweep_loop(sweep, p_a, p_b, iters, cheby_rho)

    off = pl.multiple_of(r0 - start_p, st)
    p_c = p_fin[pl.ds(off, tm), :]
    p_scr[:] = pltpu.roll(p_fin[:], 1, 0)       # p[r-1] (up neighbor)
    p_up = p_scr[pl.ds(off, tm), :]
    p_scr[:] = pltpu.roll(p_fin[:], wr - 1, 0)  # p[r+1] (down neighbor)
    p_dn = p_scr[pl.ds(off, tm), :]
    dp = pltpu.roll(p_c, side - 1, 1) - pltpu.roll(p_c, 1, 1)
    au = adv_u[pl.ds(off, tm), :]
    av = adv_v[pl.ds(off, tm), :]
    uo, vo = uout.at[0], vout.at[0]
    uo[:] = (au - (half * dp) / h).astype(uout.dtype)
    vo[:] = (av - (half * (p_dn - p_up)) / h).astype(vout.dtype)
    _apply_bnd_window(uo, 1, r0, tm, side)
    _apply_bnd_window(vo, 2, r0, tm, side)


def fused_advect_project(u, v, n: int, iters: int, dt: float, *,
                         cmax: int = 1, cheby_rho=None):
    """``project(advect_pair(1, 2, u, v, u, v))`` in one kernel —
    the tail of ``vel_step`` (``FluidSequential.c:232-240``) without the
    HBM round-trip for the advected pair.  ``cheby_rho`` switches the
    pressure sweeps to Chebyshev acceleration (``ops/chebyshev.py``)."""
    return _ap_call(u, v, n, iters, float(dt), cmax,
                    None if cheby_rho is None else float(cheby_rho))


@functools.partial(jax.jit,
                   static_argnames=("n", "iters", "dt", "cmax", "cheby_rho"))
def _ap_call(u, v, n, iters, dt, cmax, cheby_rho=None):
    side = n + 2
    assert u.dtype == jnp.float32, "fused advect+project is f32-only"
    st = _sub(u.dtype)
    plan = _ap_plan(side, iters, cmax, st)
    assert plan is not None, f"unsupported side={side} iters={iters}"
    tm, margin, C8 = plan
    wr = tm + 2 * margin
    win = wr + 2 * C8
    squeeze = u.ndim == 2
    if squeeze:
        u = u.reshape(1, side, side)
        v = v.reshape(1, side, side)
    nb = u.shape[0]
    nstrips = side // tm
    kernel = functools.partial(
        _ap_kernel, n=n, iters=iters, dt=dt, cmax=cmax, tm=tm, wr=wr,
        side=side, margin=margin, C8=C8, nstrips=nstrips,
        total=nb * nstrips, st=st, cheby_rho=cheby_rho,
    )
    blk = pl.BlockSpec((1, tm, side), lambda bi, gi: (bi, gi, 0),
                       memory_space=pltpu.VMEM)
    wide = side + 2 * _LANE
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
            pltpu.VMEM((2, win, side), jnp.float32),   # u windows
            pltpu.VMEM((2, win, side), jnp.float32),   # v windows
            pltpu.VMEM((win, wide), jnp.float32),      # gather staging
            pltpu.VMEM((wr, side), jnp.float32),       # g00 / p_a
            pltpu.VMEM((wr, side), jnp.float32),       # g01 / p_b
            pltpu.VMEM((wr, side), jnp.float32),       # g10
            pltpu.VMEM((wr, side), jnp.float32),       # g11
            pltpu.VMEM((wr, side), jnp.float32),       # advected u
            pltpu.VMEM((wr, side), jnp.float32),       # advected v
            pltpu.VMEM((wr, side), jnp.float32),       # divergence rhs
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=po.INTERPRET,
        compiler_params=None if po.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20
        ),
    )(u, v)
    if squeeze:
        return uo.reshape(side, side), vo.reshape(side, side)
    return uo, vo
