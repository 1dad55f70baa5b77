"""Round-3k: what does the in-sweep BC cost per sweep?

The fused Jacobi sweep rewrites two single-lane ghost columns per sweep
(`_apply_bnd_window`) — (wr, 1) masked stores Mosaic may handle poorly.
This measures the 40-vs-20 marginal sweep cost with the BC no-op'd
(numerically WRONG — timing probe only) vs stock, plus a variant keeping
only the row BC (the pl.when'd wall strips) without the column stores.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulationcuda_tpu.kernels import pallas_ops as po  # noqa: E402


def sync(x):
    _ = float(x.ravel()[0])


def marginal(label, k1=20, k2=40, reps=3, length=12):
    """(T[iters=k2] - T[iters=k1]) per sweep, each T amplified by a
    ``length``-long scan of whole kernel calls (relay noise >> one call)."""
    side = 2048
    a = jax.random.normal(jax.random.key(0), (side, side), jnp.float32)

    def make(iters):
        @jax.jit
        def f(x):
            def body(c, _):
                return po.fused_jacobi(1, c, c, 1.0, 4.0, iters), None
            out, _ = jax.lax.scan(body, x, None, length=length)
            return out
        return f

    f1, f2 = make(k1), make(k2)

    def tmin(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(a)
            sync(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tmin(f1)
    tmin(f2)
    dt = (tmin(f2) - tmin(f1)) / (k2 - k1) / length * 1e6
    print(f"{label:46s} {dt:8.2f} us/sweep", flush=True)
    return dt


def main():
    print(f"devices={jax.devices()}", flush=True)
    marginal("stock sweep (full BC)")

    orig = po._apply_bnd_window

    def no_bc(dst, b, start, wr, side, corners=True, signs=None):
        return

    def rows_only(dst, b, start, wr, side, corners=True, signs=None):
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        if signs is None:
            sx, sy = po._signs(b)
        else:
            sx, sy = signs
        sy = jnp.asarray(sy, dst.dtype)

        @pl.when(start == 0)
        def _():
            dst[0:1, :] = sy * dst[1:2, :]

        @pl.when(start + wr == side)
        def _():
            dst[wr - 1 : wr, :] = sy * dst[wr - 2 : wr - 1, :]

    try:
        po._apply_bnd_window = no_bc
        marginal("no BC at all (timing probe, WRONG numerics)")
        po._apply_bnd_window = rows_only
        marginal("row BC only (no ghost-column stores)")
    finally:
        po._apply_bnd_window = orig


if __name__ == "__main__":
    main()
