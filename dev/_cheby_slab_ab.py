import sys, time
sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from fluidsimulationcuda_tpu.kernels import pallas_sharded_3d as p3
from fluidsimulationcuda_tpu.ops.chebyshev import cheby_omegas

side, CHEBY, RHO = 256, 10, 0.85
flags = jnp.array([1, 1, 0], jnp.int32)
L1, L2 = 2, 8

def _ext(x, H):
    return jnp.pad(x, ((H, H), (0, 0), (0, 0)))

def make(mz, K):
    H = K + 1
    ws_all = [None] + [float(w) for w in cheby_omegas(RHO, CHEBY)]
    def run(x, rhs):
        rhs_ext = _ext(rhs, H)
        xm, done = None, 0
        while done < CHEBY:
            s = min(K, CHEBY - done)
            ws = tuple(ws_all[done:done + s])
            last = done + s >= CHEBY
            res = p3.fused_cheby3_slab(
                0, _ext(x, H), _ext(xm, H) if xm is not None else None,
                rhs_ext, flags, mz=mz, H=H, alpha=1.0, beta=6.0, ws=ws,
                carry_in=xm is not None, carry_out=not last)
            if last: x = res
            else: x, xm = res
            done += s
        return x
    return run

def scanned(f, length):
    @jax.jit
    def run(x, rhs):
        def body(c, _):
            return f(c, rhs), None
        out, _ = jax.lax.scan(body, x, None, length=length)
        return out
    return run

def tmin(f, *a, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*a); _ = float(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)

for mz in (256, 128):
    x = jax.random.normal(jax.random.key(2), (mz, side, side), jnp.float32)
    r = jax.random.normal(jax.random.key(3), (mz, side, side), jnp.float32)
    for K in (2, 3, 4, 5):
        try:
            f = make(mz, K)
            f1, f2 = scanned(f, L1), scanned(f, L2)
            tmin(f1, x, r, reps=2), tmin(f2, x, r, reps=2)
            t = (tmin(f2, x, r) - tmin(f1, x, r)) / (L2 - L1)
            print(f"mz={mz} K={K} (H={K+1}): {t*1e3:7.2f} ms/solve", flush=True)
        except Exception as e:
            print(f"mz={mz} K={K}: FAILED {str(e)[:100]}", flush=True)
