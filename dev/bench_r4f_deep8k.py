"""Does a deeper single call beat the carried chain at 8192^2?
_sweep_clamp (36MB planner budget) caps calls at 7 sweeps; the verified
96MB kernel cap has headroom for margin-16 (<=15-sweep) windows at
tm=128.  Times 14 sweeps as one deep call vs the 7+7 carried chain vs
plain 7+7, scan-amplified."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from fluidsimulationcuda_tpu.kernels import pallas_ops as po

side = 8192
a = jax.random.normal(jax.random.key(0), (side, side), jnp.float32)
L = 8

def tmin(f, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(a)
        _ = float(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)

def scan(fn):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=L)
        return out
    return run

tm = po._pick_tm(side)
deep = scan(lambda x: po._fused_jacobi_call(
    0, x, x, 1.0, 4.0, 14, tm, side, True, None, False, 0, None, 0.9))
chain = scan(lambda x: po.fused_jacobi(
    0, x, x, 1.0, 4.0, 14, zero_init=True, cheby_rho=0.9))
plain = scan(lambda x: po.fused_jacobi(0, x, x, 1.0, 4.0, 14,
                                       zero_init=True))
for label, f in (("deep single-call cheby-14 (margin 16)", deep),
                 ("carried chain cheby-14 (7+7)", chain),
                 ("plain jacobi-14 (7+7, no carry)", plain)):
    tmin(f, 2)
    print(f"{label:40s} {tmin(f) / L * 1e3:8.3f} ms/solve", flush=True)
