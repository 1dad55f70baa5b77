import sys, os, time
sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from fluidsimulationcuda_tpu.kernels import pallas_sharded_3d as p3

side = 256
flags = jnp.array([1, 1, 0], jnp.int32)

def tmin(f, *a, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)

for mz in (128, 32):
    for sweeps, H in ((4, 5), (1, 5), (1, 2)):
        x = jax.random.normal(jax.random.key(0), (mz + 2*H, side, side), jnp.float32)
        r = jax.random.normal(jax.random.key(1), (mz + 2*H, side, side), jnp.float32)
        f = jax.jit(lambda x, r, s=sweeps, h=H, m=mz: p3.fused_jacobi3_slab(
            0, x, r, flags, mz=m, H=h, alpha=1.0, beta=6.0, sweeps=s))
        tmin(f, x, r, reps=2)
        t = tmin(f, x, r)
        print(f"mz={mz} sweeps={sweeps} H={H}: {t*1e3:7.2f} ms/call", flush=True)
