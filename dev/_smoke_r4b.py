import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
t0=time.time()
x = jnp.ones((256, 256)); _ = float(jax.jit(lambda a: (a*2).sum())(x))
print(f"device alive {time.time()-t0:.1f}s", flush=True)
from fluidsimulationcuda_tpu.kernels import pallas_ops
side = 8192
t0=time.time()
xa = jax.random.uniform(jax.random.key(0), (side, side), jnp.float32, -1, 1)
_ = float(xa.ravel()[0])
print(f"8192 data {time.time()-t0:.1f}s", flush=True)
# control: plain jacobi-14 chained (no carry) — round-3 known-good path
t0=time.time()
out = pallas_ops.fused_jacobi(0, xa, xa, 1.0, 4.0, 14, zero_init=True)
_ = float(out.ravel()[0])
print(f"8192 jacobi-14 plain chain: {time.time()-t0:.1f}s", flush=True)
# the new carried chain
t0=time.time()
out = pallas_ops.fused_jacobi(0, xa, xa, 1.0, 4.0, 14, zero_init=True, cheby_rho=0.9)
_ = float(out.ravel()[0])
print(f"8192 cheby-14 carried chain: compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time()
for _i in range(5):
    out = pallas_ops.fused_jacobi(0, xa, xa, 1.0, 4.0, 14, zero_init=True, cheby_rho=0.9)
_ = float(out.ravel()[0])
print(f"8192 cheby-14 carried chain: {(time.time()-t0)/5*1e3:.2f} ms", flush=True)
