import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
t0=time.time()
x = jnp.ones((256, 256)); _ = float(jax.jit(lambda a: (a*2).sum())(x))
print(f"device alive {time.time()-t0:.1f}s", flush=True)
from fluidsimulationcuda_tpu.kernels import pallas_ops
side = 2048
xa = jax.random.uniform(jax.random.key(0), (side, side), jnp.float32, -1, 1)
t0=time.time()
out = pallas_ops.fused_jacobi(0, xa, xa, 1.0, 4.0, 14, zero_init=True, cheby_rho=0.9)
_ = float(out.ravel()[0])
print(f"2048 cheby-14 single-call: compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time()
out = pallas_ops.fused_jacobi(0, xa, xa, 1.0, 4.0, 14, zero_init=True, cheby_rho=0.9, max_fused=7)
_ = float(out.ravel()[0])
print(f"2048 cheby-14 CHAINED 7+7: compile+run {time.time()-t0:.1f}s", flush=True)
from fluidsimulationcuda_tpu.ops.chebyshev import cheby_pressure_solve
ref = cheby_pressure_solve(xa, 14, 0.9)
d = float(jnp.max(jnp.abs(ref - out)))
print(f"2048 chained-vs-spec max diff: {d:.2e}", flush=True)
t0=time.time()
for _i in range(10):
    out = pallas_ops.fused_jacobi(0, xa, xa, 1.0, 4.0, 14, zero_init=True, cheby_rho=0.9, max_fused=7)
_ = float(out.ravel()[0]); tc = (time.time()-t0)/10
for _i in range(10):
    out2 = pallas_ops.fused_jacobi(0, xa, xa, 1.0, 4.0, 14, zero_init=True, cheby_rho=0.9)
_ = float(out2.ravel()[0])
print(f"2048 chained {tc*1e3:.2f} ms vs single {(time.time()-t0-tc*10)/10*1e3:.2f} ms", flush=True)
