import sys, os, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from fluidsimulationcuda_tpu import SimConfig
from fluidsimulationcuda_tpu.utils.validate import (
    inject_exact, audit_divergence, audit_diffusion_residual_twin)

cfg = SimConfig(n=8190, jacobi_iters=40, backend="pallas", max_courant=1)
state, _ = inject_exact(cfg)
bar = audit_divergence(cfg, state, 15)
print(f"jacobi-40 div bar (15 steps): {bar:.3e}", flush=True)
for rho, kd, kp in ((0.96, 12, 14), (0.96, 12, 12), (0.95, 13, 14)):
    c = dataclasses.replace(cfg, diffusion_solver="chebyshev",
                            pressure_solver="chebyshev", cheby_rho=rho,
                            cheby_iters=kd, cheby_press_iters=kp,
                            fast_math=True)
    d = audit_divergence(c, state, 15)
    r, _ = audit_diffusion_residual_twin(c, state, 15)
    print(f"rho={rho} k_d={kd} k_p={kp}: div {d:.3e} ({d<=bar}), "
          f"forced v-res(15) {r:.3f} ({r<=1.0})", flush=True)
