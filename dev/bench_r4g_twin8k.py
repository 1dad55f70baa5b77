import sys, os, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fluidsimulationcuda_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from fluidsimulationcuda_tpu import SimConfig
from fluidsimulationcuda_tpu.utils.validate import (
    inject_exact, audit_diffusion_residual_twin)

cfg = SimConfig(n=8190, jacobi_iters=40, backend="pallas", max_courant=1)
state, _ = inject_exact(cfg)
for rho, kd in ((0.95, 13), (0.94, 12), (0.96, 12)):
    c = dataclasses.replace(cfg, diffusion_solver="chebyshev",
                            pressure_solver="chebyshev", cheby_rho=rho,
                            cheby_iters=kd, cheby_press_iters=14,
                            fast_math=True)
    r, (rc, rj) = audit_diffusion_residual_twin(c, state, 8)
    print(f"rho={rho} k_d={kd}: forced v-residual ratio {r:.3f} "
          f"(cheby {rc:.3e} vs jacobi-40 {rj:.3e})", flush=True)
