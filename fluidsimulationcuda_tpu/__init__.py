"""fluidsimulationcuda_tpu — a TPU-native stable-fluids simulation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ArbiterMob/FluidSimulationCuda (Jos Stam's *Stable Fluids* solver plus a
comparative parallelization study).  The reference's 19 standalone CUDA/C
programs collapse here into one engine:

- ``core``      — ``SimConfig`` / ``FluidState`` pytrees (reference L0 + config)
- ``oracle``    — NumPy ground-truth transcription of the sequential solver
- ``ops``       — the five core operators in pure jnp (reference backend)
- ``kernels``   — fused Pallas TPU kernels (performance backend)
- ``models``    — step composition: 2-D flagship, batched datagen, 3-D smoke
- ``parallel``  — multi-chip spatial decomposition (shard_map + halo exchange)
- ``utils``     — timing, checkpointing, profiling
"""

from .core.config import SimConfig
from .core.state import FluidState, Sources, reference_init, zero_sources, zero_state
from .models.stable_fluids_2d import StableFluids2D, make_step_fn, simulate, step, step_audited

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "FluidState",
    "Sources",
    "reference_init",
    "zero_state",
    "zero_sources",
    "StableFluids2D",
    "make_step_fn",
    "simulate",
    "step",
    "step_audited",
    "__version__",
]
