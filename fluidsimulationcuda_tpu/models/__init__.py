from .stable_fluids_2d import StableFluids2D, make_step_fn, simulate, step, step_audited

__all__ = ["StableFluids2D", "make_step_fn", "simulate", "step", "step_audited"]
from .batched import batched_init, generate_trajectories, make_batched_step_fn

__all__ += ["batched_init", "generate_trajectories", "make_batched_step_fn"]
