"""Persistent XLA/Mosaic compilation cache.

The solver step compiles ~10 distinct Pallas kernels; on a cold process via
the remote-compile path that costs minutes.  The persistent cache brings
repeat startup to ~1s/kernel.  Call early (before first jit execution).
"""
from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.cache/fluidsim_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax
        pass
