"""Checkpoint / resume.

The reference has no persistence at all — state lives in RAM/VRAM for one
run (SURVEY.md §5).  Long-horizon runs and datagen need save/restore, so the
framework adds it: ``.npz`` of the state fields + the config, with exact
round-tripping (float32 bits preserved).
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SimConfig
from ..core.state import FluidState

__all__ = ["save_checkpoint", "load_checkpoint"]

_FIELDS = ("dens", "u", "v", "w")

# Schema version: bump on layout changes.  Loading is forward-tolerant on
# config fields regardless (unknown keys ignored, missing keys defaulted),
# so adding/renaming a SimConfig field never invalidates old checkpoints.
_SCHEMA_VERSION = 1


def save_checkpoint(path: str, state: FluidState, cfg: SimConfig,
                    step: int = 0) -> None:
    arrays = {
        name: np.asarray(getattr(state, name))
        for name in _FIELDS
        if getattr(state, name) is not None
    }
    meta = dataclasses.asdict(cfg)
    meta["dtype"] = np.dtype(cfg.dtype).name
    payload = dict(arrays)
    payload["_meta"] = np.frombuffer(
        json.dumps(
            {"version": _SCHEMA_VERSION, "config": meta, "step": step}
        ).encode(),
        dtype=np.uint8,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> tuple[FluidState, SimConfig, int]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["_meta"]).decode())
        version = meta.get("version", 0)
        if version > _SCHEMA_VERSION:
            raise ValueError(
                f"checkpoint {path!r} has schema version {version}, newer "
                f"than this build's {_SCHEMA_VERSION}; upgrade the framework"
            )
        cfg_d = meta["config"]
        cfg_d["dtype"] = jnp.dtype(cfg_d["dtype"])
        # Tolerant config load: drop keys this build no longer knows,
        # default the ones the checkpoint predates.
        known = {f.name for f in dataclasses.fields(SimConfig)}
        cfg = SimConfig(**{k: v for k, v in cfg_d.items() if k in known})
        fields = {
            name: jnp.asarray(z[name]) if name in z.files else None
            for name in _FIELDS
        }
    return FluidState(**fields), cfg, meta["step"]
