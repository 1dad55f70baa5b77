"""Visualization helpers.

The reference's only "visualization" was printf grid dumps
(``printStateGrid``, ``FluidSequential.c:32-52``).  These helpers render
density / velocity fields to PNG (matplotlib, Agg backend — headless-safe).
"""
from __future__ import annotations

import numpy as np

__all__ = ["save_density_png", "save_velocity_png"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_density_png(path: str, dens, title: str = "density") -> str:
    plt = _plt()
    arr = np.asarray(dens)
    fig, ax = plt.subplots(figsize=(6, 6), dpi=120)
    im = ax.imshow(arr, origin="upper", cmap="magma")
    ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def save_velocity_png(path: str, u, v, stride: int = 0,
                      title: str = "velocity") -> str:
    plt = _plt()
    uu, vv = np.asarray(u), np.asarray(v)
    n = uu.shape[0]
    stride = stride or max(1, n // 48)
    speed = np.hypot(uu, vv)
    fig, ax = plt.subplots(figsize=(6, 6), dpi=120)
    im = ax.imshow(speed, origin="upper", cmap="viridis")
    ys, xs = np.mgrid[0:n:stride, 0:n:stride]
    ax.quiver(xs, ys, uu[::stride, ::stride], vv[::stride, ::stride],
              color="white", scale_units="xy", angles="xy", width=0.002)
    ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
