"""Freeze golden oracle fixtures (SURVEY.md §7.2: 32²/128² after 1 AND
100 steps).

Round 5 closes the blueprint gap: the existing fixtures stopped at
n30_s50 / n126_s1, so the joint oracle+engine drift guard
(``tests/test_golden.py``) never covered the long-horizon configs.  New
fixtures REUSE the source fields of the existing ones at the same n
(continuity: the s100 trajectory extends the frozen s50 one exactly),
so a regenerated fixture that disagrees with its shorter sibling's
prefix is itself evidence of drift.

Run once, commit the .npz outputs: python dev/gen_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")
from fluidsimulationcuda_tpu.oracle import numpy_ref as oracle  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def run_oracle(src, steps, n, iters):
    dens = np.zeros_like(src["dens_src"])
    u = np.zeros_like(dens)
    v = np.zeros_like(dens)
    zero = np.zeros_like(dens)
    for k in range(steps):
        s = ((src["dens_src"], src["u_src"], src["v_src"]) if k == 0
             else (zero, zero, zero))
        dens, u, v = oracle.step(dens, u, v, *s, dt=0.016, visc=0.0025,
                                 diff=0.1, n=n, iters=iters)
    return dens, u, v


def freeze(base_fixture, steps, out_name):
    with np.load(os.path.join(GOLDEN, base_fixture)) as z:
        n, iters = int(z["n"]), int(z["iters"])
        src = {k: z[k] for k in ("dens_src", "u_src", "v_src")}
    dens, u, v = run_oracle(src, steps, n, iters)
    out = os.path.join(GOLDEN, out_name)
    np.savez_compressed(out, dens=dens, u=u, v=v, n=n, steps=steps,
                        iters=iters, **src)
    print(f"froze {out_name}: n={n} steps={steps} iters={iters} "
          f"dens sum={dens.sum():.6f} max={np.abs(dens).max():.3e} "
          f"u max={np.abs(u).max():.3e}")


if __name__ == "__main__":
    freeze("n30_s50.npz", 100, "n30_s100.npz")
    freeze("n126_s1.npz", 50, "n126_s50.npz")
    freeze("n126_s1.npz", 100, "n126_s100.npz")
