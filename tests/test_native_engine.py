"""Native C++ engine vs the NumPy oracle (three-way cross-validation with
the JAX backends).  Skipped when no C++ toolchain is available."""
import numpy as np
import pytest

from fluidsimulationcuda_tpu.oracle import numpy_ref as oracle
from fluidsimulationcuda_tpu.oracle import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


def _rand(rng, n):
    return rng.uniform(-1, 1, size=(n + 2, n + 2)).astype(np.float32)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_native_jacobi_matches_oracle(rng, mode):
    n = 24
    x, x0 = _rand(rng, n), _rand(rng, n)
    want = oracle.diffuse(mode, x, x0, 0.37, 1 + 4 * 0.37, 9)
    got = native.jacobi(x, x0, n=n, mode=mode, alpha=0.37,
                        beta=1 + 4 * 0.37, iters=9)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_native_advect_matches_oracle(rng, mode):
    n = 24
    d0, u, v = _rand(rng, n), _rand(rng, n), _rand(rng, n)
    want = oracle.advect(mode, d0, u, v, 0.016, n)
    got = native.advect(d0, u, v, n=n, mode=mode, dt=0.016)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_native_full_step_matches_oracle(rng):
    n = 24
    dens = np.zeros((n + 2, n + 2), np.float32)
    u = np.zeros_like(dens)
    v = np.zeros_like(dens)
    ds, us, vs = _rand(rng, n) * 0.1, _rand(rng, n), _rand(rng, n)
    dt, visc, diff, iters = 0.016, 0.0025, 0.1, 8

    want = oracle.step(dens, u, v, ds, us, vs, dt=dt, visc=visc,
                       diff=diff, n=n, iters=iters)
    got = native.step(dens.copy(), u.copy(), v.copy(), ds, us, vs,
                      n=n, dt=dt, visc=visc, diff=diff, iters=iters)
    for g, w, name in zip(got, want, ("dens", "u", "v")):
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-5, err_msg=name)


def test_native_multi_step_stable(rng):
    n = 24
    dens = np.zeros((n + 2, n + 2), np.float32)
    u = np.zeros_like(dens)
    v = np.zeros_like(dens)
    ds, us, vs = _rand(rng, n) * 0.1, _rand(rng, n), _rand(rng, n)
    z = np.zeros_like(ds)
    for k in range(20):
        s = (ds, us, vs) if k == 0 else (z, z, z)
        dens, u, v = native.step(dens, u, v, *s, n=n, dt=0.016,
                                 visc=0.0025, diff=0.1, iters=8)
    assert np.isfinite(dens).all() and np.isfinite(u).all()
    assert np.abs(dens).max() < 10
