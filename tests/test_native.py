"""Native host-kernel tests: C++ results == numpy/JAX references."""
import numpy as np

import jax

from bssm_tpu import native
from bssm_tpu.diagnostics.summary import iact as py_iact
from bssm_tpu.ops.resample import stratified_indices


def test_native_library_builds():
    assert native.get_lib() is not None, "g++ build of fastdiag failed"


def test_iact_batch_matches_python(rng):
    xs = np.stack([rng.normal(size=800),
                   np.cumsum(rng.normal(size=800)) * 0.1])
    out = native.iact_batch(xs)
    expected = np.array([py_iact(row) for row in xs])
    np.testing.assert_allclose(out, expected, rtol=1e-10)


def test_weighted_moments(rng):
    x = rng.normal(size=(500, 3))
    w = rng.uniform(0.1, 2.0, size=500)
    mean, var = native.weighted_moments(x, w)
    sw = w.sum()
    np.testing.assert_allclose(mean, (w[:, None] * x).sum(0) / sw,
                               rtol=1e-10)
    np.testing.assert_allclose(
        var, (w[:, None] * (x - mean) ** 2).sum(0) / sw, rtol=1e-8)


def test_stratified_sample_matches_device(rng):
    p = rng.uniform(0.1, 1.0, 64)
    p /= p.sum()
    r = rng.uniform(0, 1, 64)
    host = native.stratified_sample(p, r)
    # device version uses searchsorted on the same math
    import jax.numpy as jnp
    cp = np.cumsum(p)
    cp[-1] = 1.0
    u = (np.arange(64) + r) / 64
    expected = np.clip(np.searchsorted(cp, u, side="left"), 0, 63)
    np.testing.assert_array_equal(host, expected)
    # sanity: expected counts proportional to weights for many draws
    r2 = rng.uniform(0, 1, 64000)
    idx = native.stratified_sample(p, rng.uniform(0, 1, 64000))
    freq = np.bincount(idx % 64, minlength=64) / 64000
    np.testing.assert_allclose(freq, p, atol=0.01)
