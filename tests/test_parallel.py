"""Sharded-chain tests on the virtual 8-device CPU mesh."""
import numpy as np

import jax

from bssm_tpu.core.priors import halfnormal_prior, uniform_prior
from bssm_tpu.inference.mcmc import run_mcmc
from bssm_tpu.models.ar1 import ar1_ng
from bssm_tpu.models.bsm import bsm_lg
from bssm_tpu.parallel.mesh import make_mesh


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_gaussian_chains(rng):
    n = 40
    y = np.cumsum(rng.normal(0, 0.3, n)) + rng.normal(0, 1.0, n)
    model = bsm_lg(y, sd_y=halfnormal_prior(1.0, 5.0),
                   sd_level=halfnormal_prior(0.3, 5.0))
    mesh = make_mesh(8, axes=("chains", "draws"), shape=(8, 1))
    out = run_mcmc(model, iter=500, seed=1, output_type="theta",
                   n_chains=16, mesh=mesh)
    assert out.theta.shape[0] == 16
    assert np.all(np.isfinite(out.theta))


def test_sharded_is2_correction(rng):
    n = 24
    alpha = np.zeros(n)
    for t in range(1, n):
        alpha[t] = 0.7 * alpha[t - 1] + 0.4 * rng.normal()
    y = rng.poisson(np.exp(alpha)).astype(float)
    model = ar1_ng(y, rho=uniform_prior(0.6, -0.99, 0.99),
                   sigma=halfnormal_prior(0.4, 1.0),
                   distribution="poisson")
    mesh = make_mesh(8, axes=("chains", "draws"), shape=(4, 2))
    out = run_mcmc(model, iter=400, particles=8, mcmc_type="is2", seed=5,
                   output_type="summary", n_chains=4, mesh=mesh,
                   corr_batch=64)
    assert np.all(np.isfinite(out.posterior))
    assert np.all(out.flat_weights() > 0)
    assert out.alphahat is not None and np.all(np.isfinite(out.alphahat))


def test_distributed_helpers_single_process():
    """initialize() is a no-op single-process; global_mesh covers all
    devices; local_chain_slice owns the whole axis."""
    from bssm_tpu.parallel.distributed import (global_mesh, initialize,
                                               local_chain_slice)
    assert initialize() is False
    mesh = global_mesh(("chains", "draws"), shape=(4, 2))
    assert dict(mesh.shape) == {"chains": 4, "draws": 2}
    assert local_chain_slice(100) == slice(0, 100)
