"""Checkpoint/resume and EKF-MCMC tests."""
import os

import numpy as np

from bssm_tpu.core.priors import halfnormal_prior
from bssm_tpu.inference.mcmc import McmcOutput, run_mcmc
from bssm_tpu.models.bsm import bsm_lg
from bssm_tpu.models.examples import nlg_growth, simulate_growth


def test_save_load_resume(rng, tmp_path):
    n = 30
    y = np.cumsum(rng.normal(0, 0.3, n)) + rng.normal(0, 1.0, n)
    model = bsm_lg(y, sd_y=halfnormal_prior(1.0, 5.0),
                   sd_level=halfnormal_prior(0.3, 5.0))
    out = run_mcmc(model, iter=400, seed=1, output_type="theta", n_chains=3)
    path = os.path.join(tmp_path, "run.npz")
    out.save(path)
    back = McmcOutput.load(path)
    np.testing.assert_array_equal(back.theta, out.theta)
    assert back.mcmc_type == out.mcmc_type

    # resume from the per-chain final states (burnin=0, frozen S)
    out2 = run_mcmc(model, iter=200, burnin=0, seed=2, output_type="theta",
                    n_chains=3, theta_init=out.last_theta(model),
                    S=np.asarray(out.S))
    assert out2.theta.shape[0] == 3
    assert np.all(np.isfinite(out2.theta))
    # chains start where the previous run ended
    np.testing.assert_allclose(
        np.log(out2.theta[:, 0, :]).mean(),
        np.log(out.theta[:, -1, :]).mean(), atol=1.0)


def test_ekf_mcmc_nlg():
    y = simulate_growth(n=30, seed=7)
    model = nlg_growth(y)
    out = run_mcmc(model, iter=400, mcmc_type="ekf", seed=3,
                   output_type="full")
    assert np.all(np.isfinite(out.flat_theta()))
    assert np.all(np.isfinite(out.posterior))
    assert out.alpha is not None and np.all(np.isfinite(out.alpha))


def test_predict_nlg():
    from bssm_tpu.inference.predict import predict
    y = simulate_growth(n=25, seed=9)
    model = nlg_growth(y)
    out = run_mcmc(model, iter=300, mcmc_type="ekf", seed=5,
                   output_type="full")
    future = nlg_growth(np.full(8, np.nan))
    pr = predict(out, future, type="response", nsim=50, seed=1)
    assert pr.shape == (50, 8, 1)
    pm = predict(out, future, type="mean", nsim=50, seed=1)
    assert np.all(np.isfinite(pm))
    ps = predict(out, future, type="state", nsim=50, seed=1)
    assert ps.shape == (50, 8, 2)
