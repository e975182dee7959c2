"""Public API surface smoke tests: every reference entry point has a
working equivalent (SURVEY.md §2.1 inventory)."""
import numpy as np

import bssm_tpu as bt


def test_api_surface_lg(rng):
    n = 30
    y = np.cumsum(rng.normal(0, 0.3, n)) + rng.normal(0, 1.0, n)
    model = bt.bsm_lg(y, sd_y=bt.halfnormal_prior(1.0, 5.0),
                      sd_level=bt.halfnormal_prior(0.3, 5.0))
    r = bt.kfilter(model)
    assert np.isfinite(float(r.logLik))
    assert np.isfinite(float(bt.logLik(model)))
    fs = bt.fast_smoother(model)
    sm = bt.smoother(model)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(sm.alphahat),
                               atol=1e-8)
    draws = bt.sim_smoother(model, nsim=8, seed=1)
    assert draws.shape == (8, n + 1, 1)
    pf = bt.bootstrap_filter(model, particles=64, seed=1)
    assert np.isfinite(float(pf.loglik))
    ps = bt.particle_smoother(model, particles=64, method="bsf", seed=1)
    assert np.all(np.isfinite(np.asarray(ps.alphahat)))


def test_api_surface_ng(rng):
    n = 25
    y = rng.poisson(2.0, n).astype(float)
    model = bt.bsm_ng(y, sd_level=bt.halfnormal_prior(0.2, 1.0),
                      distribution="poisson")
    g = bt.gaussian_approx(model)
    assert g.y.shape == (n,)
    assert np.isfinite(float(bt.logLik(model)))
    assert np.isfinite(float(bt.logLik(model, particles=32)))
    assert np.isfinite(float(bt.logLik(model, particles=32, method="bsf")))
    assert np.isfinite(float(bt.logLik(model, particles=32, method="spdk")))
    s = bt.importance_sample(model, nsim=16, seed=2)
    assert s.alpha.shape[0] == 16
    assert abs(float(s.weights.sum()) - 1.0) < 1e-6


def test_api_surface_nlg(rng):
    y = np.cumsum(rng.normal(0, 1, 20))
    model = bt.example_models.nlg_linear_gaussian(y)
    assert np.isfinite(float(bt.ekf(model).logLik))
    assert np.isfinite(float(bt.ukf(model).logLik))
    assert np.isfinite(float(bt.ekf_smoother(model).logLik))
    assert np.isfinite(float(bt.ekpf_filter(model, particles=32).loglik))
    assert np.isfinite(float(bt.logLik(model, method="ekf")))
    g = bt.gaussian_approx(model)
    assert g.y.shape[0] == 20
    pf = bt.bootstrap_filter(model, particles=32)
    assert np.isfinite(float(pf.loglik))


def test_api_surface_sde(rng):
    y = rng.normal(0, 1, 10)
    model = bt.sde_gbm(y, L_f=4, L_c=2)
    assert np.isfinite(float(bt.logLik(model, particles=64)))
    pf = bt.bootstrap_filter(model, particles=64)
    assert np.isfinite(float(pf.loglik))
