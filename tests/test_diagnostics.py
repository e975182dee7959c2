"""Diagnostics, predict/fitted, post_correct and suggest_N tests."""
import numpy as np

from bssm_tpu.core.priors import halfnormal_prior, normal_prior, uniform_prior
from bssm_tpu.diagnostics.summary import (asymptotic_var, check_diagnostics,
                                          ess_is, estimate_ess, iact, rhat,
                                          summary)
from bssm_tpu.inference.mcmc import run_mcmc
from bssm_tpu.inference.postcorrect import post_correct, suggest_N
from bssm_tpu.inference.predict import fitted, predict
from bssm_tpu.models.ar1 import ar1_ng
from bssm_tpu.models.bsm import bsm_lg


def test_iact_white_noise(rng):
    x = rng.normal(size=5000)
    assert abs(iact(x) - 1.0) < 0.3


def test_iact_ar1(rng):
    # AR(1) with rho=0.9: IACT = (1+rho)/(1-rho) = 19
    rho = 0.9
    x = np.zeros(20000)
    for t in range(1, len(x)):
        x[t] = rho * x[t - 1] + rng.normal()
    tau = iact(x)
    assert 10 < tau < 30


def test_asymptotic_var_iid(rng):
    x = rng.normal(size=4000)
    av = asymptotic_var(x)
    # for iid data: var(x)/n
    assert abs(av / (x.var() / len(x)) - 1.0) < 0.4
    assert 2000 < estimate_ess(x) < 8000


def test_ess_is_uniform_weights():
    w = np.ones(100)
    assert abs(ess_is(w) - 100) < 1e-9
    w2 = np.zeros(100)
    w2[0] = 1.0
    assert abs(ess_is(w2) - 1.0) < 1e-9


def test_rhat_converged(rng):
    chains = rng.normal(size=(4, 2000))
    assert abs(rhat(chains) - 1.0) < 0.02


def _ar1_chains(rng, C=4, S=4000, phi=0.9):
    x = np.zeros((C, S))
    x[:, 0] = rng.normal(size=C) / np.sqrt(1 - phi * phi)
    for t in range(1, S):
        x[:, t] = phi * x[:, t - 1] + rng.normal(size=C)
    return x


def test_ess_bulk_ar1(rng):
    """Bulk-ESS on AR(1) chains matches C*S*(1-phi)/(1+phi) (Vehtari et
    al. 2021); validates the rank-normalised Geyer estimator."""
    from bssm_tpu.diagnostics.summary import ess_bulk, ess_tail, rhat_rank
    phi = 0.9
    c = _ar1_chains(rng, phi=phi)
    expected = c.size * (1 - phi) / (1 + phi)
    e = ess_bulk(c)
    assert 0.5 * expected < e < 1.8 * expected, (e, expected)
    assert rhat_rank(c) < 1.03
    et = ess_tail(c)
    assert np.isfinite(et) and 0.1 * expected < et < 3.0 * expected


def test_ess_bulk_iid(rng):
    from bssm_tpu.diagnostics.summary import ess_bulk, ess_tail
    c = rng.normal(size=(4, 2000))
    assert 0.6 * c.size < ess_bulk(c) < 1.6 * c.size
    assert ess_tail(c) > 0.25 * c.size


def test_rhat_rank_detects_mixing_failure(rng):
    """Shifted chains: rank-Rhat flags divergence; the folded term flags a
    pure scale mismatch that the location Rhat misses."""
    from bssm_tpu.diagnostics.summary import rhat_rank, ess_bulk
    c = rng.normal(size=(4, 1000))
    c[0] += 3.0                                   # location shift
    assert rhat_rank(c) > 1.2
    s = rng.normal(size=(4, 1000))
    s[0] *= 4.0                                   # scale-only mismatch
    assert rhat_rank(s) > 1.05
    assert ess_bulk(c) < 0.5 * c.size


def _poisson_fit(rng, iters=1500, output_type="full", mcmc_type="is2"):
    n = 40
    alpha = np.zeros(n)
    for t in range(1, n):
        alpha[t] = 0.7 * alpha[t - 1] + 0.4 * rng.normal()
    y = rng.poisson(np.exp(alpha)).astype(float)
    model = ar1_ng(y, rho=uniform_prior(0.6, -0.99, 0.99),
                   sigma=halfnormal_prior(0.4, 1.0),
                   distribution="poisson")
    out = run_mcmc(model, iter=iters, particles=10, mcmc_type=mcmc_type,
                   seed=3, output_type=output_type)
    return model, y, out


def test_summary_and_check(rng):
    model, y, out = _poisson_fit(rng)
    rows = summary(out, "theta", return_se=True)
    assert len(rows) == 2
    for r in rows:
        assert np.isfinite(r["Mean"]) and np.isfinite(r["SE"])
        assert r["ESS"] > 10
    txt = check_diagnostics(out)
    assert "Acceptance rate" in txt and "ESS" in txt


def test_predict_and_fitted(rng):
    model, y, out = _poisson_fit(rng)
    n = len(y)
    # future model over 10 steps
    future = ar1_ng(np.full(10, np.nan), rho=uniform_prior(0.6, -0.99, 0.99),
                    sigma=halfnormal_prior(0.4, 1.0),
                    distribution="poisson")
    pr = predict(out, future, type="response", nsim=200, seed=2)
    assert pr.shape == (200, 10)
    assert np.nanmean(pr) >= 0
    pm = predict(out, future, type="mean", nsim=200, seed=2)
    assert np.all(pm > 0)
    ft = fitted(out, model, type="mean")
    assert ft.shape[1] == n
    # fitted means should correlate with the data
    corr = np.corrcoef(ft.mean(axis=0), y)[0, 1]
    assert corr > 0.5


def test_post_correct_matches_is2(rng):
    model, y, out_approx = _poisson_fit(rng, mcmc_type="approx",
                                        output_type="full", iters=2500)
    corrected = post_correct(model, out_approx, particles=10, seed=5)
    assert corrected.weights is not None
    assert np.all(np.isfinite(corrected.posterior))
    # corrected posterior mean close to a direct is2 run
    out_is2 = run_mcmc(model, iter=2500, particles=10, mcmc_type="is2",
                       seed=3, output_type="theta")
    m1 = np.average(corrected.flat_theta(), axis=0,
                    weights=corrected.flat_weights())
    m2 = np.average(out_is2.flat_theta(), axis=0,
                    weights=out_is2.flat_weights())
    np.testing.assert_allclose(m1, m2, atol=0.1)


def test_suggest_N(rng):
    model, y, out = _poisson_fit(rng, iters=500, output_type="theta")
    res = suggest_N(model, replications=40)
    assert res["N"] <= 32       # psi-APF needs few particles
    assert res["sd"] < 1.0


def test_exports_and_validation(rng):
    model, y, out = _poisson_fit(rng, iters=400, output_type="full")
    df = out.to_dataframe("theta")
    assert set(df.columns) >= {"iter", "chain", "variable", "value",
                               "weight"}
    assert df["variable"].nunique() == 2
    ds = out.as_draws()
    assert "rho" in ds and ds["rho"].ndim == 2
    sdf = out.to_dataframe("states")
    assert len(sdf) > 0

    # validation errors (reference check_arguments semantics)
    import pytest
    from bssm_tpu.models.bsm import bsm_ng
    from bssm_tpu.core.priors import halfnormal_prior
    with pytest.raises(ValueError):
        bsm_ng(np.array([1.0, np.inf, 2.0]),
               sd_level=halfnormal_prior(0.1, 1), distribution="poisson")
    with pytest.raises(ValueError):
        bsm_ng(np.array([1.0, -2.0, 2.0]),
               sd_level=halfnormal_prior(0.1, 1), distribution="poisson")
    with pytest.raises(ValueError):
        bsm_ng(np.arange(10).astype(float),
               sd_level=halfnormal_prior(0.1, 1),
               sd_seasonal=halfnormal_prior(0.1, 1), period=2,
               distribution="poisson")


def test_phase_timer_and_profile_trace():
    import jax.numpy as jnp
    from bssm_tpu.diagnostics.profiling import PhaseTimer, profile_trace
    t = PhaseTimer()
    with t("a", sync=jnp.ones(4) * 2):
        pass
    with t("b"):
        pass
    rep = t.report(samples=100)
    assert set(rep) == {"a", "b", "total", "samples_per_s"}
    assert rep["total"] >= rep["a"]
    with profile_trace(None):       # no-op path
        x = 1
    assert x == 1


def test_suggest_N_behavioral(rng):
    """suggest_N's chosen N must actually achieve sd(log-weight at the
    MAP) < 1 while clearly-smaller N fails it
    (`/root/reference/R/post_correction.R:85-151`).  A noisy model (BSF on
    wiggly Poisson data) makes small N insufficient."""
    from bssm_tpu.core.priors import halfnormal_prior
    from bssm_tpu.models.bsm import bsm_ng
    y = rng.poisson(np.exp(1.5 * np.sin(np.arange(70) / 3.0)
                           + rng.normal(0, 0.4, 70))).astype(float)
    model = bsm_ng(y, sd_level=halfnormal_prior(0.3, 1.0),
                   distribution="poisson")
    res = suggest_N(model, candidates=(2, 10, 40, 160, 640),
                    replications=60, sampling_method="bsf")
    # the criterion holds at the chosen N ...
    assert res["sd"] < 1.0
    # ... and the recorded sweep shows smaller candidates failing it
    smaller = [v for k, v in res["all"].items() if k < res["N"]]
    assert smaller, "sweep chose the smallest candidate; not a behavioral test"
    assert all(v >= 1.0 for v in smaller), res
    # psi needs far fewer particles than bsf on the same model
    res_psi = suggest_N(model, candidates=(2, 10, 40, 160, 640),
                        replications=60, sampling_method="psi")
    assert res_psi["N"] <= res["N"]
    assert res_psi["sd"] < 1.0


def test_post_correct_without_stored_modes(rng):
    """post_correct upgrades a store_modes=False approx run by recomputing
    the Laplace approximation cold per head (r5: the memory-wall path)."""
    from bssm_tpu.core.priors import halfnormal_prior
    from bssm_tpu.models.bsm import bsm_ng
    y = rng.poisson(np.exp(np.cumsum(rng.normal(0, .1, 30)))).astype(float)
    model = bsm_ng(y, sd_level=halfnormal_prior(0.1, 1.0),
                   distribution="poisson")
    out = run_mcmc(model, iter=200, mcmc_type="approx", n_chains=2,
                   seed=5, output_type="theta", store_modes=False)
    assert out.modes is None
    cor = post_correct(model, out, particles=10, seed=2,
                       output_type="summary")
    assert cor.weights is not None
    assert np.all(np.isfinite(np.asarray(cor.posterior)))
    # statistics match a run with stored modes
    out2 = run_mcmc(model, iter=200, mcmc_type="approx", n_chains=2,
                    seed=5, output_type="theta", store_modes=True)
    cor2 = post_correct(model, out2, particles=10, seed=2,
                        output_type="summary")
    w1 = np.average(cor.flat_theta(), axis=0, weights=cor.flat_weights())
    w2 = np.average(cor2.flat_theta(), axis=0, weights=cor2.flat_weights())
    np.testing.assert_allclose(w1, w2, atol=0.05)
