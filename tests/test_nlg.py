"""Nonlinear model tests.

Oracle strategy (`/root/reference/tests/testthat/test_ekpf.R` analogue):
on the *linear* example model, EKF == Kalman filter exactly, UKF == KF
exactly (linear propagation), the mode approximation converges in one step,
and psi-APF/BSF are unbiased against the exact KF log-likelihood.
The growth model exercises the nonlinear path end-to-end incl. IS-MCMC.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bssm_tpu.core.spec import LGSpec
from bssm_tpu.inference import nlg as nlg_mod
from bssm_tpu.inference.mcmc import run_mcmc
from bssm_tpu.models.examples import (nlg_ar_exp, nlg_growth,
                                      nlg_linear_gaussian, nlg_sin_exp,
                                      simulate_growth)
from bssm_tpu.ops import kalman


@pytest.fixture
def linear_case(rng):
    n = 25
    y = np.cumsum(rng.normal(0, 1.0, n)) + rng.normal(0, 1.0, n)
    y[5] = np.nan
    model = nlg_linear_gaussian(y)
    spec = model.build(model.theta_init)
    lg = LGSpec(y=jnp.asarray(y), Z=jnp.ones((1, 1)), H=jnp.ones(1),
                T=jnp.ones((1, 1, 1)), R=jnp.ones((1, 1, 1)),
                a1=jnp.zeros(1), P1=jnp.eye(1) * 1e2, D=jnp.zeros(1),
                C=jnp.zeros((1, 1)))
    return model, spec, lg


def test_ekf_equals_kf_linear(linear_case):
    model, spec, lg = linear_case
    ll_kf = float(kalman.log_likelihood(lg))
    r = nlg_mod.ekf(spec)
    np.testing.assert_allclose(float(r.logLik), ll_kf, rtol=1e-10)
    kf = kalman.kfilter(lg)
    np.testing.assert_allclose(np.asarray(r.at[:, 0]),
                               np.asarray(kf.at[:, 0]), rtol=1e-9)


def test_ukf_equals_kf_linear(linear_case):
    model, spec, lg = linear_case
    ll_kf = float(kalman.log_likelihood(lg))
    r = nlg_mod.ukf(spec)
    np.testing.assert_allclose(float(r.logLik), ll_kf, rtol=1e-8)


def test_ekf_smoother_equals_ks_linear(linear_case):
    model, spec, lg = linear_case
    sm_lg = kalman.smoother(lg)
    sm = nlg_mod.ekf_smoother(spec)
    np.testing.assert_allclose(np.asarray(sm.alphahat[:, 0]),
                               np.asarray(sm_lg.alphahat[:, 0]), rtol=1e-8,
                               atol=1e-10)


def test_ekf_fast_smoother_means_only(linear_case):
    """ekf_fast_smoother returns exactly the full smoother's means
    (`/root/reference/src/model_ssm_nlg.cpp:483-556`)."""
    model, spec, lg = linear_case
    sm = nlg_mod.ekf_smoother(spec)
    fast = nlg_mod.ekf_fast_smoother(spec)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(sm.alphahat),
                               rtol=1e-8, atol=1e-10)


def test_approximate_linear_is_exact(linear_case):
    model, spec, lg = linear_case
    ap = nlg_mod.approximate_nlg(spec)
    # for a linear model the "approximate" loglik is the exact loglik and
    # scales vanish
    ll_kf = float(kalman.log_likelihood(lg))
    np.testing.assert_allclose(float(ap.loglik), ll_kf, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ap.scales), 0.0, atol=1e-8)


def test_psi_bsf_unbiased_linear(linear_case):
    model, spec, lg = linear_case
    ll_kf = float(kalman.log_likelihood(lg))
    ap = nlg_mod.approximate_nlg(spec)

    psi = jax.jit(lambda k: nlg_mod.psi_filter_nlg(spec, ap, 32, k).loglik)
    keys = jax.random.split(jax.random.PRNGKey(0), 100)
    lls = np.array([float(psi(k)) for k in keys])
    est = np.log(np.mean(np.exp(lls - ll_kf)))
    assert abs(est) < 0.05
    assert np.std(lls) < 0.05   # psi on a linear model is near-exact

    bsf = jax.jit(lambda k: nlg_mod.bsf_filter_nlg(spec, 512, k).loglik)
    llb = np.array([float(bsf(k)) for k in keys[:40]])
    est_b = np.log(np.mean(np.exp(llb - ll_kf)))
    assert abs(est_b) < 0.1


def test_ekpf_unbiased_linear(linear_case):
    model, spec, lg = linear_case
    ll_kf = float(kalman.log_likelihood(lg))
    ekpf = jax.jit(lambda k: nlg_mod.ekpf_filter(spec, 128, k).loglik)
    keys = jax.random.split(jax.random.PRNGKey(2), 60)
    lls = np.array([float(ekpf(k)) for k in keys])
    est = np.log(np.mean(np.exp(lls - ll_kf)))
    assert abs(est) < 0.1


def test_growth_model_approximation():
    y = simulate_growth(n=60, seed=3)
    model = nlg_growth(y)
    spec = model.build(model.theta_init)
    ap = nlg_mod.approximate_nlg(spec)
    assert np.isfinite(float(ap.loglik))
    assert int(ap.niter) < 100
    # psi-APF self-consistency: 64 particles unbiased against a tight
    # 2048-particle psi reference (BSF is too heavy-tailed here for a stable
    # 40-reps comparison -- the psi-APF's variance advantage is the point,
    # cf. `vignettes/psi_pf.Rmd`)
    psi = jax.jit(lambda k: nlg_mod.psi_filter_nlg(spec, ap, 64, k).loglik)
    psi_big = jax.jit(lambda k: nlg_mod.psi_filter_nlg(spec, ap, 2048,
                                                       k).loglik)
    kp = jax.random.split(jax.random.PRNGKey(1), 40)
    ll_p = np.array([float(psi(k)) for k in kp])
    ll_ref = np.array([float(psi_big(k)) for k in kp[:10]])
    ref = np.mean(ll_ref)
    est_p = np.log(np.mean(np.exp(ll_p - ref)))
    assert abs(est_p) < 0.1
    assert np.std(ll_p) < 0.5
    assert np.std(ll_ref) < 0.1
    # BSF lands in the same neighbourhood (its log-estimates are biased
    # low by Jensen, so allow slack below)
    bsf = jax.jit(lambda k: nlg_mod.bsf_filter_nlg(spec, 4096, k).loglik)
    ll_b = np.array([float(bsf(k)) for k in kp[:10]])
    assert np.max(ll_b) > ref - 3.0
    assert np.max(ll_b) < ref + 1.0


def test_growth_mcmc_is2():
    y = simulate_growth(n=40, seed=4)
    model = nlg_growth(y)
    out = run_mcmc(model, iter=600, particles=16, mcmc_type="is2",
                   sampling_method="psi", seed=8, output_type="full")
    assert np.all(np.isfinite(out.flat_theta()))
    assert np.all(np.isfinite(out.posterior))
    assert out.alpha is not None and np.all(np.isfinite(out.alpha))


def test_sin_exp_and_ar_exp_build(rng):
    y = np.abs(rng.normal(1.0, 0.3, 30))
    for mk in (nlg_sin_exp, nlg_ar_exp):
        model = mk(y)
        spec = model.build(model.theta_init)
        r = nlg_mod.ekf(spec)
        assert np.isfinite(float(r.logLik))
