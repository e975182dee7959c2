"""GLM-limit oracle: with degenerate state noise the Laplace approximation
reproduces IRLS/glm fits exactly (`/root/reference/tests/testthat/
test_approx.R:61-143`), and MCMC wall time is linear in series length
(`test_mcmc.R:68-104`)."""
import time

import numpy as np
import pytest

import jax.numpy as jnp

from bssm_tpu.core.priors import halfnormal_prior
from bssm_tpu.inference.approx import approximate
from bssm_tpu.models.ssm import ssm_ung


def irls_poisson(y, X, iters=50):
    """Plain IRLS for Poisson regression with log link."""
    beta = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = X @ beta
        mu = np.exp(eta)
        W = mu
        z = eta + (y - mu) / mu
        beta = np.linalg.solve(X.T @ (W[:, None] * X), X.T @ (W * z))
    return beta


def test_poisson_glm_limit(rng):
    n = 80
    x = rng.normal(size=n)
    beta_true = np.array([0.4, 0.7])
    y = rng.poisson(np.exp(beta_true[0] + beta_true[1] * x)).astype(float)
    X = np.column_stack([np.ones(n), x])
    beta_glm = irls_poisson(y, X)

    # intercept as a diffuse constant state, slope via xreg -> D
    def update_fn(theta):
        return {}

    model = ssm_ung(y, Z=np.ones(1), T=np.ones((1, 1)),
                    R=np.zeros((1, 1)), distribution="poisson",
                    a1=np.zeros(1), P1=np.eye(1) * 1e5,
                    D=beta_glm[1] * x)
    spec = model.build(model.theta_init)
    ar = approximate(spec, conv_tol=1e-12, max_iter=200)
    # mode signal = beta1 x + intercept-state; intercept must equal glm's
    intercept = np.asarray(ar.mode) - beta_glm[1] * x
    np.testing.assert_allclose(intercept, beta_glm[0], atol=2e-3)
    # fitted means match glm fitted values
    np.testing.assert_allclose(np.exp(np.asarray(ar.mode)),
                               np.exp(X @ beta_glm), rtol=5e-3)


def test_binomial_glm_limit(rng):
    n = 120
    x = rng.normal(size=n)
    p = 1.0 / (1.0 + np.exp(-(0.3 + 0.9 * x)))
    y = rng.binomial(1, p).astype(float)
    X = np.column_stack([np.ones(n), x])

    # IRLS for logistic regression
    beta = np.zeros(2)
    for _ in range(100):
        eta = X @ beta
        mu = 1 / (1 + np.exp(-eta))
        W = mu * (1 - mu)
        z = eta + (y - mu) / np.maximum(W, 1e-10)
        beta = np.linalg.solve(X.T @ (W[:, None] * X), X.T @ (W * z))

    model = ssm_ung(y, Z=np.ones(1), T=np.ones((1, 1)),
                    R=np.zeros((1, 1)), distribution="binomial",
                    a1=np.zeros(1), P1=np.eye(1) * 1e5, D=beta[1] * x)
    spec = model.build(model.theta_init)
    ar = approximate(spec, conv_tol=1e-12, max_iter=200)
    intercept = np.asarray(ar.mode) - beta[1] * x
    np.testing.assert_allclose(intercept, beta[0], atol=5e-3)


@pytest.mark.slow
def test_mcmc_linear_in_series_length(rng):
    """Wall time O(n) (`test_mcmc.R:68-104`); generous tolerance to survive
    CI noise."""
    from bssm_tpu.inference.mcmc import run_mcmc
    from bssm_tpu.models.bsm import bsm_lg

    times = {}
    for n in (512, 2048):
        y = np.cumsum(rng.normal(0, 0.3, n)) + rng.normal(0, 1.0, n)
        model = bsm_lg(y, sd_y=halfnormal_prior(1.0, 5.0),
                       sd_level=halfnormal_prior(0.3, 5.0))
        run_mcmc(model, iter=300, seed=1, output_type="theta")  # compile
        t0 = time.time()
        run_mcmc(model, iter=300, seed=2, output_type="theta")
        times[n] = time.time() - t0
    ratio = times[2048] / times[512]
    from parity_record import record
    record("mcmc_linear_in_series_length",
           {"t_512": times[512], "t_2048": times[2048], "ratio": ratio},
           {"ratio": ["< 8.0 (4x data, 2x slack over linear)", 8.0]})
    assert ratio < 8.0, times   # 4x data -> at most ~2x slack over linear


def test_negbin_glm_limit(rng):
    """Negative-binomial GLM limit with known dispersion: degenerate state
    noise must reproduce IRLS coefficients
    (`/root/reference/tests/testthat/test_approx.R:100-121`)."""
    n = 150
    phi = 3.0
    x = rng.normal(size=n)
    mu = np.exp(0.5 + 0.6 * x)
    y = rng.negative_binomial(phi, phi / (phi + mu)).astype(float)
    X = np.column_stack([np.ones(n), x])

    beta = np.zeros(2)
    for _ in range(100):
        eta = X @ beta
        m = np.exp(eta)
        W = m / (1.0 + m / phi)
        z = eta + (y - m) / m
        beta = np.linalg.solve(X.T @ (W[:, None] * X), X.T @ (W * z))

    model = ssm_ung(y, Z=np.ones(1), T=np.ones((1, 1)),
                    R=np.zeros((1, 1)), distribution="negative binomial",
                    phi=phi, a1=np.zeros(1), P1=np.eye(1) * 1e5,
                    D=beta[1] * x)
    spec = model.build(model.theta_init)
    ar = approximate(spec, conv_tol=1e-12, max_iter=200)
    intercept = np.asarray(ar.mode) - beta[1] * x
    np.testing.assert_allclose(intercept, beta[0], atol=5e-3)
    np.testing.assert_allclose(np.exp(np.asarray(ar.mode)),
                               np.exp(X @ beta), rtol=1e-2)


def test_gamma_glm_limit(rng):
    """Gamma GLM limit (log link, known shape): the Laplace mode must
    match IRLS — for log-link gamma the IRLS weights are constant, so the
    fit is one WLS solve (`/root/reference/tests/testthat/
    test_approx.R:122-143`)."""
    n = 150
    phi = 2.0
    x = rng.normal(size=n)
    mu = np.exp(0.8 + 0.5 * x)
    y = rng.gamma(phi, mu / phi) + 1e-8
    X = np.column_stack([np.ones(n), x])

    beta = np.zeros(2)
    for _ in range(100):
        eta = X @ beta
        m = np.exp(eta)
        z = eta + (y - m) / m
        beta = np.linalg.solve(X.T @ X, X.T @ z)

    model = ssm_ung(y, Z=np.ones(1), T=np.ones((1, 1)),
                    R=np.zeros((1, 1)), distribution="gamma",
                    phi=phi, a1=np.zeros(1), P1=np.eye(1) * 1e5,
                    D=beta[1] * x)
    spec = model.build(model.theta_init)
    ar = approximate(spec, conv_tol=1e-12, max_iter=200)
    intercept = np.asarray(ar.mode) - beta[1] * x
    np.testing.assert_allclose(intercept, beta[0], atol=5e-3)
