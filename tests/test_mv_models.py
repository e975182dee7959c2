"""Multivariate model-class consistency tests.

Strategy (cf. `/root/reference/tests/testthat/test_is.R:41`): a p=1
multivariate non-Gaussian model must agree exactly with the univariate
class, and bivariate models must run end-to-end through MCMC.
"""
import numpy as np

import jax
import jax.numpy as jnp

from bssm_tpu.core.priors import halfnormal_prior, normal_prior
from bssm_tpu.inference import approx as approx_uni
from bssm_tpu.inference import approx_mv
from bssm_tpu.inference.mcmc import run_mcmc
from bssm_tpu.models.ssm import ssm_mlg, ssm_mng, ssm_ung


def test_mng_p1_equals_ung(rng):
    n = 30
    alpha = np.cumsum(rng.normal(0, 0.2, n))
    y = rng.poisson(np.exp(alpha)).astype(float)
    y[3] = np.nan

    uni = ssm_ung(y, Z=np.ones(1), T=np.ones((1, 1)), R=np.full((1, 1), 0.2),
                  distribution="poisson", P1=np.eye(1) * 2.0)
    mv = ssm_mng(y[:, None], Z=np.ones((1, 1, 1)), T=np.ones((1, 1)),
                 R=np.full((1, 1), 0.2), distributions=["poisson"],
                 P1=np.eye(1) * 2.0)

    su = uni.build(uni.theta_init)
    sm = mv.build(mv.theta_init)
    al_u = approx_uni.approx_loglik(su)
    al_m = approx_mv.approx_loglik_mv(sm)
    np.testing.assert_allclose(float(al_u.loglik), float(al_m.loglik),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(al_u.approx.mode),
                               np.asarray(al_m.approx.mode[:, 0]), atol=1e-8)

    # psi filters estimate the same likelihood
    ll_u = np.array([float(jax.jit(
        lambda k: __import__("bssm_tpu.inference.particle",
                             fromlist=["psi_filter"]).psi_filter(
            su, al_u, 128, k).loglik)(k))
        for k in jax.random.split(jax.random.PRNGKey(0), 30)])
    ll_m = np.array([float(jax.jit(
        lambda k: approx_mv.psi_filter_mv(sm, al_m, 128, k).loglik)(k))
        for k in jax.random.split(jax.random.PRNGKey(1), 30)])
    assert abs(ll_u.mean() - ll_m.mean()) < 0.1


def test_mlg_mcmc_with_update_fn(rng):
    """Bivariate LG model with a user JAX update function
    (the reference README ssm_mlg example pattern)."""
    n = 40
    x = np.cumsum(rng.normal(0, 0.5, n))
    y = np.stack([x + rng.normal(0, 1.0, n),
                  x + rng.normal(0, 1.3, n)], axis=1)

    def update_fn(theta):
        sds = jnp.exp(theta)
        H = jnp.diag(sds[:2])
        R = sds[2].reshape(1, 1, 1)
        return {"H": H[None], "R": R}

    def prior_fn(theta):
        return jnp.sum(-0.5 * jnp.square(jnp.exp(theta)) + theta)

    model = ssm_mlg(y, Z=np.ones((2, 1)), H=np.eye(2),
                    T=np.ones((1, 1)), R=np.full((1, 1), 0.5),
                    P1=np.eye(1) * 10.0,
                    init_theta=np.log([1.0, 1.0, 0.5]),
                    update_fn=update_fn, prior_fn=prior_fn)
    out = run_mcmc(model, iter=1500, seed=2, output_type="full")
    th = out.flat_theta()
    assert np.all(np.isfinite(th))
    # recovers the observation sds within loose tolerance (log-space theta)
    assert abs(np.exp(th[:, 0].mean()) - 1.0) < 0.5
    assert abs(np.exp(th[:, 2].mean()) - 0.5) < 0.4
    assert out.alpha is not None


def test_predict_mv_p1_equals_univariate(rng):
    """p=1 multivariate predict equals the univariate path exactly for the
    deterministic outputs (state recursion and mean map,
    `/root/reference/R/predict.R:190-221`)."""
    from bssm_tpu.inference.predict import predict
    from bssm_tpu.models.ssm import ssm_ulg
    n = 30
    x = np.cumsum(rng.normal(0, 0.5, n))
    y = x + rng.normal(0, 1.0, n)

    def upd_u(theta):
        return {"H": jnp.exp(theta[:1]), "R": jnp.exp(theta[1]).reshape(
            1, 1, 1)}

    def upd_m(theta):
        return {"H": jnp.exp(theta[0]).reshape(1, 1, 1),
                "R": jnp.exp(theta[1]).reshape(1, 1, 1)}

    def prior_fn(theta):
        return jnp.sum(-0.5 * jnp.square(jnp.exp(theta)) + theta)

    uni = ssm_ulg(y, Z=np.ones(1), H=np.ones(1), T=np.ones((1, 1)),
                  R=np.full((1, 1), 0.5), P1=np.eye(1) * 10.0,
                  init_theta=np.log([1.0, 0.5]), update_fn=upd_u,
                  prior_fn=prior_fn)
    out = run_mcmc(uni, iter=300, seed=2, output_type="full")

    h = 8
    fut_u = ssm_ulg(np.full(h, np.nan), Z=np.ones(1), H=np.ones(1),
                    T=np.ones((1, 1)), R=np.full((1, 1), 0.5),
                    P1=np.eye(1) * 10.0, init_theta=np.log([1.0, 0.5]),
                    update_fn=upd_u, prior_fn=prior_fn)
    fut_m = ssm_mlg(np.full((h, 1), np.nan), Z=np.ones((1, 1)),
                    H=np.eye(1), T=np.ones((1, 1)), R=np.full((1, 1), 0.5),
                    P1=np.eye(1) * 10.0, init_theta=np.log([1.0, 0.5]),
                    update_fn=upd_m, prior_fn=prior_fn)
    ps_u = predict(out, fut_u, type="state", nsim=64, seed=3)
    ps_m = predict(out, fut_m, type="state", nsim=64, seed=3)
    np.testing.assert_allclose(ps_m, ps_u, rtol=1e-12, atol=1e-12)
    pm_u = predict(out, fut_u, type="mean", nsim=64, seed=3)
    pm_m = predict(out, fut_m, type="mean", nsim=64, seed=3)
    np.testing.assert_allclose(pm_m[..., 0], pm_u, rtol=1e-12, atol=1e-12)
    pr_m = predict(out, fut_m, type="response", nsim=256, seed=3)
    assert pr_m.shape == (256, h, 1)
    # response spread = mean spread + obs noise (sd ~ exp(theta_1) ~ 1)
    assert pr_m.std() > pm_m.std()


def test_predict_fitted_mv_mixed(rng):
    """Bivariate mixed-family (poisson + gaussian) predictive moments
    (`/root/reference/R/predict.R:296-327`)."""
    from bssm_tpu.inference.predict import fitted, predict
    n = 35
    lvl = np.cumsum(rng.normal(0, 0.3, n))
    y = np.stack([rng.poisson(np.exp(lvl)).astype(float),
                  lvl + rng.normal(0, 0.5, n)], axis=1)

    def update_fn(theta):
        return {"R": jnp.exp(theta[0]).reshape(1, 1, 1)}

    def prior_fn(theta):
        return -0.5 * jnp.square(jnp.exp(theta[0])) + theta[0]

    def build_model(yy):
        return ssm_mng(yy, Z=np.ones((2, 1)), T=np.ones((1, 1)),
                       R=np.full((1, 1), 0.3),
                       distributions=["poisson", "gaussian"],
                       phi=np.array([1.0, 0.5]), P1=np.eye(1) * 5.0,
                       init_theta=np.log([0.3]), update_fn=update_fn,
                       prior_fn=prior_fn)

    model = build_model(y)
    out = run_mcmc(model, iter=600, particles=10, mcmc_type="is2", seed=4,
                   output_type="full")
    h = 6
    future = build_model(np.full((h, 2), np.nan))
    pm = predict(out, future, type="mean", nsim=400, seed=1)
    pr = predict(out, future, type="response", nsim=400, seed=1)
    assert pm.shape == (400, h, 2) and pr.shape == (400, h, 2)
    assert np.all(pm[..., 0] > 0)                 # poisson mean positive
    # gaussian series: response = mean + N(0, phi^2), phi = 0.5
    resid = pr[..., 1] - pm[..., 1]
    assert abs(resid.std() - 0.5) < 0.12
    # poisson series: response mean tracks the predictive mean
    np.testing.assert_allclose(pr[..., 0].mean(axis=0),
                               pm[..., 0].mean(axis=0), rtol=0.3, atol=0.5)
    # fitted replays the smoothed states through the obs equation
    ft = fitted(out, model, type="mean")
    assert ft.shape[1:] == (n, 2)
    # fitted poisson mean tracks the true latent intensity exp(lvl)
    assert np.corrcoef(ft[..., 0].mean(axis=0), np.exp(lvl))[0, 1] > 0.6
    # fitted gaussian mean tracks the latent level
    assert np.corrcoef(ft[..., 1].mean(axis=0), lvl)[0, 1] > 0.6


def test_mng_bivariate_mixed_mcmc(rng):
    n = 35
    lvl = np.cumsum(rng.normal(0, 0.3, n))
    y = np.stack([rng.poisson(np.exp(lvl)).astype(float),
                  lvl + rng.normal(0, 0.5, n)], axis=1)

    def update_fn(theta):
        return {"R": jnp.exp(theta[0]).reshape(1, 1, 1)}

    def prior_fn(theta):
        return -0.5 * jnp.square(jnp.exp(theta[0])) + theta[0]

    model = ssm_mng(y, Z=np.ones((2, 1)), T=np.ones((1, 1)),
                    R=np.full((1, 1), 0.3),
                    distributions=["poisson", "gaussian"],
                    phi=np.array([1.0, 0.5]), P1=np.eye(1) * 5.0,
                    init_theta=np.log([0.3]), update_fn=update_fn,
                    prior_fn=prior_fn)
    for mcmc_type in ("approx", "is2"):
        out = run_mcmc(model, iter=800,
                       particles=0 if mcmc_type == "approx" else 10,
                       mcmc_type=mcmc_type, seed=4, output_type="theta")
        assert np.all(np.isfinite(out.flat_theta())), mcmc_type
        assert np.all(np.isfinite(out.posterior)), mcmc_type
