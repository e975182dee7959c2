"""SDE model tests (`/root/reference/tests/testthat/test_sde.R` analogue).

Oracle: for GBM with sigma_x -> small the latent path is deterministic
(exponential growth), so the filter log-likelihood approaches the closed
form; also coarse vs fine filters must agree as L grows, and the full
pm/da/is2 MCMC runs end-to-end on sde_gbm.
"""
import numpy as np

import jax
import jax.numpy as jnp

from bssm_tpu.inference.mcmc import run_mcmc
from bssm_tpu.inference.sde import bsf_filter_sde
from bssm_tpu.models.sde import milstein, milstein_coupled, sde_gbm, \
    sde_poisson_ou


def simulate_gbm(n=25, mu=0.05, sx=0.2, sy=1.5, x0=1.0, seed=0):
    rng = np.random.default_rng(seed)
    x = x0
    y = np.zeros(n)
    for t in range(n):
        # exact GBM transition over unit time
        z = rng.normal()
        x = x * np.exp((mu - 0.5 * sx * sx) + sx * z)
        y[t] = np.log(x) + sy * rng.normal()
    return y


def test_milstein_matches_exact_gbm_moments():
    """Milstein at high L reproduces the exact GBM terminal distribution."""
    model = sde_gbm(np.zeros(1), L_f=8)
    spec = model.build(jnp.asarray([0.05, 0.2, 1.5]))
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    xs = jax.vmap(lambda k: milstein(spec, jnp.asarray(1.0), k, 8))(keys)
    xs = np.asarray(xs)
    # exact: E X_1 = exp(mu), Var = exp(2mu)(exp(sx^2)-1)
    np.testing.assert_allclose(xs.mean(), np.exp(0.05), rtol=0.02)
    np.testing.assert_allclose(xs.std(), np.sqrt(
        np.exp(2 * 0.05) * (np.exp(0.04) - 1.0)), rtol=0.1)


def test_milstein_coupling():
    """Coupled coarse/fine paths stay close (same Brownian increments)."""
    model = sde_gbm(np.zeros(1), L_f=7, L_c=3)
    spec = model.build(jnp.asarray([0.05, 0.2, 1.5]))
    keys = jax.random.split(jax.random.PRNGKey(1), 500)
    xf, xc = jax.vmap(lambda k: milstein_coupled(
        spec, jnp.asarray(1.0), jnp.asarray(1.0), k))(keys)
    diff = np.asarray(xf - xc)
    # strong coupling: per-path difference much smaller than path spread
    assert np.abs(diff).mean() < 0.2 * np.asarray(xf).std()


def test_bsf_levels_consistent():
    y = simulate_gbm(n=20)
    model = sde_gbm(y, L_f=6, L_c=2)
    spec = model.build(model.theta_init)
    run5 = jax.jit(lambda k: bsf_filter_sde(spec, 512, 5, k).loglik)
    run6 = jax.jit(lambda k: bsf_filter_sde(spec, 512, 6, k).loglik)
    keys = jax.random.split(jax.random.PRNGKey(2), 30)
    ll5 = np.array([float(run5(k)) for k in keys])
    ll6 = np.array([float(run6(k)) for k in keys])
    assert np.all(np.isfinite(ll5)) and np.all(np.isfinite(ll6))
    # discretisation bias between adjacent levels is small
    assert abs(ll5.mean() - ll6.mean()) < 3 * (ll5.std() + ll6.std()) + 0.5


def test_coupled_coarse_fine_estimators():
    """Same-key coarse (L_c) and fine (L_f) BSFs with couple=True share
    Brownian paths: their log-likelihoods are positively correlated and the
    multilevel IS weight ll_f - ll_c has a smaller spread than with
    independent keys (`/root/reference/src/model_ssm_sde.h:45-48`,
    `/root/reference/src/approx_mcmc.cpp:522-591`)."""
    y = simulate_gbm(n=15)
    model = sde_gbm(y, L_f=5, L_c=2)
    spec = model.build(model.theta_init)
    keys = jax.random.split(jax.random.PRNGKey(0), 100)
    keys2 = jax.random.split(jax.random.PRNGKey(99), 100)
    runc = jax.jit(jax.vmap(
        lambda k: bsf_filter_sde(spec, 32, 2, k, couple=True).loglik))
    runf = jax.jit(jax.vmap(
        lambda k: bsf_filter_sde(spec, 32, 5, k, couple=True).loglik))
    llc = np.asarray(runc(keys))
    llf = np.asarray(runf(keys))
    llf_ind = np.asarray(runf(keys2))
    r = np.corrcoef(llc, llf)[0, 1]
    assert r > 0.2, r
    assert np.std(llf - llc) < 0.8 * np.std(llf_ind - llc)


def test_coupled_milstein_gen_level():
    """milstein(gen_L=L_f) at the coarse level consumes the summed fine
    increments: coarse and fine terminal values from the same key stay
    close (the milstein_coupled identity)."""
    model = sde_gbm(np.zeros(1), L_f=7, L_c=3)
    spec = model.build(jnp.asarray([0.05, 0.2, 1.5]))
    keys = jax.random.split(jax.random.PRNGKey(1), 300)
    xf = jax.vmap(lambda k: milstein(spec, jnp.asarray(1.0), k, 7,
                                     gen_L=7))(keys)
    xc = jax.vmap(lambda k: milstein(spec, jnp.asarray(1.0), k, 3,
                                     gen_L=7))(keys)
    diff = np.asarray(xf - xc)
    assert np.abs(diff).mean() < 0.2 * np.asarray(xf).std()


def test_sde_mcmc_interleaved_particle_counts():
    """Two sde models with different particle counts interleaved in one
    process produce independent, correct runs (regression for the former
    module-global coarse particle count)."""
    y = simulate_gbm(n=12)
    m1 = sde_gbm(y, L_f=4, L_c=2)
    m2 = sde_gbm(y + 0.1, L_f=4, L_c=2)
    o1a = run_mcmc(m1, iter=150, particles=8, mcmc_type="is2", seed=1,
                   output_type="theta")
    o2 = run_mcmc(m2, iter=150, particles=16, mcmc_type="is2", seed=1,
                  output_type="theta")
    o1b = run_mcmc(m1, iter=150, particles=8, mcmc_type="is2", seed=1,
                   output_type="theta")
    assert np.all(np.isfinite(o2.posterior))
    # the interleaved run with different particles must not perturb m1
    np.testing.assert_array_equal(o1a.theta, o1b.theta)
    np.testing.assert_array_equal(o1a.weights, o1b.weights)


def test_sde_mcmc_variants():
    y = simulate_gbm(n=15)
    model = sde_gbm(y, L_f=4, L_c=2)
    for mcmc_type in ("pm", "da", "is2"):
        out = run_mcmc(model, iter=300, particles=16, mcmc_type=mcmc_type,
                       seed=3, output_type="full")
        th = out.flat_theta()
        assert np.all(np.isfinite(th)), mcmc_type
        assert np.all(np.isfinite(out.posterior)), mcmc_type
        assert out.alpha is not None
        # theta stays in the prior support
        assert th[:, 2].min() >= 0.5


def test_sde_poisson_ou_runs():
    rng = np.random.default_rng(5)
    y = rng.poisson(1.0, size=12).astype(float)
    model = sde_poisson_ou(y, L_f=4, L_c=2)
    out = run_mcmc(model, iter=200, particles=8, mcmc_type="is2", seed=6,
                   output_type="theta")
    assert np.all(np.isfinite(out.flat_theta()))
