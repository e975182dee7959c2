"""Parallel (associative-scan) Kalman filter == sequential filter."""
import numpy as np

import jax.numpy as jnp

from bssm_tpu.ops import kalman, pkalman
from tests.test_kalman import random_lg


def test_parallel_filter_matches_sequential(rng):
    for tv in (False, True):
        spec = random_lg(rng, n=17, m=3, k=2, missing=True, tv=tv)
        seq = kalman.kfilter(spec)
        par = pkalman.kfilter_parallel(spec)
        np.testing.assert_allclose(np.asarray(par.att),
                                   np.asarray(seq.att), rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(par.Ptt),
                                   np.asarray(seq.Ptt), rtol=1e-6,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(par.at),
                                   np.asarray(seq.at[:-1]), rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(float(par.logLik), float(seq.logLik),
                                   rtol=1e-9)


def test_parallel_loglik_long_series(rng):
    spec = random_lg(rng, n=300, m=2, k=1, missing=False)
    np.testing.assert_allclose(
        float(pkalman.log_likelihood_parallel(spec)),
        float(kalman.log_likelihood(spec)), rtol=1e-8)


def test_parallel_fast_smoother(rng):
    for tv in (False, True):
        spec = random_lg(rng, n=23, m=3, k=2, missing=True, tv=tv)
        seq = kalman.fast_smoother(spec)
        par = pkalman.fast_smoother_parallel(spec)
        np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                                   rtol=1e-6, atol=1e-8)


def test_time_parallel_approx_matches(rng):
    import numpy as np
    from bssm_tpu.core import config
    from bssm_tpu.core.priors import halfnormal_prior
    from bssm_tpu.inference.approx import approx_loglik
    from bssm_tpu.models.bsm import bsm_ng
    y = rng.poisson(2.0, 40).astype(float)
    model = bsm_ng(y, sd_level=halfnormal_prior(0.2, 1.0),
                   distribution="poisson")
    spec = model.build(model.theta_init)
    ll_seq = float(approx_loglik(spec).loglik)
    with config.parallel_time():
        ll_par = float(approx_loglik(spec).loglik)
    np.testing.assert_allclose(ll_par, ll_seq, rtol=1e-8)
