"""Oracle tests for the Kalman engine.

Strategy (SURVEY.md §4): instead of KFAS, the independent oracle is exact
joint-Gaussian conditioning — for a small LG model we materialise the joint
covariance of (alpha_{0:n}, y_{0:n-1}) with dense numpy and condition
directly.  The Kalman filter/smoother must agree to ~1e-8 in f64.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bssm_tpu.core.spec import LGSpec
from bssm_tpu.ops import kalman
from bssm_tpu.ops.chol import conditional_cov_factors, psd_chol
from bssm_tpu.ops.simsmooth import simulate_states


def random_lg(rng, n=12, m=3, k=2, missing=True, tv=False):
    Zt = rng.normal(size=(n if tv else 1, m))
    H = np.abs(rng.normal(size=(n if tv else 1,))) + 0.5
    A = rng.normal(size=(m, m))
    T = np.stack([np.linalg.qr(A + 0.1 * rng.normal(size=(m, m)))[0] * 0.9
                  for _ in range(n if tv else 1)])
    R = rng.normal(size=(n if tv else 1, m, k)) * 0.7
    a1 = rng.normal(size=m)
    P1c = rng.normal(size=(m, m))
    P1 = P1c @ P1c.T + 0.5 * np.eye(m)
    D = rng.normal(size=(n if tv else 1,))
    C = rng.normal(size=(n if tv else 1, m)) * 0.3

    # simulate y
    alpha = np.zeros((n + 1, m))
    alpha[0] = rng.multivariate_normal(a1, P1)
    y = np.zeros(n)
    for t in range(n):
        Zt_t = Zt[t if tv else 0]
        y[t] = D[t if tv else 0] + Zt_t @ alpha[t] \
            + H[t if tv else 0] * rng.normal()
        alpha[t + 1] = C[t if tv else 0] + T[t if tv else 0] @ alpha[t] \
            + R[t if tv else 0] @ rng.normal(size=k)
    if missing:
        y[2] = np.nan
        y[7] = np.nan
    return LGSpec(y=jnp.asarray(y), Z=jnp.asarray(Zt), H=jnp.asarray(H),
                  T=jnp.asarray(T), R=jnp.asarray(R), a1=jnp.asarray(a1),
                  P1=jnp.asarray(P1), D=jnp.asarray(D), C=jnp.asarray(C))


def dense_joint(spec):
    """Exact joint distribution of (alpha_0..alpha_n, y_0..y_{n-1})."""
    n, m = spec.n, spec.m
    Z = np.asarray(jnp.broadcast_to(spec.Z, (n, m)))
    H = np.asarray(jnp.broadcast_to(spec.H, (n,)))
    T = np.asarray(jnp.broadcast_to(spec.T, (n, m, m)))
    RR = np.asarray(jnp.broadcast_to(spec.RR, (n, m, m)))
    D = np.asarray(jnp.broadcast_to(spec.D, (n,)))
    C = np.asarray(jnp.broadcast_to(spec.C, (n, m)))
    a1 = np.asarray(spec.a1)
    P1 = np.asarray(spec.P1)

    dim_a = (n + 1) * m
    mu_a = np.zeros(dim_a)
    cov_a = np.zeros((dim_a, dim_a))
    mu_a[:m] = a1
    cov_a[:m, :m] = P1
    for t in range(n):
        s, e = t * m, (t + 1) * m
        mu_a[e:e + m] = C[t] + T[t] @ mu_a[s:e]
        # cov with all previous blocks
        for r in range(t + 1):
            rs, re = r * m, (r + 1) * m
            blk = cov_a[rs:re, s:e] @ T[t].T
            cov_a[rs:re, e:e + m] = blk
            cov_a[e:e + m, rs:re] = blk.T
        cov_a[e:e + m, e:e + m] = T[t] @ cov_a[s:e, s:e] @ T[t].T + RR[t]

    # y = D + Z alpha + eps
    Zbig = np.zeros((n, dim_a))
    for t in range(n):
        Zbig[t, t * m:(t + 1) * m] = Z[t]
    mu_y = D + Zbig @ mu_a
    cov_y = Zbig @ cov_a @ Zbig.T + np.diag(H ** 2)
    cov_ay = cov_a @ Zbig.T
    return mu_a, cov_a, mu_y, cov_y, cov_ay


def oracle_conditional(spec):
    y = np.asarray(spec.y)
    obs = np.isfinite(y)
    mu_a, cov_a, mu_y, cov_y, cov_ay = dense_joint(spec)
    yo = y[obs]
    S = cov_y[np.ix_(obs, obs)]
    Sinv = np.linalg.inv(S)
    resid = yo - mu_y[obs]
    mean = mu_a + cov_ay[:, obs] @ Sinv @ resid
    cov = cov_a - cov_ay[:, obs] @ Sinv @ cov_ay[:, obs].T
    # loglik
    sign, logdet = np.linalg.slogdet(S)
    ll = -0.5 * (len(yo) * np.log(2 * np.pi) + logdet
                 + resid @ Sinv @ resid)
    return mean, cov, ll


@pytest.mark.parametrize("tv", [False, True])
def test_loglik_matches_dense_oracle(rng, tv):
    spec = random_lg(rng, tv=tv)
    _, _, ll_oracle = oracle_conditional(spec)
    ll = kalman.log_likelihood(spec)
    assert np.isfinite(ll)
    np.testing.assert_allclose(float(ll), ll_oracle, rtol=1e-8)


@pytest.mark.parametrize("tv", [False, True])
def test_smoother_matches_dense_oracle(rng, tv):
    spec = random_lg(rng, tv=tv)
    mean, cov, _ = oracle_conditional(spec)
    n, m = spec.n, spec.m
    sm = kalman.smoother(spec)
    mean_blocks = mean.reshape(n + 1, m)
    np.testing.assert_allclose(np.asarray(sm.alphahat), mean_blocks,
                               rtol=1e-7, atol=1e-8)
    for t in range(n + 1):
        np.testing.assert_allclose(
            np.asarray(sm.Vt[t]), cov[t * m:(t + 1) * m, t * m:(t + 1) * m],
            rtol=1e-6, atol=1e-8)
    # cross-covariances Cov(alpha_t, alpha_{t+1})
    for t in range(n):
        np.testing.assert_allclose(
            np.asarray(sm.ccov[t]),
            cov[t * m:(t + 1) * m, (t + 1) * m:(t + 2) * m],
            rtol=1e-6, atol=1e-8)


def test_fast_smoother_matches_smoother(rng):
    spec = random_lg(rng, tv=True)
    sm = kalman.smoother(spec)
    fs = kalman.fast_smoother(spec)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(sm.alphahat),
                               rtol=1e-8, atol=1e-10)


def test_fast_smoother_with_precomputed_stats(rng):
    spec = random_lg(rng)
    stats = kalman.forward_stats(spec)
    fs1 = kalman.fast_smoother(spec)
    fs2 = kalman.fast_smoother(spec, stats)
    np.testing.assert_allclose(np.asarray(fs1), np.asarray(fs2), atol=1e-12)
    # and with replaced y it must equal a fresh smoother on that y
    y2 = jnp.where(spec.obs_mask, spec.y + 0.3, spec.y)
    spec2 = spec._replace(y=y2)
    np.testing.assert_allclose(np.asarray(kalman.fast_smoother(spec2, stats)),
                               np.asarray(kalman.fast_smoother(spec2)),
                               atol=1e-12)


def test_filter_consistency(rng):
    spec = random_lg(rng)
    r = kalman.kfilter(spec)
    ll = kalman.log_likelihood(spec)
    np.testing.assert_allclose(float(r.logLik), float(ll), rtol=1e-12)
    # predicted means propagate filtered means
    n = spec.n
    T0 = np.asarray(spec.T[0])
    C0 = np.asarray(spec.C[0])
    for t in range(n):
        np.testing.assert_allclose(
            np.asarray(r.at[t + 1]), C0 + T0 @ np.asarray(r.att[t]),
            rtol=1e-8, atol=1e-10)


def test_conditional_cov_factors(rng):
    """joint draw via conditionals must have the smoothed joint moments."""
    spec = random_lg(rng, n=6, m=2, k=2, missing=False)
    sm = kalman.smoother(spec)
    Lc, Ac = conditional_cov_factors(sm.Vt, sm.ccov)
    mean, cov, _ = oracle_conditional(spec)
    n, m = spec.n, spec.m
    # check conditional moments: Var(a_t | a_{t-1}) = V_t - A V_{t-1} A'
    for t in range(1, n + 1):
        Vt = cov[t * m:(t + 1) * m, t * m:(t + 1) * m]
        Vp = cov[(t - 1) * m:t * m, (t - 1) * m:t * m]
        Cc = cov[(t - 1) * m:t * m, t * m:(t + 1) * m]
        A_or = Cc.T @ np.linalg.inv(Vp)
        np.testing.assert_allclose(np.asarray(Ac[t]), A_or, rtol=1e-5,
                                   atol=1e-7)
        Lor = Vt - A_or @ Cc
        np.testing.assert_allclose(
            np.asarray(Lc[t] @ Lc[t].T), Lor, rtol=1e-5, atol=1e-7)


def test_psd_chol_zero_rows():
    M = np.array([[2.0, 0.0, 0.4], [0.0, 0.0, 0.0], [0.4, 0.0, 1.0]])
    L = np.asarray(psd_chol(jnp.asarray(M)))
    np.testing.assert_allclose(L @ L.T, M, atol=1e-12)
    assert L[1, 1] == 0.0


def test_simulation_smoother_moments(rng):
    spec = random_lg(rng, n=8, m=2, k=2)
    sm = kalman.smoother(spec)
    key = jax.random.PRNGKey(0)
    draws = simulate_states(spec, 4000, key, use_antithetic=True)
    mean = np.asarray(jnp.mean(draws, axis=0))
    np.testing.assert_allclose(mean, np.asarray(sm.alphahat), atol=0.05)
    # covariance at a few times
    for t in [0, 4, 8]:
        dev = np.asarray(draws[:, t, :]) - mean[t]
        cov = dev.T @ dev / draws.shape[0]
        np.testing.assert_allclose(cov, np.asarray(sm.Vt[t]), atol=0.08)


def test_stratified_select_matches_gather(rng):
    """The one-hot matmul selection (MXU path) must equal the
    searchsorted-gather selection draw-for-draw."""
    import jax
    import jax.numpy as jnp
    from bssm_tpu.ops.resample import stratified_indices, stratified_select
    for N in (7, 64, 256):
        w = rng.random(N) + 1e-3
        w = jnp.asarray(w / w.sum())
        alpha = jnp.asarray(rng.normal(size=(N, 3)))
        key = jax.random.PRNGKey(N)
        vals, idx = stratified_select(w, key, alpha)
        idx_ref = stratified_indices(w, key)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
        np.testing.assert_allclose(np.asarray(vals),
                                   np.asarray(alpha)[np.asarray(idx_ref)],
                                   rtol=0, atol=0)


def test_stratified_zero_uniform_selects_particle_zero(rng):
    """Regression (r5): a uniform of exactly 0.0 must select column 0 in
    the one-hot selection matmul, matching searchsorted side='left' —
    previously the (cp >= u) & (prev < u) row was all-zero at u == 0 and
    silently injected a zero-state particle."""
    import jax.numpy as jnp
    from bssm_tpu.ops.resample import (stratified_gather_from_uniforms,
                                       stratified_indices_from_uniforms)
    for N in (8, 256):
        w = rng.random(N) + 1e-3
        w = jnp.asarray(w / w.sum())
        alpha = jnp.asarray(rng.normal(size=(N, 3))) + 5.0  # no zero rows
        r = jnp.zeros((N,), w.dtype)                        # worst case
        idx = stratified_indices_from_uniforms(w, r)
        vals = stratified_gather_from_uniforms(w, r, alpha)
        np.testing.assert_allclose(np.asarray(vals),
                                   np.asarray(alpha)[np.asarray(idx)],
                                   rtol=0, atol=0)
        assert np.asarray(idx)[0] == 0
