"""Dense joint-Gaussian oracle tests for the multivariate Kalman engine,
including partial missingness (`/root/reference/src/model_ssm_mlg.cpp`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bssm_tpu.core.spec import MVLGSpec
from bssm_tpu.ops import kalman_mv
from bssm_tpu.ops.simsmooth import simulate_states  # noqa: F401 (api check)


def random_mvlg(rng, n=10, m=3, k=2, p=2, partial_missing=True):
    Z = rng.normal(size=(1, p, m))
    Hc = rng.normal(size=(p, p)) * 0.4
    H = (np.tril(Hc) + np.eye(p))[None]
    A = rng.normal(size=(m, m))
    T = (np.linalg.qr(A)[0] * 0.9)[None]
    R = rng.normal(size=(1, m, k)) * 0.7
    a1 = rng.normal(size=m)
    P1c = rng.normal(size=(m, m))
    P1 = P1c @ P1c.T + 0.5 * np.eye(m)
    D = rng.normal(size=(1, p))
    C = rng.normal(size=(1, m)) * 0.3

    alpha = rng.multivariate_normal(a1, P1)
    y = np.zeros((n, p))
    for t in range(n):
        y[t] = D[0] + Z[0] @ alpha + H[0] @ rng.normal(size=p)
        alpha = C[0] + T[0] @ alpha + R[0] @ rng.normal(size=k)
    if partial_missing:
        y[2, 0] = np.nan
        y[min(5, n - 1), :] = np.nan
        y[min(n - 2, 7), 1] = np.nan
    return MVLGSpec(y=jnp.asarray(y), Z=jnp.asarray(Z), H=jnp.asarray(H),
                    T=jnp.asarray(T), R=jnp.asarray(R), a1=jnp.asarray(a1),
                    P1=jnp.asarray(P1), D=jnp.asarray(D), C=jnp.asarray(C))


def oracle(spec):
    n, p, m = spec.n, spec.p, spec.m
    Z = np.asarray(jnp.broadcast_to(spec.Z, (n, p, m)))
    HH = np.asarray(jnp.einsum('tij,tkj->tik',
                               jnp.broadcast_to(spec.H, (n, p, p)),
                               jnp.broadcast_to(spec.H, (n, p, p))))
    T = np.asarray(jnp.broadcast_to(spec.T, (n, m, m)))
    RR = np.asarray(jnp.broadcast_to(spec.RR, (n, m, m)))
    D = np.asarray(jnp.broadcast_to(spec.D, (n, p)))
    C = np.asarray(jnp.broadcast_to(spec.C, (n, m)))
    a1, P1 = np.asarray(spec.a1), np.asarray(spec.P1)

    dim_a = (n + 1) * m
    mu_a = np.zeros(dim_a)
    cov_a = np.zeros((dim_a, dim_a))
    mu_a[:m] = a1
    cov_a[:m, :m] = P1
    for t in range(n):
        s, e = t * m, (t + 1) * m
        mu_a[e:e + m] = C[t] + T[t] @ mu_a[s:e]
        for r in range(t + 1):
            rs, re = r * m, (r + 1) * m
            blk = cov_a[rs:re, s:e] @ T[t].T
            cov_a[rs:re, e:e + m] = blk
            cov_a[e:e + m, rs:re] = blk.T
        cov_a[e:e + m, e:e + m] = T[t] @ cov_a[s:e, s:e] @ T[t].T + RR[t]

    Zbig = np.zeros((n * p, dim_a))
    HHbig = np.zeros((n * p, n * p))
    for t in range(n):
        Zbig[t * p:(t + 1) * p, t * m:(t + 1) * m] = Z[t]
        HHbig[t * p:(t + 1) * p, t * p:(t + 1) * p] = HH[t]
    mu_y = D.reshape(-1) + Zbig @ mu_a
    cov_y = Zbig @ cov_a @ Zbig.T + HHbig
    cov_ay = cov_a @ Zbig.T

    yf = np.asarray(spec.y).reshape(-1)
    obs = np.isfinite(yf)
    S = cov_y[np.ix_(obs, obs)]
    Sinv = np.linalg.inv(S)
    resid = yf[obs] - mu_y[obs]
    mean = mu_a + cov_ay[:, obs] @ Sinv @ resid
    cov = cov_a - cov_ay[:, obs] @ Sinv @ cov_ay[:, obs].T
    sign, logdet = np.linalg.slogdet(S)
    ll = -0.5 * (obs.sum() * np.log(2 * np.pi) + logdet + resid @ Sinv @ resid)
    return mean, cov, ll


def test_mv_loglik(rng):
    spec = random_mvlg(rng)
    _, _, ll_o = oracle(spec)
    ll = kalman_mv.log_likelihood_mv(spec)
    np.testing.assert_allclose(float(ll), ll_o, rtol=1e-8)


def test_mv_smoother(rng):
    spec = random_mvlg(rng)
    mean, cov, _ = oracle(spec)
    n, m = spec.n, spec.m
    sm = kalman_mv.smoother_mv(spec)
    np.testing.assert_allclose(np.asarray(sm.alphahat),
                               mean.reshape(n + 1, m), rtol=1e-6, atol=1e-8)
    for t in range(n + 1):
        np.testing.assert_allclose(
            np.asarray(sm.Vt[t]), cov[t * m:(t + 1) * m, t * m:(t + 1) * m],
            rtol=1e-5, atol=1e-8)
    for t in range(n):
        np.testing.assert_allclose(
            np.asarray(sm.ccov[t]),
            cov[t * m:(t + 1) * m, (t + 1) * m:(t + 2) * m],
            rtol=1e-5, atol=1e-8)


def test_mv_fast_smoother(rng):
    spec = random_mvlg(rng)
    sm = kalman_mv.smoother_mv(spec)
    fs = kalman_mv.fast_smoother_mv(spec)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(sm.alphahat),
                               rtol=1e-7, atol=1e-9)


def test_mv_sim_smoother_moments(rng):
    spec = random_mvlg(rng, n=6, partial_missing=True)
    sm = kalman_mv.smoother_mv(spec)
    draws = kalman_mv.simulate_states_mv(spec, 4000, jax.random.PRNGKey(0))
    mean = np.asarray(jnp.mean(draws, axis=0))
    np.testing.assert_allclose(mean, np.asarray(sm.alphahat), atol=0.06)
    for t in [0, 3, 6]:
        dev = np.asarray(draws[:, t, :]) - mean[t]
        cov = dev.T @ dev / draws.shape[0]
        np.testing.assert_allclose(cov, np.asarray(sm.Vt[t]), atol=0.1)
