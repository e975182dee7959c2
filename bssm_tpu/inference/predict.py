"""Posterior predictive simulation and fitted values.

Re-design of `/root/reference/R/predict.R` + `/root/reference/R/fitted.R` and
the C++ `predict_sample`/`sample_model`/`predict_past`
(`/root/reference/src/model_ssm_ulg.cpp:675-749`,
`/root/reference/src/model_ssm_ung.cpp:714-833`): draws are resampled from
the stored posterior with IS weights as probabilities, then a vmapped
forward simulation produces state/mean/response trajectories.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spec import (BINOMIAL, GAMMA, GAUSSIAN, LGSpec, MVLGSpec,
                         MVNGSpec, NEGBIN, NGSpec, POISSON, SVM)
from ..core.priors import LOG
from ..models.base import Model


def _to_sampled(model: Model, theta_nat):
    tr = jnp.asarray(model.transforms)
    x = jnp.asarray(theta_nat)
    return jnp.where(tr == LOG, jnp.log(jnp.maximum(x, 1e-300)), x)


def _bc(A, n):
    return jnp.broadcast_to(A, (n,) + A.shape[1:]) if A.shape[0] == 1 else A


def _sim_states(spec, a1, key):
    """Forward-simulate states from a1 over the spec's timeline, (n, m)."""
    n, m, k = spec.n, spec.m, spec.k
    dt = spec.y.dtype
    Tb, Cb, Rb = _bc(spec.T, n), _bc(spec.C, n), _bc(spec.R, n)
    eta = jax.random.normal(key, (n, k), dt)

    def step(a, xs):
        T, C, R, e = xs
        return C + T @ a + R @ e, a

    _, alphas = jax.lax.scan(step, a1, (Tb[:-1], Cb[:-1], Rb[:-1],
                                        eta[:-1]))
    return jnp.concatenate([a1[None], alphas], axis=0)


def _family_mean(d: int, signal):
    if d == SVM:
        return jnp.zeros_like(signal)
    if d == GAUSSIAN:
        return signal
    if d == BINOMIAL:
        e = jnp.exp(signal)
        return e / (1.0 + e)
    return jnp.exp(signal)


def _obs_mean(spec, signal):
    if isinstance(spec, NGSpec):
        return _family_mean(spec.distribution, signal)
    if isinstance(spec, MVNGSpec):
        return jnp.stack([_family_mean(d, signal[:, j])
                          for j, d in enumerate(spec.distributions)], axis=1)
    return signal


def _family_sample(d: int, key, signal, u, phi, dt):
    """One series of observation draws given the signal (reference
    `sample_model(predict_type==1)`, `model_ssm_ung.cpp:786-829`,
    `model_ssm_mng.cpp` sample_model)."""
    n = signal.shape[0]
    mean = _family_mean(d, signal)
    if d == GAUSSIAN:
        return signal + phi * jax.random.normal(key, (n,), dt)
    if d == POISSON:
        return jax.random.poisson(key, u * mean).astype(dt)
    if d == BINOMIAL:
        return jax.random.binomial(key, u, mean).astype(dt)
    if d == NEGBIN:
        k1, k2 = jax.random.split(key)
        prob = phi / (phi + u * mean)
        lam = jax.random.gamma(k1, phi, (n,)) * (1.0 - prob) / prob
        return jax.random.poisson(k2, lam).astype(dt)
    if d == GAMMA:
        g = jax.random.gamma(key, phi, (n,))
        return g * u * mean / phi
    raise ValueError(d)


def _obs_sample(spec, signal, alpha, key):
    """Sample y given the signal; dispatches univariate / multivariate."""
    dt = signal.dtype
    n = signal.shape[0]
    if isinstance(spec, LGSpec):
        H = jnp.broadcast_to(spec.H, (n,))
        return signal + H * jax.random.normal(key, (n,), dt)
    if isinstance(spec, MVLGSpec):
        # correlated obs noise through the lower-tri factor H
        Hb = _bc(spec.H, n)
        eps = jax.random.normal(key, (n, spec.p), dt)
        return signal + jnp.einsum('tij,tj->ti', Hb, eps)
    if isinstance(spec, MVNGSpec):
        return jnp.stack(
            [_family_sample(d, jax.random.fold_in(key, j), signal[:, j],
                            spec.u[:, j], spec.phi[j], dt)
             for j, d in enumerate(spec.distributions)], axis=1)
    d = spec.distribution
    if d == SVM:
        return spec.phi * jnp.exp(0.5 * alpha[:, 0]) * \
            jax.random.normal(key, (n,), dt)
    return _family_sample(d, key, signal, spec.u, spec.phi, dt)


def _signal(spec, alpha):
    """(n,) univariate or (n, p) multivariate signal from states
    (`/root/reference/R/predict.R:190-221,296-327` for the mlg/mng rows)."""
    n = spec.n
    Z = _bc(spec.Z, n)
    D = _bc(spec.D.astype(alpha.dtype), n)
    if isinstance(spec, (MVLGSpec, MVNGSpec)):
        return D + jnp.einsum('tpm,tm->tp', Z, alpha[:n])
    if isinstance(spec, NGSpec) and spec.distribution == SVM:
        return alpha[:, 0]
    return D + jnp.einsum('tm,tm->t', Z, alpha[:n])


def _sim_states_nlg(spec, a1, key):
    """Forward-simulate nonlinear states (`model_ssm_nlg.cpp:1322-1409`)."""
    n, m, k = spec.n, spec.m, spec.k
    dt = spec.y.dtype
    eta = jax.random.normal(key, (n, k), dt)

    def step(carry, xs):
        a, t = carry
        e = xs
        a_next = spec.T_fn(t, a, spec.theta) \
            + spec.R_fn(t, a, spec.theta) @ e
        return (a_next, t + 1), a

    (_, _), alphas = jax.lax.scan(step, (a1, jnp.zeros((), jnp.int32)),
                                  eta)
    return alphas                                   # (n, m)


def _predict_nlg(output, model, type, nsim, seed):
    from ..models.nlg import NLGSpec   # noqa: F401
    key = jax.random.PRNGKey(seed)
    th_flat = output.flat_theta()
    w = output.flat_weights()
    alpha_last = output.alpha.reshape((-1,) + output.alpha.shape[2:])[:, -1]
    k_pick, k_sim = jax.random.split(key)
    idx = np.asarray(jax.random.choice(k_pick, th_flat.shape[0], (nsim,),
                                       p=jnp.asarray(w / w.sum())))
    thetas = jnp.asarray(th_flat[idx])
    a1s = jnp.asarray(alpha_last[idx])
    keys = jax.random.split(k_sim, nsim)

    def one(theta_nat, a1, k):
        spec = model.build(_to_sampled(model, theta_nat))
        k_a, k_y = jax.random.split(k)
        alpha = _sim_states_nlg(spec, a1, k_a)
        if type == "state":
            return alpha
        tr = jnp.arange(spec.n)
        mean = jax.vmap(lambda t, a: spec.Z_fn(t, a, spec.theta))(tr, alpha)
        if type == "mean":
            return mean
        eps = jax.random.normal(k_y, (spec.n, spec.p), spec.y.dtype)
        Hm = jax.vmap(lambda t, a: spec.H_fn(t, a, spec.theta))(tr, alpha)
        return mean + jnp.einsum('tij,tj->ti', Hm, eps)

    return np.asarray(jax.jit(jax.vmap(one))(thetas, a1s, keys))


def predict(output, model: Model, type: str = "response", nsim: int = 1000,
            seed: int = 1):
    """Posterior predictive draws over the timeline of ``model``
    (`/root/reference/R/predict.R:125`).  ``model`` describes the future:
    its y length sets the horizon (values are ignored); the stored final
    states seed the state recursion."""
    if output.alpha is None:
        raise ValueError("predict needs output_type='full'")
    if model.kind == "nlg":
        return _predict_nlg(output, model, type, nsim, seed)
    key = jax.random.PRNGKey(seed)
    th_flat = output.flat_theta()
    w = output.flat_weights()
    alpha_last = output.alpha.reshape((-1,) + output.alpha.shape[2:])[:, -1]

    k_pick, k_sim = jax.random.split(key)
    idx = np.asarray(
        jax.random.choice(k_pick, th_flat.shape[0], (nsim,),
                          p=jnp.asarray(w / w.sum())))
    thetas = jnp.asarray(th_flat[idx])
    a1s = jnp.asarray(alpha_last[idx])
    keys = jax.random.split(k_sim, nsim)

    def one(theta_nat, a1, k):
        spec = model.build(_to_sampled(model, theta_nat))
        k_a, k_y = jax.random.split(k)
        alpha = _sim_states(spec, a1, k_a)
        if type == "state":
            return alpha
        sig = _signal(spec, alpha)
        if type == "mean":
            return _obs_mean(spec, sig)
        return _obs_sample(spec, sig, alpha, k_y)

    return np.asarray(jax.jit(jax.vmap(one))(thetas, a1s, keys))


def fitted(output, model: Model, type: str = "mean", seed: int = 1):
    """Fitted (past) values: replay stored state draws through the
    observation equation (`/root/reference/R/fitted.R:25`,
    `predict_past`, `model_ssm_ulg.cpp:727-749`)."""
    if output.alpha is None:
        raise ValueError("fitted needs output_type='full'")
    th_flat = output.flat_theta()
    alphas = output.alpha.reshape((-1,) + output.alpha.shape[2:])
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, th_flat.shape[0])

    def one(theta_nat, alpha, k):
        spec = model.build(_to_sampled(model, theta_nat))
        sig = _signal(spec, alpha)
        if type == "mean":
            return _obs_mean(spec, sig)
        return _obs_sample(spec, sig, alpha, k)

    return np.asarray(jax.jit(jax.vmap(one))(
        jnp.asarray(th_flat), jnp.asarray(alphas), keys))
