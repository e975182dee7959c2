"""Observation-family math for non-Gaussian models.

Vectorised (per-time / per-particle) versions of the reference's
distribution switches:
  - second-order (Laplace) matching of pseudo-obs ytilde and pseudo-variance
    HH~            (`/root/reference/src/model_ssm_ung.cpp:302-342`)
  - unnormalised log observation densities and importance log-weights
                   (`/root/reference/src/model_ssm_ung.cpp:385-493`)
  - mode-based correction "scales"
                   (`/root/reference/src/model_ssm_ung.cpp:241-292`)
  - exact normalising constants, thread/trace-safe lgamma forms
                   (`/root/reference/src/distr_consts.cpp:6-67`)

All functions are elementwise in the signal s_t (= D_t + Z_t' alpha_t, or the
state itself for the SV model) and mask missing y outside.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from .spec import SVM, POISSON, BINOMIAL, NEGBIN, GAMMA, GAUSSIAN

LOG2PI = 1.8378770664093453


def safe_exp(x):
    """exp with the argument clipped below the dtype overflow point; keeps a
    single extreme particle from poisoning a whole ensemble with NaN/inf."""
    cap = 80.0 if jnp.result_type(x) == jnp.float32 else 700.0
    return jnp.exp(jnp.minimum(x, cap))


def _lchoose(n, k):
    """log C(n, k) via lgamma, matching the reference's thread-safe variant
    (`/root/reference/src/distr_consts.cpp:7-9`)."""
    return (-jnp.log(n + 1.0) - gammaln(n - k + 1.0) - gammaln(k + 1.0)
            + gammaln(n + 2.0))


def laplace_match(dist: int, y, u, phi, signal):
    """Given signal guess, return (ytilde, HHtilde) of the local Gaussian
    approximation (one Laplace iteration).  NaN y propagates into ytilde
    (missing), HH is sanitised downstream."""
    if dist == SVM:
        ys = jnp.where(jnp.abs(y) < 1e-4, 1e-4, y)
        HH = 2.0 * safe_exp(signal) / jnp.square(ys / phi)
        yt = signal + 1.0 - 0.5 * HH
    elif dist == POISSON:
        HH = 1.0 / (safe_exp(signal) * u)
        yt = y * HH + signal - 1.0
    elif dist == BINOMIAL:
        es = safe_exp(signal)
        HH = jnp.square(1.0 + es) / (u * es)
        yt = y * HH + signal - 1.0 - es
    elif dist == NEGBIN:
        eu = safe_exp(signal) * u
        HH = jnp.square(phi + eu) / (phi * eu * (y + phi))
        yt = signal + (phi + eu) * (y - eu) / ((y + phi) * eu)
    elif dist == GAMMA:
        eu = safe_exp(signal) * u
        HH = eu / (y * phi)
        yt = signal - eu / y + 1.0
    elif dist == GAUSSIAN:
        # mixed-family multivariate case: obs already Gaussian with sd phi
        HH = jnp.square(phi) * jnp.ones_like(signal)
        yt = y * jnp.ones_like(signal)
    else:
        raise ValueError(f"unknown distribution {dist}")
    return yt, HH


def log_obs_density(dist: int, y, u, phi, signal):
    """Unnormalised log g(y_t | signal_t)
    (`/root/reference/src/model_ssm_ung.cpp:447-493`).  Zero where y is NaN."""
    ok = jnp.isfinite(y)
    ys = jnp.where(ok, y, 0.0)
    if dist == SVM:
        w = -0.5 * (signal + jnp.square(ys / phi) * safe_exp(-signal))
    elif dist == POISSON:
        w = ys * signal - u * safe_exp(signal)
    elif dist == BINOMIAL:
        w = ys * signal - u * jnp.logaddexp(0.0, signal)
    elif dist == NEGBIN:
        w = ys * signal - (ys + phi) * jnp.log(phi + u * safe_exp(signal))
    elif dist == GAMMA:
        w = -phi * (signal + ys * safe_exp(-signal) / u)
    elif dist == GAUSSIAN:
        w = -0.5 * jnp.square((ys - signal) / phi)
    else:
        raise ValueError(f"unknown distribution {dist}")
    return jnp.where(ok, w, 0.0)


def log_gaussian_unnorm(ytilde, Htilde, signal):
    """Unnormalised log g~(ytilde_t | signal_t) of the approximating model."""
    ok = jnp.isfinite(ytilde)
    yt = jnp.where(ok, ytilde, 0.0)
    Hs = jnp.where(ok & (Htilde > 0), Htilde, 1.0)
    return jnp.where(ok, -0.5 * jnp.square((yt - signal) / Hs), 0.0)


def log_weights(dist: int, y, u, phi, signal, ytilde, Htilde):
    """Unnormalised importance log-weights
    log g(y|s) - log g~(ytilde|s)  (`model_ssm_ung.cpp:385-439`)."""
    return (log_obs_density(dist, y, u, phi, signal)
            - log_gaussian_unnorm(ytilde, Htilde, signal))


def scales(dist: int, y, u, phi, mode, ytilde, Htilde):
    """Mode-based correction terms: log_weights evaluated at the mode
    (`/root/reference/src/model_ssm_ung.cpp:241-292`)."""
    return log_weights(dist, y, u, phi, mode, ytilde, Htilde)


def obs_log_const(dist: int, y, u, phi):
    """Sum over observed t of the exact log normalising constants of the
    observation family (`/root/reference/src/distr_consts.cpp:33-67`)."""
    ok = jnp.isfinite(y)
    ys = jnp.where(ok, y, 1.0)
    us = jnp.where(ok, u, 1.0)
    if dist == SVM:
        c = -0.5 * LOG2PI - jnp.log(phi) + jnp.zeros_like(ys)
    elif dist == POISSON:
        c = -gammaln(ys + 1.0) + ys * jnp.log(us)
    elif dist == BINOMIAL:
        c = _lchoose(us, ys)
    elif dist == NEGBIN:
        c = _lchoose(ys + phi - 1.0, ys) + phi * jnp.log(phi) + ys * jnp.log(us)
    elif dist == GAMMA:
        c = (phi * jnp.log(phi) - gammaln(phi) + (phi - 1.0) * jnp.log(ys)
             - phi * jnp.log(us))
    elif dist == GAUSSIAN:
        c = -0.5 * LOG2PI - jnp.log(phi) + jnp.zeros_like(ys)
    else:
        raise ValueError(f"unknown distribution {dist}")
    return jnp.sum(jnp.where(ok, c, 0.0))


def gauss_log_const(y, H):
    """Sum over observed t of Gaussian log normalising constants
    (`/root/reference/src/distr_consts.cpp:33-35`)."""
    ok = jnp.isfinite(y)
    Hs = jnp.where(ok & (H > 0), H, 1.0)
    return jnp.sum(jnp.where(ok, -0.5 * LOG2PI - jnp.log(Hs), 0.0))


def const_term(dist: int, y, u, phi, ytilde, Htilde):
    """Exact normalising-constant difference between the true and the
    approximating Gaussian observation densities
    (`/root/reference/src/model_ssm_ung.cpp:347-370`)."""
    return obs_log_const(dist, y, u, phi) - gauss_log_const(ytilde, Htilde)
