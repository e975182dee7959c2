"""Public filtering API (`/root/reference/R/kfilter.R`,
`/root/reference/R/bootstrap_filter.R`, `/root/reference/R/particle_smoother.R`)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.spec import LGSpec, NGSpec
from ..models.base import Model
from ..ops import kalman
from ..ops.resample import ancestor_trace
from . import approx as approx_mod
from . import particle as pf_mod


def _spec_of(model_or_spec, theta=None):
    if isinstance(model_or_spec, Model):
        th = model_or_spec.theta_init if theta is None else theta
        return model_or_spec.build(th)
    return model_or_spec


def kfilter(model_or_spec, theta=None):
    """Kalman filter; non-Gaussian models are filtered via their Gaussian
    approximation (`/root/reference/R/kfilter.R:21-96`)."""
    spec = _spec_of(model_or_spec, theta)
    if isinstance(spec, NGSpec):
        ar = approx_mod.approximate(spec)
        spec = ar.gaussian(spec)
    return jax.jit(kalman.kfilter)(spec)


def bootstrap_filter(model_or_spec, particles: int, key=None, seed: int = 1,
                     theta=None):
    """Bootstrap particle filter (`/root/reference/R/bootstrap_filter.R:24`)."""
    spec = _spec_of(model_or_spec, theta)
    if key is None:
        key = jax.random.PRNGKey(seed)
    if isinstance(spec, NGSpec):
        return jax.jit(pf_mod.bsf_filter,
                       static_argnums=1)(spec, particles, key)
    return jax.jit(pf_mod.bsf_filter_lg,
                   static_argnums=1)(spec, particles, key)


class ParticleSmootherResult(NamedTuple):
    alphahat: jnp.ndarray   # (n+1, m) weighted smoothed mean
    Vt: jnp.ndarray         # (n+1, m, m)
    alpha: jnp.ndarray      # (N, n+1, m) traced trajectories
    weights: jnp.ndarray    # (N,) final-time weights
    logLik: jnp.ndarray


def particle_smoother(model_or_spec, particles: int, method: str = "psi",
                      key=None, seed: int = 1, theta=None):
    """Filter-smoother state estimates by SMC
    (`/root/reference/R/particle_smoother.R:67-291`)."""
    spec = _spec_of(model_or_spec, theta)
    if key is None:
        key = jax.random.PRNGKey(seed)

    def run(spec, key):
        if isinstance(spec, NGSpec):
            if method == "psi":
                al = approx_mod.approx_loglik(spec)
                pf = pf_mod.psi_filter(spec, al, particles, key)
            else:
                pf = pf_mod.bsf_filter(spec, particles, key)
        else:
            pf = pf_mod.bsf_filter_lg(spec, particles, key)
        traced = ancestor_trace(pf.alpha, pf.indices)
        w = pf.weights[:, -1]
        w = w / jnp.sum(w)
        mean = jnp.einsum('i,itm->tm', w, traced)
        dev = traced - mean
        Vt = jnp.einsum('i,itm,itk->tmk', w, dev, dev)
        return ParticleSmootherResult(mean, Vt, traced, w, pf.loglik)

    return jax.jit(run)(spec, key)
