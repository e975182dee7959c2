"""Public filtering API (`/root/reference/R/kfilter.R`,
`/root/reference/R/bootstrap_filter.R`, `/root/reference/R/particle_smoother.R`)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.spec import LGSpec, MVLGSpec, MVNGSpec, NGSpec
from ..models.base import Model
from ..ops import kalman, kalman_mv
from ..ops.resample import ancestor_trace
from . import approx as approx_mod
from . import approx_mv as mv_mod
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
        spec = approx_mod.approximate(spec).gaussian(spec)
    elif isinstance(spec, MVNGSpec):
        spec = mv_mod.approximate_mv(spec).gaussian(spec)
    if isinstance(spec, MVLGSpec):
        return jax.jit(kalman_mv.kfilter_mv)(spec)
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
    if isinstance(spec, MVNGSpec):
        return jax.jit(mv_mod.bsf_filter_mv,
                       static_argnums=1)(spec, particles, key)
    if isinstance(spec, LGSpec):
        return jax.jit(pf_mod.bsf_filter_lg,
                       static_argnums=1)(spec, particles, key)
    from ..models.nlg import NLGSpec
    from ..models.sde import SDESpec
    if isinstance(spec, NLGSpec):
        from . import nlg as nlg_mod
        return jax.jit(nlg_mod.bsf_filter_nlg,
                       static_argnums=1)(spec, particles, key)
    if isinstance(spec, SDESpec):
        from . import sde as sde_mod
        return jax.jit(sde_mod.bsf_filter_sde,
                       static_argnums=(1, 2))(spec, particles, spec.L_f, key)
    raise TypeError(type(spec))


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
        elif isinstance(spec, MVNGSpec):
            if method == "psi":
                al = mv_mod.approx_loglik_mv(spec)
                pf = mv_mod.psi_filter_mv(spec, al, particles, key)
            else:
                pf = mv_mod.bsf_filter_mv(spec, particles, key)
        else:
            from ..models.nlg import NLGSpec
            if isinstance(spec, NLGSpec):
                from . import nlg as nlg_mod
                if method == "psi":
                    ap = nlg_mod.approximate_nlg(spec)
                    pf = nlg_mod.psi_filter_nlg(spec, ap, particles, key)
                elif method == "ekf":
                    pf = nlg_mod.ekpf_filter(spec, particles, key)
                else:
                    pf = nlg_mod.bsf_filter_nlg(spec, particles, key)
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


# ---------------------------------------------------------------------------
# nonlinear-model filter APIs (`/root/reference/R/kfilter.R:98-189`,
# `/root/reference/R/ekpf_filter.R`)
# ---------------------------------------------------------------------------

def ekf(model_or_spec, theta=None, iekf_iter: int = 0):
    """(Iterated) extended Kalman filter for nonlinear models."""
    from . import nlg as nlg_mod
    spec = _spec_of(model_or_spec, theta)
    if iekf_iter:
        spec = spec.replace(iekf_iter=iekf_iter)
    return jax.jit(nlg_mod.ekf)(spec)


def ukf(model_or_spec, theta=None, alpha: float = 1.0, beta: float = 0.0,
        kappa: float = 2.0):
    """Unscented Kalman filter."""
    from . import nlg as nlg_mod
    spec = _spec_of(model_or_spec, theta)
    return jax.jit(nlg_mod.ukf, static_argnums=(1, 2, 3))(
        spec, alpha, beta, kappa)


def ekf_smoother(model_or_spec, theta=None, iekf_iter: int = 0):
    """Extended Kalman smoother."""
    from . import nlg as nlg_mod
    spec = _spec_of(model_or_spec, theta)
    if iekf_iter:
        spec = spec.replace(iekf_iter=iekf_iter)
    return jax.jit(nlg_mod.ekf_smoother)(spec)


def ekf_fast_smoother(model_or_spec, theta=None, iekf_iter: int = 0):
    """Means-only extended Kalman smoother (`/root/reference/R/smoother.R`,
    `src/model_ssm_nlg.cpp:483-556`)."""
    from . import nlg as nlg_mod
    spec = _spec_of(model_or_spec, theta)
    if iekf_iter:
        spec = spec.replace(iekf_iter=iekf_iter)
    return jax.jit(nlg_mod.ekf_fast_smoother)(spec)


def ekpf_filter(model_or_spec, particles: int, key=None, seed: int = 1,
                theta=None):
    """Extended Kalman particle filter."""
    from . import nlg as nlg_mod
    spec = _spec_of(model_or_spec, theta)
    if key is None:
        key = jax.random.PRNGKey(seed)
    return jax.jit(nlg_mod.ekpf_filter, static_argnums=1)(
        spec, particles, key)
