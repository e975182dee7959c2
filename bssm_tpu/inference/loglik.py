"""Log-likelihood API (`/root/reference/R/loglik.R`)."""
from __future__ import annotations

import jax

from ..core.spec import LGSpec, MVLGSpec, MVNGSpec, NGSpec
from ..ops import kalman, kalman_mv
from . import approx as approx_mod
from . import approx_mv as mv_mod
from . import particle as pf_mod
from .filters import _spec_of


def logLik(model_or_spec, particles: int = 0, method: str = "psi",
           key=None, seed: int = 1, theta=None,
           conv_tol: float = 1e-8, max_iter: int = 100):
    """Exact (LG), approximate (particles=0) or particle log-likelihood
    estimate (`/root/reference/R/loglik.R:52-161`)."""
    spec = _spec_of(model_or_spec, theta)
    if isinstance(spec, LGSpec):
        return jax.jit(kalman.log_likelihood)(spec)
    if isinstance(spec, MVLGSpec):
        return jax.jit(kalman_mv.log_likelihood_mv)(spec)
    from ..models.nlg import NLGSpec
    from ..models.sde import SDESpec
    if isinstance(spec, NLGSpec):
        from . import nlg as nlg_mod
        if key is None:
            key = jax.random.PRNGKey(seed)
        if particles == 0:
            if method == "ekf":
                return jax.jit(nlg_mod.ekf_loglik)(spec)
            return jax.jit(lambda s: nlg_mod.approximate_nlg(s).loglik)(spec)
        if method == "psi":
            return jax.jit(lambda s, k: nlg_mod.psi_filter_nlg(
                s, nlg_mod.approximate_nlg(s), particles, k).loglik)(
                spec, key)
        if method == "ekf":
            return jax.jit(lambda s, k: nlg_mod.ekpf_filter(
                s, particles, k).loglik)(spec, key)
        return jax.jit(lambda s, k: nlg_mod.bsf_filter_nlg(
            s, particles, k).loglik)(spec, key)
    if isinstance(spec, SDESpec):
        from . import sde as sde_mod
        if key is None:
            key = jax.random.PRNGKey(seed)
        return jax.jit(lambda s, k: sde_mod.bsf_filter_sde(
            s, max(particles, 2), s.L_f, k).loglik)(spec, key)
    if isinstance(spec, MVNGSpec):
        if key is None:
            key = jax.random.PRNGKey(seed)
        if particles == 0:
            return jax.jit(lambda s: mv_mod.approx_loglik_mv(
                s, conv_tol=conv_tol, max_iter=max_iter).loglik)(spec)
        if method == "bsf":
            return jax.jit(lambda s, k: mv_mod.bsf_filter_mv(
                s, particles, k).loglik)(spec, key)
        return jax.jit(lambda s, k: mv_mod.psi_filter_mv(
            s, mv_mod.approx_loglik_mv(s), particles, k).loglik)(spec, key)
    if particles == 0:
        return jax.jit(lambda s: approx_mod.approx_loglik(
            s, conv_tol=conv_tol, max_iter=max_iter).loglik)(spec)
    if key is None:
        key = jax.random.PRNGKey(seed)
    if method == "bsf":
        return jax.jit(lambda s, k: pf_mod.bsf_filter(
            s, particles, k).loglik)(spec, key)
    if method == "spdk":
        return jax.jit(lambda s, k: pf_mod.spdk_sample(
            s, approx_mod.approx_loglik(s, conv_tol=conv_tol,
                                        max_iter=max_iter),
            particles, k).loglik)(spec, key)
    return jax.jit(lambda s, k: pf_mod.psi_filter(
        s, approx_mod.approx_loglik(s, conv_tol=conv_tol,
                                    max_iter=max_iter),
        particles, k).loglik)(spec, key)
