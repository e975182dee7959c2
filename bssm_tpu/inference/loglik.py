"""Log-likelihood API (`/root/reference/R/loglik.R`)."""
from __future__ import annotations

import jax

from ..core.spec import LGSpec, NGSpec
from ..ops import kalman
from . import approx as approx_mod
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
