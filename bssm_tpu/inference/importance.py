"""SPDK importance sampling API (`/root/reference/R/importance_sample.R:38`):
draws from the approximating Gaussian model plus importance log-weights."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.spec import MVNGSpec, NGSpec
from . import approx as approx_mod
from . import approx_mv as mv_mod
from .filters import _spec_of


class ImportanceSample(NamedTuple):
    alpha: jnp.ndarray     # (nsim, n+1, m) smoother draws
    weights: jnp.ndarray   # (nsim,) normalised importance weights
    loglik: jnp.ndarray


def importance_sample(model_or_spec, nsim: int, key=None, seed: int = 1,
                      use_antithetic: bool = True, theta=None):
    spec = _spec_of(model_or_spec, theta)
    if key is None:
        key = jax.random.PRNGKey(seed)
    if isinstance(spec, NGSpec):
        from .particle import spdk_sample
        al = approx_mod.approx_loglik(spec)
        r = jax.jit(spdk_sample, static_argnums=(2, 4))(
            spec, al, nsim, key, use_antithetic)
        return ImportanceSample(r.alpha, r.weights, r.loglik)
    if isinstance(spec, MVNGSpec):
        al = mv_mod.approx_loglik_mv(spec)
        ll, alpha, w = jax.jit(mv_mod.spdk_sample_mv,
                               static_argnums=(2, 4))(
            spec, al, nsim, key, use_antithetic)
        return ImportanceSample(alpha, w, ll)
    raise TypeError("importance_sample requires a non-Gaussian model")
