"""Multivariate normal log-densities tolerant of singular covariances.

Replaces `/root/reference/src/dmvnorm.{h,cpp}`: densities restricted to the
nonzero-diagonal subspace (deterministic state components contribute nothing),
masked statically instead of slicing.
"""
from __future__ import annotations

import jax.numpy as jnp

from .chol import masked_chol, masked_tri_solve

LOG2PI = 1.8378770664093453
_EPS = 2.220446049250313e-16


def dmvnorm(x, mean, cov, lwr: bool = False):
    """log N(x; mean, cov); with ``lwr`` cov is already a (possibly padded)
    lower factor L with cov = L L'.  Singular dims (zero diagonal) are
    excluded, matching `/root/reference/src/dmvnorm.cpp`."""
    if lwr:
        L = cov
        active = jnp.diagonal(L) > _EPS
    else:
        active = jnp.diagonal(cov) > _EPS
        L = masked_chol(cov, active)
    am = active.astype(x.dtype)
    resid = (x - mean) * am
    z = masked_tri_solve(L, resid, active)
    k = jnp.sum(am)
    logdet = jnp.sum(jnp.where(active, jnp.log(jnp.where(
        active, jnp.diagonal(L), 1.0)), 0.0))
    return -0.5 * (k * LOG2PI + z @ z) - logdet
