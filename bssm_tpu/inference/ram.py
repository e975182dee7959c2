"""Robust Adaptive Metropolis (RAM) scale adaptation (Vihola 2012).

Re-derivation of the `ramcmc::adapt_S` primitive the reference calls after
every iteration (`/root/reference/src/mcmc.cpp:277,468,663`):

  S <- chol factor of  S (I + eta_n (alpha_n - alpha*) u u' / ||u||^2) S',
  eta_n = min(1, d n^{-gamma}),

implemented as a rank-1 Cholesky update/downdate of the lower factor S with
vector  v = S u sqrt(eta_n |alpha_n - alpha*|) / ||u||.  A downdate that
would destroy positive-definiteness is skipped (keeps the previous S), which
matches ramcmc's guarded behaviour.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.chol import chol_rank1_update


def adapt_S(S: jnp.ndarray, u: jnp.ndarray, accept_prob: jnp.ndarray,
            target: float, i: jnp.ndarray, gamma: float) -> jnp.ndarray:
    d = S.shape[0]
    change = accept_prob - target
    unorm = jnp.linalg.norm(u)
    eta = jnp.minimum(1.0, d * jnp.power(i.astype(S.dtype), -gamma))
    scale = jnp.sqrt(eta * jnp.abs(change)) / jnp.maximum(
        unorm, jnp.finfo(S.dtype).tiny)
    v = (S @ u) * scale
    S_new = chol_rank1_update(S, v, down=change <= 0)
    ok = jnp.all(jnp.isfinite(S_new)) & jnp.all(jnp.diag(S_new) > 0)
    return jnp.where(ok, S_new, S)
