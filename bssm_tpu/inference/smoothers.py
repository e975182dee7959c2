"""Public smoothing API (`/root/reference/R/smoother.R`,
`/root/reference/R/sim_smoother.R`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.spec import MVLGSpec, MVNGSpec, NGSpec
from ..ops import kalman, kalman_mv
from ..ops.simsmooth import simulate_states
from . import approx as approx_mod
from . import approx_mv as mv_mod
from .filters import _spec_of


def _to_gaussian(spec):
    if isinstance(spec, NGSpec):
        return approx_mod.approximate(spec).gaussian(spec)
    if isinstance(spec, MVNGSpec):
        return mv_mod.approximate_mv(spec).gaussian(spec)
    return spec


def fast_smoother(model_or_spec, theta=None):
    """Smoothed state means only (`/root/reference/R/smoother.R:16`)."""
    spec = _to_gaussian(_spec_of(model_or_spec, theta))
    if isinstance(spec, MVLGSpec):
        return jax.jit(kalman_mv.fast_smoother_mv)(spec)
    return jax.jit(kalman.fast_smoother)(spec)


def smoother(model_or_spec, theta=None):
    """Smoothed means and covariances (`/root/reference/R/smoother.R:45`)."""
    spec = _to_gaussian(_spec_of(model_or_spec, theta))
    if isinstance(spec, MVLGSpec):
        return jax.jit(kalman_mv.smoother_mv)(spec)
    return jax.jit(kalman.smoother)(spec)


def sim_smoother(model_or_spec, nsim: int, key=None, seed: int = 1,
                 use_antithetic: bool = True, theta=None):
    """Durbin-Koopman simulation smoother draws
    (`/root/reference/R/sim_smoother.R:26`)."""
    spec = _to_gaussian(_spec_of(model_or_spec, theta))
    if key is None:
        key = jax.random.PRNGKey(seed)
    if isinstance(spec, MVLGSpec):
        return jax.jit(kalman_mv.simulate_states_mv,
                       static_argnums=(1, 3))(spec, nsim, key,
                                              use_antithetic)
    return jax.jit(simulate_states, static_argnums=(1, 3))(
        spec, nsim, key, use_antithetic)
