"""Post-hoc IS correction of an approximate run, and particle-count tuning.

`post_correct` re-weights a stored approximate-MCMC run with psi-APF/BSF/SPDK
corrections (`/root/reference/R/post_correction.R:245-308`) — the stored
(theta, mode) pairs ARE the checkpointable state, so any approx run can be
upgraded to an exact weighted posterior later, on more devices.

`suggest_N` picks the smallest particle count whose psi-APF log-weight
standard deviation at a reference theta (e.g. the MAP) is < 1
(`/root/reference/R/post_correction.R:12-151`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import Model
from .mcmc import (McmcOutput, _family_ops, _forward_fill_heads,
                   _is_correction_flat, _make_correct_one)


def post_correct(model: Model, output: McmcOutput, particles: int,
                 sampling_method: str = "psi", is_type: int = 2,
                 seed: int = 1, mesh=None, corr_batch: int = 256
                 ) -> McmcOutput:
    """IS-correct a stored approximate run in place (returns a new output)."""
    if output.modes is None:
        raise ValueError("post_correct needs a run with stored modes "
                         "(mcmc_type='approx' or 'is*')")
    import copy
    import time as _time
    t0 = _time.time()
    C, Sn = output.theta.shape[:2]
    # rebuild sampled-space thetas
    from .predict import _to_sampled
    th = jnp.asarray(output.theta.reshape(C * Sn, -1))
    th = jax.vmap(lambda x: _to_sampled(model, x))(th)
    modes = jnp.asarray(output.modes.reshape((C * Sn,) +
                                             output.modes.shape[2:]))
    key = jax.random.PRNGKey(seed)
    corr_fn = jax.jit(lambda t, m, k: _is_correction_flat(
        model, t, m, k, particles, sampling_method,
        batch_size=corr_batch, mesh=mesh,
        want_states=True, want_moments=False))
    corr = corr_fn(th, modes, key)
    spec0 = model.build(model.theta_init)
    n1m = (spec0.n + 1, spec0.m)

    unflat = lambda a: np.asarray(a).reshape(                 # noqa: E731
        (C, Sn) + a.shape[1:])
    log_w = unflat(corr["log_w"])
    alpha_flat = unflat(corr["alpha"])
    if sampling_method == "bsf" and output.approx_loglik is not None:
        log_w = log_w - output.approx_loglik
    if is_type == 2:
        filled = jax.vmap(_forward_fill_heads)(
            (jnp.asarray(log_w), jnp.asarray(alpha_flat)),
            jnp.asarray(output.accepted))
        log_w, alpha_flat = (np.asarray(filled[0]), np.asarray(filled[1]))
    alpha_new = np.asarray(alpha_flat).reshape((C, Sn) + n1m)

    out = copy.copy(output)
    # non-finite corrections -> zero weight; store max-shifted (IS averages
    # are scale-invariant, exp never overflows), as in run_mcmc
    log_w = np.where(np.isfinite(log_w), log_w, -np.inf)
    shift = np.max(log_w[np.isfinite(log_w)], initial=0.0)
    out.weights = np.exp(log_w - shift)
    out.posterior = (output.prior if output.prior is not None else 0.0) \
        + (output.approx_loglik if output.approx_loglik is not None
           else 0.0) + log_w
    out.alpha = alpha_new
    out.mcmc_type = f"is{is_type}"
    out.time = dict(output.time or {}, correction=_time.time() - t0)
    return out


def suggest_N(model: Model, theta=None, candidates=(2, 4, 8, 16, 32, 64,
                                                    128),
              replications: int = 100, seed: int = 1,
              sampling_method: str = "psi") -> dict:
    """Smallest N with sd(log-weight) < 1 at ``theta``
    (`/root/reference/R/post_correction.R:85-151`)."""
    theta = model.theta_init if theta is None else jnp.asarray(theta)
    spec = model.build(theta)
    ll, mode = _family_ops(model, 1e-8, 100).approx_eval(
        spec, jax.random.PRNGKey(0))

    results = {}
    for N in candidates:
        correct_one = _make_correct_one(model, N, sampling_method,
                                        want_states=False,
                                        want_moments=False)
        keys = jax.random.split(jax.random.PRNGKey(seed + N), replications)
        f = jax.jit(jax.vmap(
            lambda k: correct_one((theta, mode, k))["log_w"]))
        lw = np.asarray(f(keys))
        results[N] = float(np.std(lw))
        if results[N] < 1.0:
            return {"N": N, "sd": results[N], "all": results}
    return {"N": max(candidates), "sd": results[max(candidates)],
            "all": results}
