"""Post-hoc IS correction of an approximate run, and particle-count tuning.

`post_correct` re-weights a stored approximate-MCMC run with psi-APF/BSF/SPDK
corrections (`/root/reference/R/post_correction.R:245-308`) — the stored
(theta, mode) pairs ARE the checkpointable state, so any approx run can be
upgraded to an exact weighted posterior later, on more devices.  It shares
`run_mcmc`'s device-side postprocess, so is2 corrects jump-chain heads only
(not every slot) and `output_type="summary"` streams weighted moments
instead of trajectories; `post_correct(key=is_correction_key(seed,
n_chains))` replays a `run_mcmc(mcmc_type="is*")` correction bit-exactly.

`suggest_N` picks the smallest particle count whose psi-APF log-weight
standard deviation at a reference theta (e.g. the MAP) is < 1
(`/root/reference/R/post_correction.R:12-151`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import Model
from .mcmc import (McmcOutput, _family_ops, _is_postprocess,
                   _make_correct_one, is_correction_key)   # noqa: F401


def post_correct(model: Model, output: McmcOutput, particles: int,
                 sampling_method: str = "psi", is_type: int = 2,
                 seed: int = 1, mesh=None, corr_batch: int = 256,
                 output_type: str = "full", key=None) -> McmcOutput:
    """IS-correct a stored approximate run (returns a new output).

    Runs saved with ``store_modes=False`` (no Laplace-mode stack) are
    corrected by recomputing the approximation cold per head — identical
    statistics, since phase 1 cold-starts every evaluation too.  (Only
    valid for local_approx runs: the recompute rebuilds the LOCAL
    approximation; global-approx runs keep their modes.)"""
    if output.modes is None and model.kind != "ng":
        raise ValueError("post_correct needs a run with stored modes for "
                         f"model kind {model.kind!r}")
    import copy
    import time as _time
    t0 = _time.time()
    C, Sn = output.theta.shape[:2]
    if output.theta_sampled is not None:
        th = jnp.asarray(output.theta_sampled)
    else:
        # legacy outputs: rebuild sampled-space thetas (exp/log round-trip)
        from .predict import _to_sampled
        th = jnp.asarray(output.theta.reshape(C * Sn, -1))
        th = jax.vmap(lambda x: _to_sampled(model, x))(th)
        th = th.reshape((C, Sn) + th.shape[1:])
    if output.modes is None:
        # shape (C, Sn, 1) != (C, Sn, n) flags the recompute path in
        # _make_correct_one / _family_ops._al_from_mode
        modes = jnp.zeros((C, Sn, 1), th.dtype)
    else:
        modes = jnp.asarray(output.modes)
    accepted = jnp.asarray(output.accepted).astype(bool)
    approx_ll = (jnp.asarray(output.approx_loglik)
                 if output.approx_loglik is not None
                 else jnp.zeros((C, Sn), th.dtype))
    if key is None:
        key = jax.random.PRNGKey(seed)
    want_states = output_type == "full"
    want_moments = output_type == "summary"

    if is_type == 2:
        nh = int(jnp.sum(accepted)) + C - int(jnp.sum(accepted[:, 0]))
        bucket = max(int(corr_batch or 256), 1 << max(nh - 1, 1).bit_length())
        bucket = min(bucket, C * Sn) if C * Sn >= nh else nh
    else:
        bucket = 0
    spec0 = model.build(model.theta_init)
    n1m = (spec0.n + 1, spec0.m)

    # same cache scheme as run_mcmc: a matching post_correct call reuses
    # the already-compiled per-piece correction programs
    jit_cache = model.extra.setdefault("_jit_cache", {})
    post = _is_postprocess(
        model, th, modes, accepted, approx_ll, key, is_type=is_type,
        nsim=particles, sampling_method=sampling_method,
        batch_size=corr_batch or 256, bucket=bucket, mesh=mesh,
        want_states=want_states, want_moments=want_moments, n1m=n1m,
        jit_cache=jit_cache)
    post = jax.tree_util.tree_map(lambda a: a.block_until_ready(), post)

    out = copy.copy(output)
    log_w = post["log_w"]
    # non-finite corrections -> zero weight; store max-shifted (IS averages
    # are scale-invariant, exp never overflows), as in run_mcmc; results
    # stay on device (lazy McmcOutput fields)
    mx = jnp.max(jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf))
    shift = jnp.maximum(jnp.where(jnp.isfinite(mx), mx, 0.0), 0.0)
    out.weights = jnp.exp(log_w - shift)
    # posterior stays a device expression: read the stored fields raw
    # (object.__getattribute__ skips the lazy numpy conversion) so the
    # caller's input object is not host-materialized as a side effect
    prior_raw = object.__getattribute__(output, "prior")
    all_raw = object.__getattribute__(output, "approx_loglik")
    out.posterior = ((prior_raw if prior_raw is not None else 0.0)
                     + (all_raw if all_raw is not None else 0.0) + log_w)
    if want_states:
        out.alpha = post["alpha"]
    elif want_moments:
        out.alphahat = post["alphahat"]
        out.Vt = post["Vt"]
    out.mcmc_type = f"is{is_type}"
    out.output_type = output_type
    out.time = dict(output.time or {}, correction=_time.time() - t0)
    return out


def suggest_N(model: Model, theta=None,
              candidates=tuple(range(10, 101, 10)),
              replications: int = 100, seed: int = 1,
              sampling_method: str = "psi") -> dict:
    """Smallest N with sd(log-weight) < 1 at ``theta``
    (`/root/reference/R/post_correction.R:85-151`; same default candidate
    grid seq(10, 100, by = 10))."""
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
