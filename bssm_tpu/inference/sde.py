"""Bootstrap particle filtering for SDE models.

TPU-native version of `/root/reference/src/model_ssm_sde.cpp:21-82`: the
particle axis is vectorised (each particle's 2^L-step Milstein path runs as
a scan with a per-(particle, time) threefry key), resampling is stratified
every step, and the coarse/fine multilevel pair shares Brownian increments
via `milstein_coupled` when requested.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.sde import SDESpec, milstein
from ..ops.resample import (stratified_indices,
                            stratified_select)


class SDEPFResult(NamedTuple):
    loglik: jnp.ndarray
    alpha: jnp.ndarray     # (N, n+1, 1)
    weights: jnp.ndarray   # (N, n+1)
    indices: jnp.ndarray   # (N, n)


def _lse(logw, N, dt):
    # non-finite particle weights (f32 overflow artifacts) count as zero
    logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
    mx = jnp.max(logw)
    w = jnp.exp(logw - mx)
    sw = jnp.sum(w)
    ok = (sw > 0) & jnp.isfinite(mx)
    inc = jnp.where(ok, mx + jnp.log(sw / N), -jnp.inf)
    nw = jnp.where(ok, w / jnp.where(sw > 0, sw, 1.0),
                   jnp.ones_like(w) / N)
    return inc.astype(dt), nw


def bsf_filter_sde(spec: SDESpec, nsim: int, L: int, key,
                   couple: bool = False) -> SDEPFResult:
    """Bootstrap filter at discretisation level 2^L.

    With ``couple=True`` the Brownian increments are generated at the fine
    level ``spec.L_f`` (and summed onto the 2^L grid), so a coarse run
    (L = spec.L_c) and a fine run (L = spec.L_f) from the SAME ``key``
    share Brownian paths per (interval, particle-slot): the multilevel
    coupling that keeps the DA acceptance ratio / IS weights
    exp(ll_f - ll_c) low-variance (`/root/reference/src/model_ssm_sde.h:45-48`,
    `/root/reference/src/approx_mcmc.cpp:522-591`).  Key derivation is
    prefix-stable in ``nsim`` (threefry split), so runs with different
    particle counts stay coupled on the shared slots."""
    n = spec.n
    dt = spec.y.dtype
    gen_L = spec.L_f if couple else L

    key, k0 = jax.random.split(key)
    x0 = jnp.full((nsim,), spec.x0, dt)
    prop0 = jax.vmap(lambda k, x: milstein(spec, x, k, L, gen_L=gen_L))(
        jax.random.split(k0, nsim), x0)

    def dens(t, x):
        return jax.vmap(lambda xi: spec.log_obs_density(
            spec.y[t], xi, spec.theta))(x)

    y0ok = jnp.isfinite(spec.y[0])
    inc0, nw0 = _lse(jnp.where(y0ok, dens(0, prop0), 0.0), nsim, dt)
    ll0 = jnp.where(y0ok, inc0, 0.0)
    nw0 = jnp.where(y0ok, nw0, jnp.ones((nsim,), dt) / nsim)

    keys = jax.random.split(key, n)

    def step(carry, xs):
        x_t, nw, ll, t = carry
        kt = xs
        kr, kp = jax.random.split(kt)
        anc, idx = stratified_select(nw, kr, x_t)
        x_next = jax.vmap(lambda k, x: milstein(spec, x, k, L, gen_L=gen_L))(
            jax.random.split(kp, nsim), anc)
        is_last = t + 1 >= n
        tt = jnp.minimum(t + 1, n - 1)
        ok = jnp.isfinite(spec.y[tt]) & (~is_last)
        lw = dens(tt, x_next)
        inc, nw_new = _lse(jnp.where(ok, lw, 0.0), nsim, dt)
        ll = ll + jnp.where(ok, inc, 0.0)
        nw_new = jnp.where(ok, nw_new, jnp.ones((nsim,), dt) / nsim)
        return (x_next, nw_new, ll, t + 1), (x_next, nw_new, idx)

    (_, _, ll, _), (xs_all, nws, idxs) = jax.lax.scan(
        step, (prop0, nw0, ll0, jnp.zeros((), jnp.int32)), keys)
    alpha = jnp.concatenate([prop0[None], xs_all], axis=0)   # (n+1, N)
    weights = jnp.concatenate([nw0[None], nws], axis=0)
    return SDEPFResult(ll, jnp.swapaxes(alpha, 0, 1)[:, :, None],
                       weights.T, idxs.T)
