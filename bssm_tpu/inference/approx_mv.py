"""Laplace approximation and particle filters for multivariate non-Gaussian
models (per-series exponential families, possibly mixed with Gaussian).

Re-design of `/root/reference/src/model_ssm_mng.cpp`: the per-series switch
(`laplace_iter`, l.267-314) becomes a static unrolled loop over the series'
family codes applying the shared `laplace_match` columnwise; psi-APF / BSF
mirror the univariate versions with signals (n, p) and weights summed over
series.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import distributions as fam
from ..core.spec import MVLGSpec, MVNGSpec
from ..ops import kalman_mv
from ..ops.chol import conditional_cov_factors, psd_chol
from ..ops.resample import (stratified_indices,
                            stratified_select)

CONV_TOL = 1e-8
MAX_ITER = 100


def signal_mv(spec: MVNGSpec, alpha: jnp.ndarray) -> jnp.ndarray:
    """(n, p) linear signals D + Z alpha from alpha (n, m)."""
    n = spec.n
    Z = jnp.broadcast_to(spec.Z, (n,) + spec.Z.shape[1:]) \
        if spec.Z.shape[0] == 1 else spec.Z
    D = jnp.broadcast_to(spec.D, (n, spec.p)).astype(alpha.dtype)
    return D + jnp.einsum('tpm,tm->tp', Z, alpha)


def _match_mv(spec: MVNGSpec, mode):
    """Per-series Laplace matching; mode (n, p) -> ytilde, Htilde (n, p)."""
    cols_y, cols_H = [], []
    for j, d in enumerate(spec.distributions):
        yt, HH = fam.laplace_match(d, spec.y[:, j], spec.u[:, j],
                                   spec.phi[j], mode[:, j])
        H = jnp.sqrt(jnp.where(jnp.isfinite(HH) & (HH > 0), HH, 1.0))
        yt = jnp.where(jnp.isfinite(spec.y[:, j]), yt, jnp.nan)
        cols_y.append(yt)
        cols_H.append(H)
    return jnp.stack(cols_y, axis=1), jnp.stack(cols_H, axis=1)


class MVApproxResult(NamedTuple):
    mode: jnp.ndarray      # (n, p)
    ytilde: jnp.ndarray    # (n, p)
    Htilde: jnp.ndarray    # (n, p)
    niter: jnp.ndarray
    gloglik: jnp.ndarray | None = None   # fused KF loglik (see kalman.py)

    def gaussian(self, spec: MVNGSpec) -> MVLGSpec:
        return spec.approx_gaussian(self.ytilde, self.Htilde)


def approximate_mv(spec: MVNGSpec, conv_tol=CONV_TOL,
                   max_iter=MAX_ITER, mode0=None) -> MVApproxResult:
    """Laplace iteration (`/root/reference/src/model_ssm_mng.cpp:84-120`).
    ``mode0`` optionally warm-starts the iteration (see approx.approximate)."""
    n = spec.n
    if mode0 is None:
        mode0 = spec.initial_mode.astype(spec.y.dtype)
    else:
        mode0 = mode0.astype(spec.y.dtype)
    # conv_tol below the dtype noise floor would always exhaust max_iter
    # (f32 eps ~1e-7); clamp to a resolvable tolerance
    conv_tol = max(conv_tol, 50.0 * float(jnp.finfo(spec.y.dtype).eps))

    def cond(c):
        _, _, _, i, diff, _ = c
        return (i < max_iter) & (diff > conv_tol)

    def body(c):
        mode, _, _, i, _, _ = c
        yt, H = _match_mv(spec, mode)
        g = spec.approx_gaussian(yt, H)
        alpha, gll = kalman_mv.fast_smoother_mv_ll(g)
        new_mode = signal_mv(spec, alpha[:n])
        diff = jnp.sum(jnp.square(new_mode - mode)) / n
        return (new_mode, yt, H, i + 1, diff, gll)

    yt0, H0 = _match_mv(spec, mode0)
    init = (mode0, yt0, H0, jnp.zeros((), jnp.int32),
            jnp.asarray(conv_tol + 1.0, spec.y.dtype),
            jnp.zeros((), spec.y.dtype))
    mode, yt, H, niter, _, gll = jax.lax.while_loop(cond, body, init)
    return MVApproxResult(mode, yt, H, niter, gll)


class MVApproxLoglik(NamedTuple):
    approx: MVApproxResult
    scales: jnp.ndarray    # (n,) summed over series
    loglik: jnp.ndarray


def _series_scales(spec: MVNGSpec, mode, yt, H):
    """Sum over series of mode-based correction terms, (n,)."""
    total = jnp.zeros(spec.n, spec.y.dtype)
    for j, d in enumerate(spec.distributions):
        sc = fam.scales(d, spec.y[:, j], spec.u[:, j], spec.phi[j],
                        mode[:, j], yt[:, j], H[:, j])
        total = total + jnp.where(jnp.isfinite(spec.y[:, j]), sc, 0.0)
    return total


def approx_loglik_mv(spec: MVNGSpec, approx=None, conv_tol=CONV_TOL,
                     max_iter=MAX_ITER, mode0=None) -> MVApproxLoglik:
    if approx is None:
        approx = approximate_mv(spec, conv_tol, max_iter, mode0=mode0)
    if approx.gloglik is not None:
        gll = approx.gloglik
    else:
        gll = kalman_mv.log_likelihood_mv(approx.gaussian(spec))
    sc = _series_scales(spec, approx.mode, approx.ytilde, approx.Htilde)
    ct = jnp.zeros((), spec.y.dtype)
    for j, d in enumerate(spec.distributions):
        ct = ct + fam.const_term(d, spec.y[:, j], spec.u[:, j], spec.phi[j],
                                 approx.ytilde[:, j], approx.Htilde[:, j])
    return MVApproxLoglik(approx, sc, gll + ct + jnp.sum(sc))


def approximate_for_is_mv(spec: MVNGSpec, mode) -> MVApproxLoglik:
    yt, H = _match_mv(spec, mode)
    ar = MVApproxResult(mode, yt, H, jnp.ones((), jnp.int32))
    sc = _series_scales(spec, mode, yt, H)
    return MVApproxLoglik(ar, sc, jnp.zeros((), spec.y.dtype))


def _log_weights_mv(spec: MVNGSpec, t_sig, y_t, u_t, yt_t, H_t):
    """Summed per-series importance log-weights for particles; t_sig (N, p)."""
    total = jnp.zeros(t_sig.shape[0], t_sig.dtype)
    for j, d in enumerate(spec.distributions):
        lw = fam.log_weights(d, y_t[j], u_t[j], spec.phi[j], t_sig[:, j],
                             yt_t[j], H_t[j])
        total = total + lw
    return total


def _log_obs_mv(spec: MVNGSpec, t_sig, y_t, u_t):
    total = jnp.zeros(t_sig.shape[0], t_sig.dtype)
    for j, d in enumerate(spec.distributions):
        total = total + fam.log_obs_density(d, y_t[j], u_t[j], spec.phi[j],
                                            t_sig[:, j])
    return total


class MVPFResult(NamedTuple):
    loglik: jnp.ndarray
    alpha: jnp.ndarray
    weights: jnp.ndarray
    indices: jnp.ndarray


def _lse(logw, N, dt):
    # non-finite particle weights (f32 overflow artifacts) count as zero
    logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
    mx = jnp.max(logw)
    w = jnp.exp(logw - mx)
    sw = jnp.sum(w)
    ok = (sw > 0) & jnp.isfinite(mx)
    inc = jnp.where(ok, mx + jnp.log(sw / N), -jnp.inf)
    nw = jnp.where(ok, w / jnp.where(sw > 0, sw, 1.0), jnp.ones_like(w) / N)
    return inc.astype(dt), nw


def _bcz(A, n):
    return jnp.broadcast_to(A, (n,) + A.shape[1:]) if A.shape[0] == 1 else A


def psi_filter_mv(spec: MVNGSpec, al: MVApproxLoglik, nsim: int, key
                  ) -> MVPFResult:
    """psi-APF (`/root/reference/src/model_ssm_mng.cpp` psi path).

    Backward-factorized proposal (generation t = n..0) with pre-traced,
    time-ordered trajectories and identity indices in the result — see
    `particle.psi_filter` / `ops.kalman.smoother_bwd_factors` for the f32
    rationale."""
    from ..ops.resample import ancestor_trace
    n, m, p = spec.n, spec.m, spec.p
    dt = spec.y.dtype
    g = al.approx.gaussian(spec)
    ahat, Lb, Ab = kalman_mv.smoother_bwd_factors_mv(g)
    Zb = _bcz(spec.Z, n)
    Db = jnp.broadcast_to(spec.D, (n, p)).astype(dt)

    key, k0 = jax.random.split(key)
    alpha0 = ahat[n] + jax.random.normal(k0, (nsim, m), dt) @ Lb[n].T
    nw0 = jnp.ones((nsim,), dt) / nsim
    ll0 = al.loglik

    keys = jax.random.split(key, n)
    flip = lambda a: jnp.flip(a, axis=0)                   # noqa: E731

    def step(carry, xs):
        alpha_prev, nw, ll = carry          # ensemble of state t+1
        (kt, ah_t, ah_prev, A_t, L_t, y_t, u_t, yt_t, H_t, sc_t,
         Z_t, D_t) = xs
        kr, kp = jax.random.split(kt)
        anc, idx = stratified_select(nw, kr, alpha_prev)
        um = jax.random.normal(kp, (nsim, m), dt)
        alpha_t = ah_t + (anc - ah_prev) @ A_t.T + um @ L_t.T
        sig = D_t + alpha_t @ Z_t.T
        lw = _log_weights_mv(spec, sig, y_t, u_t, yt_t, H_t) - sc_t
        valid = jnp.any(jnp.isfinite(y_t))
        inc, nw_new = _lse(jnp.where(valid, lw, 0.0), nsim, dt)
        ll = ll + jnp.where(valid, inc, 0.0)
        nw_new = jnp.where(valid, nw_new, jnp.ones((nsim,), dt) / nsim)
        return (alpha_t, nw_new, ll), (alpha_t, nw_new, idx)

    xs = (keys, flip(ahat[:-1]), flip(ahat[1:]), flip(Ab[:-1]),
          flip(Lb[:-1]), flip(spec.y), flip(spec.u),
          flip(al.approx.ytilde), flip(al.approx.Htilde), flip(al.scales),
          flip(Zb), flip(Db))
    (_, _, ll), (alphas, nws, idxs) = jax.lax.scan(
        step, (alpha0, nw0, ll0), xs)
    alpha_gen = jnp.concatenate([alpha0[None], alphas], axis=0)
    traced = ancestor_trace(jnp.swapaxes(alpha_gen, 0, 1), idxs.T)
    traced = jnp.flip(traced, axis=1)
    weights = jnp.concatenate([nw0[None], nws], axis=0)
    identity = jnp.broadcast_to(jnp.arange(nsim, dtype=idxs.dtype)[:, None],
                                (nsim, n))
    return MVPFResult(ll, traced, weights.T, identity)


def bsf_filter_mv(spec: MVNGSpec, nsim: int, key) -> MVPFResult:
    """Bootstrap filter for multivariate NG models."""
    n, m, k, p = spec.n, spec.m, spec.k, spec.p
    dt = spec.y.dtype
    Zb = _bcz(spec.Z, n)
    Db = jnp.broadcast_to(spec.D, (n, p)).astype(dt)
    Tb, Cb, Rb = _bcz(spec.T, n), _bcz(spec.C, n), _bcz(spec.R, n)

    key, k0 = jax.random.split(key)
    L1 = psd_chol(spec.P1)
    alpha0 = spec.a1 + jax.random.normal(k0, (nsim, m), dt) @ L1.T

    def dens_at(t, alpha_p):
        sig = Db[t] + alpha_p @ Zb[t].T
        return _log_obs_mv(spec, sig, spec.y[t], spec.u[t])

    y0ok = jnp.any(jnp.isfinite(spec.y[0]))
    inc0, nw0 = _lse(jnp.where(y0ok, dens_at(0, alpha0), 0.0), nsim, dt)
    ll0 = jnp.where(y0ok, inc0, 0.0)
    nw0 = jnp.where(y0ok, nw0, jnp.ones((nsim,), dt) / nsim)

    keys = jax.random.split(key, n)

    def step(carry, xs):
        alpha_t, nw, ll, t = carry
        kt = xs
        kr, kp = jax.random.split(kt)
        anc, idx = stratified_select(nw, kr, alpha_t)
        eta = jax.random.normal(kp, (nsim, k), dt)
        alpha_next = Cb[t] + anc @ Tb[t].T + eta @ Rb[t].T
        is_last = t + 1 >= n
        tt = jnp.minimum(t + 1, n - 1)
        valid = jnp.any(jnp.isfinite(spec.y[tt])) & (~is_last)
        lw = dens_at(tt, alpha_next)
        inc, nw_new = _lse(jnp.where(valid, lw, 0.0), nsim, dt)
        ll = ll + jnp.where(valid, inc, 0.0)
        nw_new = jnp.where(valid, nw_new, jnp.ones((nsim,), dt) / nsim)
        return (alpha_next, nw_new, ll, t + 1), (alpha_next, nw_new, idx)

    (_, _, ll, _), (alphas, nws, idxs) = jax.lax.scan(
        step, (alpha0, nw0, ll0, jnp.zeros((), jnp.int32)), keys)
    for j, d in enumerate(spec.distributions):
        ll = ll + fam.obs_log_const(d, spec.y[:, j], spec.u[:, j],
                                    spec.phi[j])
    alpha = jnp.concatenate([alpha0[None], alphas], axis=0)
    weights = jnp.concatenate([nw0[None], nws], axis=0)
    return MVPFResult(ll, jnp.swapaxes(alpha, 0, 1), weights.T, idxs.T)


def spdk_sample_mv(spec: MVNGSpec, al: MVApproxLoglik, nsim: int, key,
                   antithetic: bool = True):
    """SPDK importance sampling for multivariate models."""
    n = spec.n
    g = al.approx.gaussian(spec)
    alpha = kalman_mv.simulate_states_mv(g, nsim, key,
                                         use_antithetic=antithetic)
    sig = jax.vmap(lambda a: signal_mv(spec, a[:n]))(alpha)    # (N, n, p)
    w = jnp.zeros(alpha.shape[0], spec.y.dtype)
    for j, d in enumerate(spec.distributions):
        lw = fam.log_weights(d, spec.y[:, j], spec.u[:, j], spec.phi[j],
                             sig[:, :, j], al.approx.ytilde[:, j],
                             al.approx.Htilde[:, j])
        w = w + jnp.sum(lw, axis=1)
    w = w - jnp.sum(al.scales)
    mx = jnp.max(w)
    we = jnp.exp(w - mx)
    loglik = al.loglik + jnp.log(jnp.mean(we)) + mx
    return loglik, alpha, we / jnp.sum(we)
