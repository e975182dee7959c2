"""Parallel-in-time Kalman filtering via `associative_scan`.

The reference's filters are strictly sequential O(n) recursions (asserted by
`/root/reference/tests/testthat/test_mcmc.R:68-104`); this module implements
the prefix-sum reformulation of Sarkka & Garcia-Fernandez ("Temporal
Parallelization of Bayesian Smoothers", IEEE TAC 2021) — the SSM analogue of
sequence parallelism (SURVEY.md §5.7):

  each time step becomes a 5-tuple element (A, b, C, eta, J) and the Kalman
  recursion is an associative composition, so XLA evaluates the whole filter
  in O(log n) depth. Missing observations degrade an element to pure
  prediction (J = eta = 0), keeping everything branch-free.

Use this tier for long series / few chains; the sequential scan wins when
thousands of vmapped chains already saturate the chip.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.spec import LGSpec
from .kalman import LOG2PI, ZERO_TOL, _step_arrays


class PFilterResult(NamedTuple):
    att: jnp.ndarray   # (n, m) filtered means
    Ptt: jnp.ndarray   # (n, m, m) filtered covariances
    at: jnp.ndarray    # (n, m) predicted means (a_0 = a1)
    Pt: jnp.ndarray    # (n, m, m) predicted covariances
    logLik: jnp.ndarray


def _combine(e1, e2):
    """Associative composition of filtering elements (Lemma 8)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    m = A1.shape[-1]
    I = jnp.eye(m, dtype=A1.dtype)
    # batched solves: leading dims broadcast
    IpCJ = I + C1 @ J2
    # X = (I + C1 J2)^{-1} applied from the left: solve IpCJ X = Y
    AX = jnp.linalg.solve(IpCJ, A1)
    CX = jnp.linalg.solve(IpCJ, C1)
    bX = jnp.linalg.solve(IpCJ, (b1 + (C1 @ eta2[..., None])[..., 0])[
        ..., None])[..., 0]
    A = A2 @ AX
    b = A2 @ bX[..., None]
    b = b[..., 0] + b2
    C = A2 @ CX @ jnp.swapaxes(A2, -1, -2) + C2
    IpJC = I + J2 @ C1
    tmp = jnp.linalg.solve(IpJC, (eta2 - (J2 @ b1[..., None])[..., 0])[
        ..., None])[..., 0]
    eta = (jnp.swapaxes(A1, -1, -2) @ tmp[..., None])[..., 0] + eta1
    Jtmp = jnp.linalg.solve(IpJC, J2 @ A1)
    J = jnp.swapaxes(A1, -1, -2) @ Jtmp + J1
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return A, b, C, eta, J


def _elements(spec: LGSpec):
    """Per-step filtering elements; step 0 folds in the prior."""
    n, m = spec.n, spec.m
    dt = spec.y.dtype
    yb, obsb, Zb, HHb, Tb, RRb, Db, Cb = _step_arrays(spec)
    HHb = jnp.where(jnp.isfinite(HHb), HHb, 1.0)
    ok = obsb & (HHb + jnp.einsum('tm,tm->t', Zb, Zb) > 0)
    okf = ok.astype(dt)
    yv = jnp.where(ok, yb - Db, 0.0)

    # generic elements k >= 1: F = T_{k-1}, Q = RR_{k-1}, c = C_{k-1}
    F = Tb[:-1]                       # (n-1, m, m)
    Q = RRb[:-1]
    c = Cb[:-1]
    Z = Zb[1:]                        # (n-1, m)
    HH = HHb[1:]
    y1 = yv[1:]
    ok1 = okf[1:]

    S = jnp.einsum('tm,tmk,tk->t', Z, Q, Z) + HH       # (n-1,)
    K = jnp.einsum('tmk,tk->tm', Q, Z) / S[:, None]    # (n-1, m)
    ImKH = jnp.eye(m, dtype=dt) - jnp.einsum('tm,tk->tmk', K, Z)
    resid = y1 - jnp.einsum('tm,tm->t', Z, c)
    A_obs = jnp.einsum('tmk,tkl->tml', ImKH, F)
    b_obs = c + K * resid[:, None]
    C_obs = jnp.einsum('tmk,tkl->tml', ImKH, Q)
    HS = Z / S[:, None]                                # H' S^{-1}
    eta_obs = jnp.einsum('tlm,tl->tm', F, HS * resid[:, None])
    # J = F' H' S^{-1} H F
    J_obs = jnp.einsum('tlm,tl,tk,tko->tmo', F, HS, Z, F)

    ok1e = ok1[:, None, None]
    A = jnp.where(ok1e, A_obs, F)
    b = jnp.where(ok1[:, None], b_obs, c)
    C = jnp.where(ok1e, C_obs, Q)
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    eta = jnp.where(ok1[:, None], eta_obs, 0.0)
    J = jnp.where(ok1e, J_obs, 0.0)

    # first element: prior + y_0
    P0 = spec.P1
    Z0, HH0 = Zb[0], HHb[0]
    S0 = Z0 @ P0 @ Z0 + HH0
    K0 = (P0 @ Z0) / S0
    r0 = yv[0] - Z0 @ spec.a1
    b0_obs = spec.a1 + K0 * r0
    C0_obs = (jnp.eye(m, dtype=dt) - jnp.outer(K0, Z0)) @ P0
    b0 = jnp.where(okf[0] > 0, b0_obs, spec.a1)
    C0 = jnp.where(okf[0] > 0, C0_obs, P0)
    C0 = 0.5 * (C0 + C0.T)
    A0 = jnp.zeros((m, m), dt)
    eta0 = jnp.zeros((m,), dt)
    J0 = jnp.zeros((m, m), dt)

    A = jnp.concatenate([A0[None], A], axis=0)
    b = jnp.concatenate([b0[None], b], axis=0)
    C = jnp.concatenate([C0[None], C], axis=0)
    eta = jnp.concatenate([eta0[None], eta], axis=0)
    J = jnp.concatenate([J0[None], J], axis=0)
    return (A, b, C, eta, J), ok


def kfilter_parallel(spec: LGSpec) -> PFilterResult:
    """O(log n)-depth Kalman filter; matches `kalman.kfilter` outputs."""
    n, m = spec.n, spec.m
    dt = spec.y.dtype
    elems, ok = _elements(spec)
    A, b, C, eta, J = jax.lax.associative_scan(_combine, elems)
    att, Ptt = b, C                                # filtered moments

    yb, obsb, Zb, HHb, Tb, RRb, Db, Cb = _step_arrays(spec)
    HHb = jnp.where(jnp.isfinite(HHb), HHb, 1.0)
    # predicted moments: a_0 = a1; a_k = c_{k-1} + T_{k-1} m_{k-1}
    at = jnp.concatenate(
        [spec.a1[None],
         Cb[:-1] + jnp.einsum('tmk,tk->tm', Tb[:-1], att[:-1])], axis=0)
    Pt = jnp.concatenate(
        [spec.P1[None],
         jnp.einsum('tmk,tkl,tol->tmo', Tb[:-1], Ptt[:-1], Tb[:-1])
         + RRb[:-1]], axis=0)

    F = jnp.einsum('tm,tmk,tk->t', Zb, Pt, Zb) + HHb
    Fs = jnp.where(ok, F, 1.0)
    v = jnp.where(ok, yb - Db - jnp.einsum('tm,tm->t', Zb, at), 0.0)
    lls = jnp.where(ok, -0.5 * (LOG2PI + jnp.log(Fs) + v * v / Fs), 0.0)
    return PFilterResult(att, Ptt, at, Pt, jnp.sum(lls))


def log_likelihood_parallel(spec: LGSpec) -> jnp.ndarray:
    return kfilter_parallel(spec).logLik


# ---------------------------------------------------------------------------
# fully parallel-in-time fast smoother (mean-only)
# ---------------------------------------------------------------------------

def _affine_combine(e1, e2):
    """Compose affine maps f(x) = b + M x: e2 after e1 -> (b2 + M2 b1,
    M2 M1).  With associative_scan this yields running compositions."""
    b1, M1 = e1
    b2, M2 = e2
    b = b2 + (M2 @ b1[..., None])[..., 0]
    M = M2 @ M1
    return b, M


def fast_smoother_parallel(spec: LGSpec) -> jnp.ndarray:
    """O(log n)-depth mean smoother == `kalman.fast_smoother`.

    All three passes become parallel scans: the forward filter via the
    associative Kalman elements, the backward r-recursion and the forward
    mean recursion as affine-map prefix compositions.  This makes the
    Laplace approximation loop parallel in time — the dominant cost of
    approximate/IS MCMC phase 1."""
    n, m = spec.n, spec.m
    dt = spec.y.dtype
    flt = kfilter_parallel(spec)

    yb, obsb, Zb, HHb, Tb, RRb, Db, Cb = _step_arrays(spec)
    HHb = jnp.where(jnp.isfinite(HHb), HHb, 1.0)
    F = jnp.einsum('tm,tmk,tk->t', Zb, flt.Pt, Zb) + HHb
    ok = obsb & (F > ZERO_TOL)
    okf = ok.astype(dt)
    Fs = jnp.where(ok, F, 1.0)
    v = jnp.where(ok, yb - Db - jnp.einsum('tm,tm->t', Zb, flt.at), 0.0)
    K = jnp.einsum('tmk,tk->tm', flt.Pt, Zb) / Fs[:, None] * okf[:, None]

    # L_t = T_t (I - K_t Z_t'); missing -> T_t
    ImKZ = jnp.eye(m, dtype=dt) - jnp.einsum('tm,tk->tmk', K, Zb)
    L = jnp.einsum('tmk,tkl->tml', Tb, ImKZ)

    # backward: r_{t-1} = b_t + L_t' r_t, r_{n-1} = 0
    bs = Zb * (v / Fs)[:, None] * okf[:, None]
    Ms = jnp.swapaxes(L, -1, -2)
    # suffix composition: comp[t] = f_t o f_{t+1} o ... o f_{n-1}.
    # Under reverse=True the op receives (suffix aggregate, earlier element)
    # — empirically verified — so compose as f_{e2} o f_{e1}:
    comp_b, comp_M = jax.lax.associative_scan(
        lambda e1, e2: (e2[0] + (e2[1] @ e1[0][..., None])[..., 0],
                        e2[1] @ e1[1]),
        (bs, Ms), reverse=True)
    # r_{t-1} = comp[t](0) = comp_b[t];  r_t for t=0..n-1:
    r_minus1 = comp_b[0]
    rt = jnp.concatenate([comp_b[1:], jnp.zeros((1, m), dt)], axis=0)

    alpha0 = spec.a1 + spec.P1 @ r_minus1

    # forward: alpha_{t+1} = (C_t + RR_t r_t) + T_t alpha_t
    bf = Cb + jnp.einsum('tmk,tk->tm', RRb, rt)
    Mf = Tb
    # prefix composition: pre[t] = f_t o f_{t-1} o ... o f_0
    pre_b, pre_M = jax.lax.associative_scan(
        lambda e1, e2: (e2[0] + (e2[1] @ e1[0][..., None])[..., 0],
                        e2[1] @ e1[1]),
        (bf, Mf))
    alphas = pre_b + jnp.einsum('tmk,k->tm', pre_M, alpha0)
    return jnp.concatenate([alpha0[None], alphas], axis=0)
