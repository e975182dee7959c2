"""Branch-free Cholesky utilities for (possibly) singular covariances.

State-space models routinely carry deterministic state components, so
covariance matrices have exact zero rows/columns.  The reference handles this
by slicing out the nonzero submatrix (`/root/reference/src/psd_chol.cpp:5-18`,
`/root/reference/src/conditional_dist.cpp:33-65`); on TPU we need static
shapes, so we use the "unit-diagonal padding" trick: add 1 to the diagonal of
(near-)zero rows, factor, and zero them back out.  Because those rows/columns
are zero off-diagonal, the resulting factor is exactly the padded-submatrix
factor — no approximation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 2.220446049250313e-16  # double eps; threshold semantics follow the ref


def _zero_diag_mask(x: jnp.ndarray, rel: bool = True) -> jnp.ndarray:
    """True for rows considered active (diagonal > tolerance)."""
    d = jnp.diagonal(x)
    if rel:
        tol = jnp.maximum(_EPS, _EPS * x.shape[-1] * jnp.max(d))
    else:
        tol = _EPS
    return d > tol


def psd_chol(x: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of a PSD matrix whose singularity comes from zero
    diagonal entries (deterministic states).  Matches
    `/root/reference/src/psd_chol.cpp:5-18` semantics with static shapes."""
    active = _zero_diag_mask(x, rel=True)
    return masked_chol(x, active)


def masked_chol(x: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of ``x`` restricted to ``active`` rows/cols; inactive rows and
    columns of the result are exactly zero."""
    am = active.astype(x.dtype)
    outer = am[:, None] * am[None, :]
    padded = x * outer + jnp.diag(1.0 - am)
    L = jnp.linalg.cholesky(padded)
    # Guard NaNs from genuinely indefinite input the same way the reference's
    # chol would abort — propagate zeros instead (callers check diagnostics).
    L = jnp.where(jnp.isfinite(L), L, 0.0)
    return L * outer


def masked_tri_solve(L: jnp.ndarray, b: jnp.ndarray, active: jnp.ndarray,
                     lower: bool = True) -> jnp.ndarray:
    """Solve L x = b on the active subspace (L from ``masked_chol``)."""
    am = active.astype(L.dtype)
    Ls = L + jnp.diag(1.0 - am)
    x = jax.scipy.linalg.solve_triangular(Ls, b, lower=lower)
    if b.ndim == 1:
        return x * am
    return x * am[:, None]


def conditional_cov_factors(Vt: jnp.ndarray, Ct: jnp.ndarray):
    """Convert smoothed marginal covariances + lag-1 cross-covariances into
    the psi-APF conditional proposal parameters.

    Inputs (cf. `/root/reference/src/conditional_dist.cpp:33-65`):
      Vt:  (n+1, m, m) smoothed covariances Var(alpha_t | y)
      Ct:  (n+1, m, m) with Ct[t] = Cov(alpha_t, alpha_{t+1} | y) for t < n
    Returns:
      Lcond: (n+1, m, m) lower factors of Var(alpha_t | alpha_{t-1}, y)
      Acond: (n+1, m, m) regression coefs: E[a_t|a_{t-1}] = ahat_t +
             Acond[t] (a_{t-1} - ahat_{t-1});  Acond[0] = 0.
    """
    n1, m, _ = Vt.shape

    def step(carry, xs):
        V_prev, C_prev, V_t = xs
        active = _zero_diag_mask(V_prev, rel=False)
        L_prev = masked_chol(V_prev, active)
        # tmp = L^{-1} C  (C = Cov(a_{t-1}, a_t))
        tmp = masked_tri_solve(L_prev, C_prev, active)
        V_c = V_t - tmp.T @ tmp
        # A = C' V_prev^{-1} = (L'^{-1} (L^{-1} C))'.  NOTE: the reference
        # (`conditional_dist.cpp:46`) applies a *lower* solve twice, which is
        # only correct for m = 1; validated against a dense joint-Gaussian
        # oracle, the transpose solve is the exact conditional coefficient.
        A = masked_tri_solve(L_prev.T, tmp, active, lower=False).T
        active2 = _zero_diag_mask(V_c, rel=False)
        L_c = masked_chol(V_c, active2)
        return carry, (L_c, A)

    # vectorised over t = 1..n (no sequential dependence between steps)
    xs = (Vt[:-1], Ct[:-1], Vt[1:])
    _, (Ls, As) = jax.lax.scan(step, None, xs)
    L0 = masked_chol(Vt[0], _zero_diag_mask(Vt[0], rel=False))
    Lcond = jnp.concatenate([L0[None], Ls], axis=0)
    Acond = jnp.concatenate([jnp.zeros((1, m, m), Vt.dtype), As], axis=0)
    return Lcond, Acond


def chol_rank1_update(L: jnp.ndarray, v: jnp.ndarray, down: bool) -> jnp.ndarray:
    """Rank-1 Cholesky update (``down=False``) / downdate (``down=True``) of a
    lower-triangular factor, L L' +- v v'.

    Re-derivation of the RAM adaptation primitive used via the `ramcmc`
    header library by the reference (`/root/reference/src/mcmc.cpp:277`);
    standard hyperbolic/Givens rotation algorithm, sequential over the (small)
    parameter dimension.
    """
    d = L.shape[0]
    sign = jnp.where(down, -1.0, 1.0).astype(L.dtype)

    def body(k, carry):
        L, v = carry
        Lkk = L[k, k]
        vk = v[k]
        r2 = Lkk * Lkk + sign * vk * vk
        r = jnp.sqrt(jnp.maximum(r2, jnp.finfo(L.dtype).tiny))
        c = r / Lkk
        s = vk / Lkk
        col = L[:, k]
        new_col = (col + sign * s * v) / c
        new_v = c * v - s * new_col
        # only touch rows > k (strictly below diagonal) plus the diagonal
        rows = jnp.arange(d)
        below = rows > k
        L = L.at[:, k].set(jnp.where(below, new_col, col))
        L = L.at[k, k].set(r)
        v = jnp.where(below, new_v, v)
        return L, v

    L, _ = jax.lax.fori_loop(0, d, body, (L, v))
    return L
