"""General state-space models with user-supplied JAX update functions.

The reference's `ssm_ulg`/`ssm_ung`/`ssm_mlg`/`ssm_mng` take R callback
functions ``update_fn``/``prior_fn`` re-entered from C++ on every proposal
(`/root/reference/src/model_ssm_ulg.cpp:64-104`) — the main serial bottleneck
the `parset_*` machinery works around.  Here the callbacks are **JAX
functions** traced once into the MCMC kernel: ``update_fn(theta)`` returns a
dict of system arrays to override, ``prior_fn(theta)`` a scalar log-density.

Array shape conventions follow R (time axis last on input) and are
normalised to the spec convention (time axis first).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..core.spec import LGSpec, MVLGSpec, MVNGSpec, NGSpec
from .base import Model, init_mode
from .bsm import _DIST_NAMES


def _tfirst(A, core_ndim):
    """Move a trailing time axis (if any) to the front; add it if absent."""
    A = jnp.asarray(A)
    if A.ndim == core_ndim:
        return A[None]
    return jnp.moveaxis(A, -1, 0)


def _norm_uni(Z, H, T, R, m):
    """Univariate-obs system arrays -> spec layout."""
    Z = jnp.asarray(Z)
    Z = Z.reshape(1, m) if Z.ndim <= 1 else jnp.moveaxis(
        Z.reshape(m, -1), -1, 0)
    H = jnp.atleast_1d(jnp.asarray(H)).reshape(-1)
    T = _tfirst(jnp.asarray(T).reshape(m, m, -1) if jnp.asarray(T).ndim == 3
                else jnp.asarray(T).reshape(m, m), 2)
    R_ = jnp.asarray(R)
    if R_.ndim == 1:
        R_ = R_.reshape(m, 1)
    R = _tfirst(R_, 2)
    return Z, H, T, R


def _defaults(m, a1, P1, D, C, p=None, dtype=jnp.float64):
    a1_ = jnp.zeros(m, dtype) if a1 is None else \
        jnp.asarray(a1, dtype).reshape(m)
    P1_ = jnp.zeros((m, m), dtype) if P1 is None else \
        jnp.asarray(P1, dtype).reshape(m, m)
    if D is None:
        D_ = jnp.zeros(1, dtype) if p is None else jnp.zeros((1, p), dtype)
    else:
        D_ = jnp.asarray(D, dtype)
        D_ = D_.reshape(-1) if p is None else \
            (D_.reshape(1, p) if D_.ndim <= 1 else jnp.moveaxis(D_, -1, 0))
    if C is None:
        C_ = jnp.zeros((1, m), dtype)
    else:
        C_ = jnp.asarray(C, dtype)
        C_ = C_.reshape(1, m) if C_.ndim <= 1 else jnp.moveaxis(
            C_.reshape(m, -1), -1, 0)
    return a1_, P1_, D_, C_


def _make_model(base_spec, update_fn, prior_fn, init_theta, kind, extra,
                names=None):
    theta0 = jnp.asarray(np.atleast_1d(np.asarray(init_theta,
                                                  dtype=np.float64)))

    def build(theta):
        spec = base_spec
        if update_fn is not None:
            upd = update_fn(theta)
            norm = {}
            for k, v in upd.items():
                cur = getattr(spec, k)
                v = jnp.asarray(v, cur.dtype)
                if k in ("y", "a1", "H", "u", "phi", "initial_mode"):
                    norm[k] = v.reshape(cur.shape) if v.shape != cur.shape \
                        and v.ndim == cur.ndim else v
                elif k == "P1":
                    norm[k] = v.reshape(cur.shape[-2:])
                elif k in ("Z", "T", "R", "C", "D"):
                    core = cur.ndim - 1
                    if v.ndim == core:
                        norm[k] = v[None]
                    elif v.shape[0] == cur.shape[0]:
                        norm[k] = v
                    else:
                        norm[k] = jnp.moveaxis(v, -1, 0)
                else:
                    norm[k] = v
            # LGSpec/MVLGSpec are NamedTuples (_replace); NG specs are
            # flax.struct dataclasses (replace)
            spec = (spec._replace(**norm) if hasattr(spec, "_replace")
                    else spec.replace(**norm))
        return spec

    lp = (lambda th: jnp.zeros((), theta0.dtype)) if prior_fn is None \
        else prior_fn
    if names is None:
        names = tuple(f"theta_{i + 1}" for i in range(theta0.shape[0]))
    return Model(build=build, log_prior=lp, theta_init=theta0,
                 theta_names=names,
                 transforms=np.zeros(theta0.shape[0], np.int32),
                 kind=kind, extra=extra)


def ssm_ulg(y, Z, H, T, R, a1=None, P1=None, D=None, C=None,
            init_theta=(), update_fn: Optional[Callable] = None,
            prior_fn: Optional[Callable] = None, theta_names=None,
            dtype=jnp.float64) -> Model:
    """Univariate linear-Gaussian model (`/root/reference/R/models.R:193`)."""
    y = jnp.asarray(np.asarray(y, np.float64), dtype)
    a1_arr = np.atleast_1d(np.asarray(a1)) if a1 is not None else None
    m = (a1_arr.shape[0] if a1_arr is not None
         else np.asarray(T).reshape(np.asarray(T).shape[0], -1).shape[0])
    Zj, Hj, Tj, Rj = _norm_uni(Z, H, T, R, m)
    a1_, P1_, D_, C_ = _defaults(m, a1, P1, D, C, dtype=dtype)
    spec = LGSpec(y=y, Z=Zj.astype(dtype), H=Hj.astype(dtype),
                  T=Tj.astype(dtype), R=Rj.astype(dtype), a1=a1_, P1=P1_,
                  D=D_, C=C_)
    return _make_model(spec, update_fn, prior_fn, init_theta, "lg",
                       {"m": m, "n": y.shape[0]}, theta_names)


def ssm_ung(y, Z, T, R, distribution, phi=1.0, u=None, a1=None, P1=None,
            D=None, C=None, init_theta=(), update_fn=None, prior_fn=None,
            theta_names=None, dtype=jnp.float64) -> Model:
    """Univariate non-Gaussian model (`/root/reference/R/models.R:309`)."""
    dist = _DIST_NAMES[distribution] if isinstance(distribution, str) \
        else int(distribution)
    y_np = np.asarray(y, np.float64)
    n = y_np.shape[0]
    u_np = np.ones(n) if u is None else np.broadcast_to(
        np.asarray(u, np.float64), (n,)).copy()
    a1_arr = np.atleast_1d(np.asarray(a1)) if a1 is not None else None
    m = (a1_arr.shape[0] if a1_arr is not None
         else np.asarray(T).reshape(np.asarray(T).shape[0], -1).shape[0])
    Zj, _, Tj, Rj = _norm_uni(Z, jnp.ones(1), T, R, m)
    a1_, P1_, D_, C_ = _defaults(m, a1, P1, D, C, dtype=dtype)
    spec = NGSpec(y=jnp.asarray(y_np, dtype), Z=Zj.astype(dtype),
                  T=Tj.astype(dtype), R=Rj.astype(dtype), a1=a1_, P1=P1_,
                  D=D_, C=C_, phi=jnp.asarray(float(phi), dtype),
                  u=jnp.asarray(u_np, dtype), distribution=dist,
                  initial_mode=jnp.asarray(init_mode(y_np, u_np, dist), dtype))
    return _make_model(spec, update_fn, prior_fn, init_theta, "ng",
                       {"m": m, "n": n, "distribution": dist}, theta_names)


def ssm_mlg(y, Z, H, T, R, a1=None, P1=None, D=None, C=None,
            init_theta=(), update_fn=None, prior_fn=None, theta_names=None,
            dtype=jnp.float64) -> Model:
    """Multivariate linear-Gaussian model (`/root/reference/R/models.R:414`)."""
    y = jnp.asarray(np.asarray(y, np.float64), dtype)
    n, p = y.shape
    Z_np = np.asarray(Z)
    m = Z_np.shape[1]
    Zj = _tfirst(jnp.asarray(Z_np), 2)
    H_np = np.asarray(H)
    if H_np.ndim == 0:
        H_np = np.eye(p) * float(H_np)
    Hj = _tfirst(jnp.asarray(H_np.reshape(p, p, -1)
                             if H_np.ndim == 3 else H_np), 2)
    Tj = _tfirst(jnp.asarray(T).reshape(m, m) if np.asarray(T).ndim == 2
                 else jnp.asarray(T), 2)
    R_np = np.asarray(R)
    Rj = _tfirst(jnp.asarray(R_np if R_np.ndim >= 2 else
                             R_np.reshape(m, 1)), 2)
    a1_, P1_, D_, C_ = _defaults(m, a1, P1, D, C, p=p, dtype=dtype)
    spec = MVLGSpec(y=y, Z=Zj.astype(dtype), H=Hj.astype(dtype),
                    T=Tj.astype(dtype), R=Rj.astype(dtype), a1=a1_, P1=P1_,
                    D=D_, C=C_)
    return _make_model(spec, update_fn, prior_fn, init_theta, "mlg",
                       {"m": m, "n": n, "p": p}, theta_names)


def ssm_mng(y, Z, T, R, distributions, phi=None, u=None, a1=None, P1=None,
            D=None, C=None, init_theta=(), update_fn=None, prior_fn=None,
            theta_names=None, dtype=jnp.float64) -> Model:
    """Multivariate non-Gaussian model with per-series families
    (`/root/reference/R/models.R:538`)."""
    y_np = np.asarray(y, np.float64)
    n, p = y_np.shape
    if isinstance(distributions, (str, int)):
        distributions = [distributions] * p
    dists = tuple(_DIST_NAMES[d] if isinstance(d, str) else int(d)
                  for d in distributions)
    u_np = np.ones((n, p)) if u is None else np.broadcast_to(
        np.asarray(u, np.float64), (n, p)).copy()
    phi_np = np.ones(p) if phi is None else np.broadcast_to(
        np.asarray(phi, np.float64), (p,)).copy()
    Z_np = np.asarray(Z)
    m = Z_np.shape[1]
    Zj = _tfirst(jnp.asarray(Z_np), 2)
    Tj = _tfirst(jnp.asarray(T).reshape(m, m) if np.asarray(T).ndim == 2
                 else jnp.asarray(T), 2)
    R_np = np.asarray(R)
    Rj = _tfirst(jnp.asarray(R_np if R_np.ndim >= 2 else
                             R_np.reshape(m, 1)), 2)
    a1_, P1_, D_, C_ = _defaults(m, a1, P1, D, C, p=p, dtype=dtype)
    mode0 = np.stack([init_mode(y_np[:, j], u_np[:, j], dists[j])
                      for j in range(p)], axis=1)
    spec = MVNGSpec(y=jnp.asarray(y_np, dtype), Z=Zj.astype(dtype),
                    T=Tj.astype(dtype), R=Rj.astype(dtype), a1=a1_, P1=P1_,
                    D=D_, C=C_, phi=jnp.asarray(phi_np, dtype),
                    u=jnp.asarray(u_np, dtype), distributions=dists,
                    initial_mode=jnp.asarray(mode0, dtype))
    return _make_model(spec, update_fn, prior_fn, init_theta, "mng",
                       {"m": m, "n": n, "p": p}, theta_names)


def as_bssm(y, Z, H, T, R, a1=None, P1=None, D=None, C=None,
            distribution=None, phi=1.0, u=None, **kwargs):
    """Build a general model from raw system matrices — the Python analogue
    of the reference's KFAS converter (`/root/reference/R/as_bssm.R:26`):
    Gaussian matrices map to ssm_ulg/ssm_mlg, an observation family to
    ssm_ung/ssm_mng."""
    import numpy as _np
    y_np = _np.asarray(y, _np.float64)
    multivariate = y_np.ndim == 2 and y_np.shape[1] > 1
    if distribution is None:
        if multivariate:
            return ssm_mlg(y, Z, H, T, R, a1=a1, P1=P1, D=D, C=C, **kwargs)
        return ssm_ulg(y, Z, H, T, R, a1=a1, P1=P1, D=D, C=C, **kwargs)
    if multivariate:
        return ssm_mng(y, Z, T, R, distributions=distribution, phi=phi, u=u,
                       a1=a1, P1=P1, D=D, C=C, **kwargs)
    return ssm_ung(y, Z, T, R, distribution=distribution, phi=phi, u=u,
                   a1=a1, P1=P1, D=D, C=C, **kwargs)
