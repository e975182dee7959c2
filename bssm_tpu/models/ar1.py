"""AR(1) models with Gaussian or exponential-family observations.

Parameterisation (`/root/reference/src/model_ar1_lg.cpp:12-35`,
`/root/reference/src/model_ar1_ng.cpp:12-36`):
  alpha_{t+1} = mu (1 - rho) + rho alpha_t + sigma eta_t,
  alpha_1 ~ N(mu, sigma^2 / (1 - rho^2)),
theta = (rho, log sigma, [mu], [log sd_y | log phi], [beta...]).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.priors import IDENTITY, LOG
from ..core.spec import GAMMA, LGSpec, NEGBIN, NGSpec
from ..core.validate import check_beta, check_u, check_xreg, check_y
from .base import Model, collect_priors, init_mode, _is_prior
from .bsm import _DIST_NAMES


def ar1_lg(y, rho, sigma, mu=None, sd_y=None, beta=None, xreg=None,
           dtype=jnp.float64) -> Model:
    y = check_y(y)
    n = y.shape[0]
    mu_est = _is_prior(mu)
    sd_y_est = _is_prior(sd_y)
    mu_fix = 0.0 if mu is None or mu_est else float(mu)
    sd_y_fix = 0.0 if sd_y is None or sd_y_est else float(sd_y)

    xreg_np = None if xreg is None else check_xreg(xreg, n)
    if xreg_np is not None:
        check_beta(beta, xreg_np.shape[1])
    n_beta = 0 if xreg_np is None else xreg_np.shape[1]

    stack, theta0, names = collect_priors([
        ("rho", rho, IDENTITY),
        ("sigma", sigma, LOG),
        ("mu", mu if mu_est else None, IDENTITY),
        ("sd_y", sd_y if sd_y_est else None, LOG),
        ("beta", beta, IDENTITY),
    ])

    yj = jnp.asarray(y, dtype)
    xregj = None if xreg_np is None else jnp.asarray(xreg_np, dtype)

    def build(theta):
        theta = theta.astype(dtype)
        rho_v = theta[0]
        sig = jnp.exp(theta[1])
        mu_v = theta[2] if mu_est else jnp.asarray(mu_fix, dtype)
        sdy = jnp.exp(theta[2 + int(mu_est)]) if sd_y_est \
            else jnp.asarray(sd_y_fix, dtype)
        D = jnp.zeros(1, dtype)
        if n_beta:
            D = xregj @ theta[-n_beta:]
        return LGSpec(
            y=yj, Z=jnp.ones((1, 1), dtype), H=sdy[None],
            T=rho_v.reshape(1, 1, 1), R=sig.reshape(1, 1, 1),
            a1=mu_v[None], P1=(sig * sig / (1.0 - rho_v * rho_v)).reshape(1, 1),
            D=D, C=(mu_v * (1.0 - rho_v)).reshape(1, 1))

    return Model(build=build, log_prior=stack.log_pdf, theta_init=theta0,
                 theta_names=names, transforms=stack.transforms, kind="lg",
                 extra={"m": 1, "n": n, "stack": stack})


def ar1_ng(y, rho, sigma, mu=None, distribution="poisson", phi=1.0, u=None,
           beta=None, xreg=None, dtype=jnp.float64) -> Model:
    dist = _DIST_NAMES[distribution] if isinstance(distribution, str) \
        else int(distribution)
    y = check_y(y, distribution=distribution
                if isinstance(distribution, str) else None)
    n = y.shape[0]
    u_ = np.ones(n) if u is None else check_u(u, y)
    mu_est = _is_prior(mu)
    mu_fix = 0.0 if mu is None or mu_est else float(mu)
    phi_used = dist in (NEGBIN, GAMMA)
    phi_est = phi_used and _is_prior(phi)
    phi_init = float(phi.init) if phi_est else float(phi if phi_used else 1.0)

    xreg_np = None if xreg is None else check_xreg(xreg, n)
    if xreg_np is not None:
        check_beta(beta, xreg_np.shape[1])
    n_beta = 0 if xreg_np is None else xreg_np.shape[1]

    stack, theta0, names = collect_priors([
        ("rho", rho, IDENTITY),
        ("sigma", sigma, LOG),
        ("mu", mu if mu_est else None, IDENTITY),
        ("phi", phi if phi_est else None, LOG),
        ("beta", beta, IDENTITY),
    ])

    mode0 = init_mode(y, u_, dist)
    yj = jnp.asarray(y, dtype)
    uj = jnp.asarray(u_, dtype)
    modej = jnp.asarray(mode0, dtype)
    xregj = None if xreg_np is None else jnp.asarray(xreg_np, dtype)

    def build(theta):
        theta = theta.astype(dtype)
        rho_v = theta[0]
        sig = jnp.exp(theta[1])
        mu_v = theta[2] if mu_est else jnp.asarray(mu_fix, dtype)
        phi_v = jnp.exp(theta[2 + int(mu_est)]) if phi_est \
            else jnp.asarray(phi_init, dtype)
        D = jnp.zeros(1, dtype)
        if n_beta:
            D = xregj @ theta[-n_beta:]
        return NGSpec(
            y=yj, Z=jnp.ones((1, 1), dtype),
            T=rho_v.reshape(1, 1, 1), R=sig.reshape(1, 1, 1),
            a1=mu_v[None], P1=(sig * sig / (1.0 - rho_v * rho_v)).reshape(1, 1),
            D=D, C=(mu_v * (1.0 - rho_v)).reshape(1, 1),
            phi=phi_v, u=uj, distribution=dist, initial_mode=modej)

    return Model(build=build, log_prior=stack.log_pdf, theta_init=theta0,
                 theta_names=names, transforms=stack.transforms, kind="ng",
                 extra={"m": 1, "n": n, "stack": stack, "distribution": dist})
