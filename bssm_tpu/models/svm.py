"""Stochastic volatility model.

Two parameterisations (`/root/reference/src/model_svm.cpp:12-48`,
`/root/reference/R/models.R:1183-1260`):
  svm_type=0 ("sigma"): y_t = sigma exp(alpha_t/2) e_t,  theta = (rho, sd_ar,
      sigma) with phi = sigma;
  svm_type=1 ("mu"):    y_t = exp(alpha_t/2) e_t, state has mean mu,
      theta = (rho, sd_ar, mu).
State: alpha_{t+1} = mu(1-rho) + rho alpha_t + sd_ar eta,
alpha_1 ~ N(mu-or-0, sd_ar^2/(1-rho^2)).  Theta is sampled untransformed.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.priors import IDENTITY
from ..core.spec import NGSpec, SVM
from ..core.validate import check_y
from .base import Model, collect_priors


def svm(y, rho, sd_ar, sigma=None, mu=None, dtype=jnp.float64) -> Model:
    if (sigma is None) == (mu is None):
        raise ValueError("provide exactly one of sigma (svm_type=0) "
                         "or mu (svm_type=1)")
    svm_type = 1 if sigma is None else 0   # sigma given -> "sigma" type 0
    y = check_y(y)
    n = y.shape[0]

    stack, theta0, names = collect_priors([
        ("rho", rho, IDENTITY),
        ("sd_ar", sd_ar, IDENTITY),
        ("sigma" if svm_type == 0 else "mu",
         sigma if svm_type == 0 else mu, IDENTITY),
    ])

    mode0 = np.log(np.where(np.isnan(y), 1e-4, np.maximum(1e-4, y * y)))
    yj = jnp.asarray(y, dtype)
    uj = jnp.ones(n, dtype)
    modej = jnp.asarray(mode0, dtype)

    def build(theta):
        theta = theta.astype(dtype)
        rho_v = theta[0]
        sd = theta[1]
        third = theta[2]
        if svm_type == 0:
            phi_v = third            # sigma
            a1 = jnp.zeros(1, dtype)
            C = jnp.zeros((1, 1), dtype)
        else:
            phi_v = jnp.ones((), dtype)
            a1 = third[None]
            C = (third * (1.0 - rho_v)).reshape(1, 1)
        return NGSpec(
            y=yj, Z=jnp.ones((1, 1), dtype),
            T=rho_v.reshape(1, 1, 1), R=sd.reshape(1, 1, 1),
            a1=a1, P1=(sd * sd / (1.0 - rho_v * rho_v)).reshape(1, 1),
            D=jnp.zeros(1, dtype), C=C,
            phi=phi_v, u=uj, distribution=SVM, initial_mode=modej)

    return Model(build=build, log_prior=stack.log_pdf, theta_init=theta0,
                 theta_names=names, transforms=stack.transforms, kind="ng",
                 extra={"m": 1, "n": n, "stack": stack, "distribution": SVM,
                        "svm_type": svm_type})
