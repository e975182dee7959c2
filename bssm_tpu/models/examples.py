"""Built-in example models.

JAX-native equivalents of the reference's on-demand-compiled C++ snippets
(`/root/reference/R/cpp_example_models.R:15-765`): four nonlinear models and
two SDEs, used by tests and vignette-parity runs.  The reference requires
hand-written Jacobians; here they come free from `jax.jacfwd` (the built-ins
still provide exact forms to double as autodiff regression tests).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .nlg import ssm_nlg


def _halfnormal_lp(x, sd):
    return -0.5 * jnp.square(x / sd) - 0.5 * jnp.log(2 * jnp.pi) \
        - jnp.log(sd)


def nlg_linear_gaussian(y, dtype=jnp.float64):
    """Random walk + noise: y_t ~ N(alpha_t, exp(th0)^2), alpha RW(1)
    (`cpp_example_models.R:512`); theta = (log sd_y,)."""
    def Z_fn(t, a, th):
        return a

    def H_fn(t, a, th):
        return jnp.exp(th[0]).reshape(1, 1)

    def T_fn(t, a, th):
        return a

    def R_fn(t, a, th):
        return jnp.ones((1, 1), a.dtype)

    def log_prior(th):
        return _halfnormal_lp(jnp.exp(th[0]), 1.0) + th[0]

    return ssm_nlg(y, Z_fn, H_fn, T_fn, R_fn, m=1, k=1,
                   P1_fn=lambda th: jnp.eye(1, dtype=dtype) * 1e2,
                   theta_init=(np.log(1.0),), log_prior=log_prior,
                   theta_names=("log_sd_y",), dtype=dtype)


def nlg_sin_exp(y, dtype=jnp.float64):
    """alpha_{t+1} = sin(alpha_t) + eta; y ~ N(exp(alpha), .)
    (`cpp_example_models.R:635`); theta = (log sd_y, log sd_x)."""
    def Z_fn(t, a, th):
        return jnp.exp(a)

    def H_fn(t, a, th):
        return jnp.exp(th[0]).reshape(1, 1)

    def T_fn(t, a, th):
        return jnp.sin(a)

    def R_fn(t, a, th):
        return jnp.exp(th[1]).reshape(1, 1)

    def log_prior(th):
        return (_halfnormal_lp(jnp.exp(th[0]), 1.0) + th[0]
                + _halfnormal_lp(jnp.exp(th[1]), 1.0) + th[1])

    return ssm_nlg(y, Z_fn, H_fn, T_fn, R_fn, m=1, k=1,
                   P1_fn=lambda th: jnp.eye(1, dtype=dtype),
                   theta_init=(np.log(0.7), np.log(0.5)),
                   log_prior=log_prior,
                   theta_names=("log_sd_y", "log_sd_x"), dtype=dtype)


def nlg_ar_exp(y, dtype=jnp.float64):
    """AR(1) state, y ~ N(exp(alpha), .) (`cpp_example_models.R:194`);
    theta = (mu, rho, log sd_x, log sd_y)."""
    def Z_fn(t, a, th):
        return jnp.exp(a)

    def H_fn(t, a, th):
        return jnp.exp(th[3]).reshape(1, 1)

    def T_fn(t, a, th):
        return th[0] * (1.0 - th[1]) + th[1] * a

    def R_fn(t, a, th):
        return jnp.exp(th[2]).reshape(1, 1)

    def a1_fn(th):
        return th[0].reshape(1)

    def P1_fn(th):
        return (jnp.exp(th[2]) ** 2 / (1.0 - th[1] ** 2)).reshape(1, 1)

    def log_prior(th):
        mu, rho = th[0], th[1]
        lp = -0.5 * jnp.square(mu / 10.0)
        lp = lp + jnp.where((rho > 0) & (rho < 1),
                            jnp.log(rho) + jnp.log1p(-rho), -jnp.inf)
        lp = lp + _halfnormal_lp(jnp.exp(th[2]), 1.0) + th[2]
        lp = lp + _halfnormal_lp(jnp.exp(th[3]), 1.0) + th[3]
        return lp

    return ssm_nlg(y, Z_fn, H_fn, T_fn, R_fn, m=1, k=1,
                   a1_fn=a1_fn, P1_fn=P1_fn,
                   theta_init=(0.5, 0.5, np.log(0.5), np.log(0.5)),
                   log_prior=log_prior,
                   theta_names=("mu", "rho", "log_sd_x", "log_sd_y"),
                   dtype=dtype)


def nlg_growth(y, dT=1.0, K=100.0, a11=0.0, a12=5.0, P11=1.0, P12=2.0,
               dtype=jnp.float64):
    """Univariate logistic growth model (`cpp_example_models.R:336-470`,
    `vignettes/growth_model.Rmd`): states (log growth rate r on logit scale,
    population level); theta = (log H, log R1, log R2)."""
    def Z_fn(t, a, th):
        return a[1:2]

    def H_fn(t, a, th):
        return jnp.exp(th[0]).reshape(1, 1)

    def T_fn(t, a, th):
        r = jnp.exp(a[0]) / (1.0 + jnp.exp(a[0]))
        growth = K * a[1] * jnp.exp(r * dT) / \
            (K + a[1] * (jnp.exp(r * dT) - 1.0))
        return jnp.stack([a[0], growth])

    def R_fn(t, a, th):
        return jnp.diag(jnp.exp(th[1:3]))

    def a1_fn(th):
        return jnp.asarray([a11, a12], th.dtype)

    def P1_fn(th):
        return jnp.diag(jnp.asarray([P11, P12], th.dtype))

    def log_prior(th):
        return jnp.sum(-0.5 * jnp.square(jnp.exp(th) / 2.0) + th)

    return ssm_nlg(y, Z_fn, H_fn, T_fn, R_fn, m=2, k=2,
                   a1_fn=a1_fn, P1_fn=P1_fn,
                   theta_init=(np.log(0.5), np.log(0.05), np.log(1.0)),
                   log_prior=log_prior,
                   theta_names=("log_H", "log_R1", "log_R2"), dtype=dtype)


def simulate_growth(n=100, seed=0, theta=(np.log(1.0), np.log(0.05),
                                          np.log(1.0)),
                    dT=1.0, K=100.0):
    """Simulate data from the growth model (vignette setup)."""
    rng = np.random.default_rng(seed)
    th = np.asarray(theta)
    H, R1, R2 = np.exp(th)
    alpha = np.array([0.0, 5.0])
    ys = np.zeros(n)
    for t in range(n):
        ys[t] = alpha[1] + H * rng.normal()
        r = np.exp(alpha[0]) / (1 + np.exp(alpha[0]))
        g = K * alpha[1] * np.exp(r * dT) / (K + alpha[1] *
                                             (np.exp(r * dT) - 1))
        alpha = np.array([alpha[0] + R1 * rng.normal(),
                          g + R2 * rng.normal()])
    return ys
