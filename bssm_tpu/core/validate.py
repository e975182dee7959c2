"""Argument validation with friendly errors.

Python equivalent of `/root/reference/R/check_arguments.R` (20+ checkers):
called by the model constructors; raises ValueError/TypeError with messages
mirroring the reference's semantics (NA allowed only in y; dimension rules
for Z/H/T/R/a1/P1/D/C; positivity of u/phi; rho in (-1, 1); etc.).
"""
from __future__ import annotations

import numpy as np


def check_y(y, multivariate=False, distribution=None):
    y = np.asarray(y, dtype=np.float64)
    if multivariate:
        if y.ndim != 2:
            raise ValueError("Argument 'y' must be a 2d array (n, p) for "
                             "multivariate models.")
    else:
        if y.ndim != 1:
            raise ValueError("Argument 'y' must be a 1d array.")
    if y.shape[0] < 2:
        raise ValueError("Length of argument 'y' must be at least 2.")
    if np.isinf(y).any():
        raise ValueError("Argument 'y' must contain only finite values "
                         "or NA (NaN).")
    if distribution is not None and distribution in (
            "poisson", "binomial", "negative binomial"):
        obs = y[np.isfinite(y)]
        if (obs < 0).any() or (np.abs(obs - np.round(obs)) > 1e-8).any():
            raise ValueError(f"Negative or non-integer values of 'y' not "
                             f"allowed for {distribution} distribution.")
    if distribution == "gamma":
        obs = y[np.isfinite(y)]
        if (obs < 0).any():
            raise ValueError("Negative values of 'y' not allowed for "
                             "gamma distribution.")
    return y


def check_u(u, y):
    u = np.broadcast_to(np.asarray(u, dtype=np.float64),
                        np.asarray(y).shape).copy()
    if (~np.isfinite(u)).any() or (u <= 0).any():
        raise ValueError("Argument 'u' must contain only positive finite "
                         "values.")
    return u


def check_sd(x, name):
    if not np.isscalar(x) and np.asarray(x).size != 1:
        raise ValueError(f"Argument 'sd_{name}' must be a scalar or prior.")
    if float(np.asarray(x).reshape(())) < 0:
        raise ValueError(f"Standard deviation parameter 'sd_{name}' must "
                         "be non-negative.")


def check_phi(x):
    if float(x) <= 0:
        raise ValueError("Parameter 'phi' must be positive.")


def check_rho(x):
    if not (-1.0 < float(x) < 1.0):
        raise ValueError("Parameter 'rho' must be strictly between -1 "
                         "and 1.")


def check_prop(x, name="target_acceptance"):
    if not (0.0 < float(x) < 1.0):
        raise ValueError(f"Argument '{name}' must be on the open interval "
                         "(0, 1).")


def check_positive_int(x, name):
    if int(x) != x or x <= 0:
        raise ValueError(f"Argument '{name}' must be a positive integer.")


def check_matrix(x, name, shape):
    x = np.asarray(x, dtype=np.float64)
    if x.shape != tuple(shape):
        raise ValueError(f"Argument '{name}' must have shape {shape}, "
                         f"got {x.shape}.")
    if not np.isfinite(x).all():
        raise ValueError(f"Argument '{name}' must contain only finite "
                         "values.")
    return x


def check_period(period, n):
    if period is None:
        raise ValueError("period required with a seasonal component")
    if int(period) < 3:
        raise ValueError("Argument 'period' must be at least 3.")
    if int(period) >= n:
        raise ValueError("Argument 'period' must be shorter than the "
                         "series.")
    return int(period)
