"""Prior system: packed, vectorised prior stacks evaluated inside `jit`.

Re-design of the reference's dual representation — R `bssm_prior` objects
(`/root/reference/R/priors.R`) packed into (distribution, parameter-matrix)
arrays evaluated in C++ (`/root/reference/src/model_bsm_lg.cpp:81-126`).
Here a `PriorStack` is a small PyTree: integer codes + a (4, d) parameter
matrix + a transform code per parameter, so `log_pdf(theta)` is a pure,
branch-free function usable inside MCMC kernels.

Densities are unnormalised exactly as in the reference (constants don't
affect sampling):
  uniform(min, max):        0 inside, -inf outside
  halfnormal(sd):           -x^2/(2 sd^2) for x >= 0
  normal(mean, sd):         -(x-mean)^2/(2 sd^2)
  tnormal(mean, sd, lo, hi) normal inside [lo, hi], -inf outside
  gamma(shape, rate):       (shape-1) log x - rate x for x >= 0

Transforms (for the fixed-form models whose sd-like parameters are sampled
on the log scale, `/root/reference/R/run_mcmc.R:213-223`):
  code 0: identity; code 1: theta = log(x) — prior evaluated at exp(theta)
  with log-Jacobian theta added (`/root/reference/src/model_bsm_lg.cpp:85-90`).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

UNIFORM, HALFNORMAL, NORMAL, TNORMAL, GAMMA_P = 0, 1, 2, 3, 4
IDENTITY, LOG = 0, 1


class Prior(NamedTuple):
    dist: int
    params: tuple      # up to 4 floats
    init: float


def _mk(dist, params, init):
    init = np.atleast_1d(np.asarray(init, dtype=np.float64))
    out = []
    for i, x0 in enumerate(init):
        ps = tuple(float(np.broadcast_to(p, init.shape)[i]) for p in params)
        out.append(Prior(dist, ps, float(x0)))
    return out if len(out) > 1 else out[0]


def uniform_prior(init, min, max):
    return _mk(UNIFORM, (min, max, 0.0, 0.0), init)


def halfnormal_prior(init, sd):
    return _mk(HALFNORMAL, (sd, 0.0, 0.0, 0.0), init)


def normal_prior(init, mean, sd):
    return _mk(NORMAL, (mean, sd, 0.0, 0.0), init)


def tnormal_prior(init, mean, sd, min=-np.inf, max=np.inf):
    return _mk(TNORMAL, (mean, sd, min, max), init)


def gamma_prior(init, shape, rate):
    return _mk(GAMMA_P, (shape, rate, 0.0, 0.0), init)


class PriorStack(NamedTuple):
    """Packed priors for a d-dimensional theta."""
    dists: np.ndarray       # (d,) int — static (numpy, hashable via tuple)
    params: jnp.ndarray     # (4, d)
    transforms: np.ndarray  # (d,) int — static

    @staticmethod
    def from_priors(priors: Sequence[Prior], transforms=None) -> "PriorStack":
        flat = []
        for p in priors:
            flat.extend(p if isinstance(p, list) else [p])
        d = len(flat)
        dists = np.array([p.dist for p in flat], dtype=np.int32)
        params = np.zeros((4, d))
        for i, p in enumerate(flat):
            params[:len(p.params), i] = p.params
        tr = np.zeros(d, dtype=np.int32) if transforms is None \
            else np.asarray(transforms, dtype=np.int32)
        return PriorStack(dists, jnp.asarray(params), tr)

    @property
    def d(self) -> int:
        return len(self.dists)

    def theta_init(self, flat_priors: Sequence[Prior]) -> np.ndarray:
        raise NotImplementedError

    def log_pdf(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Joint log prior density of theta (sampled space), incl. Jacobian."""
        tr = jnp.asarray(self.transforms)
        x = jnp.where(tr == LOG, jnp.exp(theta), theta)
        jac = jnp.where(tr == LOG, theta, 0.0)

        p0, p1, p2, p3 = (self.params[i] for i in range(4))
        dd = jnp.asarray(self.dists)

        lp_unif = jnp.where((x < p0) | (x > p1), -jnp.inf, 0.0)
        lp_hn = jnp.where(x < 0, -jnp.inf, -0.5 * jnp.square(x / p0))
        lp_n = -0.5 * jnp.square((x - p0) / jnp.where(p1 > 0, p1, 1.0))
        lp_tn = jnp.where((x < p2) | (x > p3), -jnp.inf,
                          -0.5 * jnp.square((x - p0) / jnp.where(p1 > 0, p1, 1.0)))
        xs = jnp.maximum(x, jnp.finfo(theta.dtype).tiny)
        lp_g = jnp.where(x < 0, -jnp.inf, (p0 - 1.0) * jnp.log(xs) - p1 * x)

        lp = jnp.select(
            [dd == UNIFORM, dd == HALFNORMAL, dd == NORMAL,
             dd == TNORMAL, dd == GAMMA_P],
            [lp_unif, lp_hn, lp_n, lp_tn, lp_g], default=0.0)
        return jnp.sum(lp + jac)

    def init_theta(self, inits: Sequence[float]) -> jnp.ndarray:
        """Map natural-space initial values into the sampled space."""
        x = np.asarray(inits, dtype=np.float64)
        out = np.where(self.transforms == LOG,
                       np.log(np.maximum(x, 1e-300)), x)
        return jnp.asarray(out)
