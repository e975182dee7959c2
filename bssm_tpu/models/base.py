"""Model objects: a pure ``build(theta) -> spec`` plus prior machinery.

The reference couples model structure and parameters in mutable classes with
virtual ``update_model`` (`/root/reference/src/model_bsm_lg.cpp:24-79` etc.).
Here a *model* is a lightweight Python container holding
  - ``build``:     pure jittable function theta -> spec PyTree,
  - ``log_prior``: pure jittable function theta -> scalar (sampled space,
                   Jacobians of the log transforms included),
  - ``theta_init``: initial theta in the sampled space,
plus metadata (names, transform codes) used when reporting results in the
natural parameter space (`/root/reference/R/run_mcmc.R:213-223,255-261`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.priors import LOG, PriorStack


@dataclasses.dataclass(frozen=True)
class Model:
    build: Callable[[jnp.ndarray], Any]
    log_prior: Callable[[jnp.ndarray], jnp.ndarray]
    theta_init: jnp.ndarray
    theta_names: Tuple[str, ...]
    transforms: np.ndarray            # per-theta transform code (0 id, 1 log)
    kind: str                         # 'lg' | 'ng' | 'mlg' | 'mng' | 'nlg' | 'sde'
    extra: dict = dataclasses.field(default_factory=dict)

    @property
    def n_par(self) -> int:
        return int(self.theta_init.shape[0])

    def to_natural(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Map sampled-space draws back to the natural space (exp of logged
        entries), vectorised over leading axes."""
        tr = jnp.asarray(self.transforms)
        return jnp.where(tr == LOG, jnp.exp(theta), theta)

    def initial_S(self) -> jnp.ndarray:
        """Reference default RAM scale: diag(0.1 max(0.1, |theta|))
        (`/root/reference/R/run_mcmc.R:225-227`)."""
        t = np.asarray(self.theta_init)
        return jnp.asarray(np.diag(0.1 * np.maximum(0.1, np.abs(t))))


def _is_prior(x) -> bool:
    from ..core.priors import Prior
    return isinstance(x, Prior) or (
        isinstance(x, list) and len(x) > 0 and isinstance(x[0], Prior))


def collect_priors(named: Sequence[Tuple[str, Any, int]]):
    """From [(name, prior_or_fixed_or_None, transform_code)] build the packed
    stack, theta_init and names; fixed/None entries are skipped."""
    flat, names, trs = [], [], []
    for name, p, tr in named:
        if p is None or not _is_prior(p):
            continue
        ps = p if isinstance(p, list) else [p]
        for i, pr in enumerate(ps):
            flat.append(pr)
            names.append(name if len(ps) == 1 else f"{name}_{i + 1}")
            trs.append(tr)
    stack = PriorStack.from_priors(flat, trs)
    inits = [pr.init for pr in flat]
    return stack, stack.init_theta(inits), tuple(names)


def init_mode(y: np.ndarray, u: np.ndarray, distribution: int) -> np.ndarray:
    """Link-scale starting signal for the Laplace iteration
    (`/root/reference/R/init_mode.R:3-31`)."""
    from ..core.spec import BINOMIAL, GAMMA, NEGBIN, POISSON, SVM
    y = np.asarray(y, dtype=np.float64)
    u = np.asarray(u, dtype=np.float64)
    if distribution == POISSON:
        r = y / u
        r = np.where(np.isnan(r) | (r < 0.1), 0.1, r)
        return np.log(r)
    if distribution == BINOMIAL:
        r = (np.where(np.isnan(y), 0.5, y) + 0.5) / (u + 1.0)
        return np.log(r / (1.0 - r))
    if distribution == GAMMA:
        r = y / u
        r = np.where(np.isnan(r) | (r < 1.0), 1.0, r)
        return np.log(r)
    if distribution == NEGBIN:
        r = y / u
        r = np.where(np.isnan(r) | (r < 1.0 / 6.0), 1.0 / 6.0, r)
        return np.log(r)
    if distribution == SVM:
        # log(pmax(1e-4, y^2)), `/root/reference/R/models.R:1196`
        r = np.where(np.isnan(y), 1e-4, np.maximum(1e-4, y * y))
        return np.log(r)
    return y.copy()
