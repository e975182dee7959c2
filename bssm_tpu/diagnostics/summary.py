"""Posterior diagnostics: IACT, IS asymptotic variance, ESS, summaries.

Re-implements the reference's diagnostics stack
(`/root/reference/R/asymptotic_var.R`, `/root/reference/src/R_iact.cpp`,
`/root/reference/R/summary.R:45-127`, `/root/reference/R/check_diagnostics.R`)
as vectorised numpy/JAX: these quantities are parity targets (BASELINE.md).

Key quantities for an IS-weighted run (Vihola, Helske & Franks 2020, Cor. 1):
  asymptotic var  = Var(z) IACT(z) / cbar^2 / n,   z = w (x - xbar_w)
  ESS             = Var_w(x) / asymptotic_var
  ESS_IS          = n * (sum w)^2 / sum(w^2) ... weight-degeneracy ESS
"""
from __future__ import annotations

import numpy as np


def iact(x: np.ndarray) -> float:
    """Sokal's adaptive-window integrated autocorrelation time
    (`/root/reference/src/R_iact.cpp:4-15`)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    sd = x.std(ddof=1)
    if sd == 0 or n < 2:
        return 0.0
    xs = (x - x.mean()) / sd
    if n > 2000:
        from ..native import get_lib
        lib = get_lib()
        if lib is not None:
            return float(lib.bssm_iact(np.ascontiguousarray(xs), n))
    C = max(5.0, np.log10(n))
    tau = 1.0
    # vectorised: all lag covariances at once, then the adaptive stop
    for k in range(1, n):
        tau += 2.0 * np.dot(xs[:n - k], xs[k:]) / (n - k)
        if k > C * tau:
            break
    return max(0.0, tau)


def weighted_mean(x, w):
    return np.sum(w * x) / np.sum(w)


def weighted_var(x, w):
    m = weighted_mean(x, w)
    return np.sum(w * (x - m) ** 2) / np.sum(w)


def asymptotic_var(x, w=None) -> float:
    """IS-MCMC asymptotic variance of the weighted mean estimate
    (`/root/reference/R/asymptotic_var.R:85-117`)."""
    x = np.asarray(x, dtype=np.float64)
    w = np.ones_like(x) if w is None else np.asarray(w, dtype=np.float64)
    cbar = w.mean()
    z = w * (x - weighted_mean(x, w))
    return z.var(ddof=1) * iact(z) / cbar ** 2 / len(z)


def estimate_ess(x, w=None) -> float:
    """Effective sample size accounting for autocorrelation and weights
    (`/root/reference/R/asymptotic_var.R:152-171`)."""
    x = np.asarray(x, dtype=np.float64)
    w = np.ones_like(x) if w is None else np.asarray(w, dtype=np.float64)
    av = asymptotic_var(x, w)
    if av <= 0:
        return float(len(x))
    return float(weighted_var(x, w) / av)


def ess_is(w) -> float:
    """Weight-degeneracy ESS: (sum w)^2 / sum w^2."""
    w = np.asarray(w, dtype=np.float64)
    return float(np.sum(w) ** 2 / np.sum(w ** 2))


def rhat(chains: np.ndarray) -> float:
    """Split-chain potential scale reduction factor; chains (C, S)."""
    c = np.asarray(chains, dtype=np.float64)
    if c.ndim == 1:
        c = c[None]
    C, S = c.shape
    half = S // 2
    c = np.concatenate([c[:, :half], c[:, half:2 * half]], axis=0)
    W = c.var(axis=1, ddof=1).mean()
    B = half * c.mean(axis=1).var(ddof=1)
    if W == 0:
        return 1.0
    return float(np.sqrt((half - 1) / half + B / (W * half)))


def summary(output, variable: str = "theta", return_se: bool = False,
            probs=(0.025, 0.5, 0.975)):
    """Weighted posterior summaries, mirroring
    `summary.mcmc_output` (`/root/reference/R/summary.R:45-127`):
    Mean, SE (= sqrt asymptotic var), SD, quantiles, ESS, ESS_IS."""
    w = output.flat_weights()
    rows = []
    if variable == "theta":
        th = output.flat_theta()
        names = output.theta_names
        for j, name in enumerate(names):
            x = th[:, j]
            row = {"variable": name, "Mean": weighted_mean(x, w),
                   "SD": np.sqrt(weighted_var(x, w))}
            for p in probs:
                row[f"{100 * p:g}%"] = _weighted_quantile(x, w, p)
            if return_se:
                row["SE"] = np.sqrt(max(asymptotic_var(x, w), 0.0))
                row["ESS"] = estimate_ess(x, w)
                row["ESS_IS"] = ess_is(w)
            rows.append(row)
    elif variable == "states":
        if output.alpha is None:
            raise ValueError("state summaries need output_type='full'")
        a = output.alpha.reshape((-1,) + output.alpha.shape[2:])
        n1, m = a.shape[1], a.shape[2]
        for t in range(n1):
            for j in range(m):
                x = a[:, t, j]
                row = {"variable": f"state_{j + 1}", "time": t,
                       "Mean": weighted_mean(x, w),
                       "SD": np.sqrt(weighted_var(x, w))}
                if return_se:
                    row["SE"] = np.sqrt(max(asymptotic_var(x, w), 0.0))
                    row["ESS"] = estimate_ess(x, w)
                rows.append(row)
    else:
        raise ValueError(variable)
    return rows


def _weighted_quantile(x, w, p):
    order = np.argsort(x)
    cw = np.cumsum(w[order])
    cw /= cw[-1]
    return float(np.interp(p, cw, x[order]))


def check_diagnostics(output) -> str:
    """Quick-check printout: acceptance rate, ESS, Rhat
    (`/root/reference/R/check_diagnostics.R:44-91`)."""
    lines = []
    if output.time:
        t = sum(v for v in output.time.values())
        lines.append(f"Run time: {t:.2f} s")
    lines.append(f"Acceptance rate after burn-in: "
                 f"{output.acceptance_rate:.3f}")
    th = output.theta
    w = output.flat_weights()
    for j, name in enumerate(output.theta_names):
        x = th[..., j].reshape(-1)
        e = estimate_ess(x, w)
        r = rhat(th[..., j])
        lines.append(f"  {name}: ESS {e:.0f}, Rhat {r:.3f}")
    if output.weights is not None:
        lines.append(f"IS weight ESS: {ess_is(w):.0f} / {len(w)}")
    return "\n".join(lines)
