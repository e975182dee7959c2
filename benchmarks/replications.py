"""Replication harness: Vihola-Helske-Franks (2020) Table-1 style grid.

Python equivalent of `/root/reference/benchmarks/replications.Rmd:27-78`:
runs mcmc_type in {approx, da, is1, is2, is3, pm} x sampling in
{bsf(200), spdk(10), psi(10)} x approximation in {local, global} on the
poisson_series bsm_ng model and reports weighted means, asymptotic-variance
SEs, IACT, times and acceptance rates; the artifact stamps the device.

Usage:  python benchmarks/replications.py [--iter 10000] [--chains 4]
"""
from __future__ import annotations
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iter", type=int, default=10000)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from bssm_tpu.core.priors import uniform_prior
    from bssm_tpu.diagnostics.summary import (asymptotic_var, estimate_ess,
                                              weighted_mean)
    from bssm_tpu.inference.mcmc import run_mcmc
    from bssm_tpu.models.bsm import bsm_ng
    from bssm_tpu.utils.rdata import load_rda

    y = np.asarray(load_rda("/root/reference/data/poisson_series.rda")
                   ["poisson_series"], dtype=float)
    s = np.std(np.log(np.maximum(0.1, y)))
    model = bsm_ng(y, sd_level=uniform_prior(0.115, 0.0, 2 * s),
                   sd_slope=uniform_prior(0.004, 0.0, 2 * s),
                   P1=np.eye(2) * 0.1, distribution="poisson")

    base = [("approx", None, 0),
            ("pm", "psi", 10), ("pm", "spdk", 10), ("pm", "bsf", 200),
            ("da", "psi", 10), ("da", "spdk", 10), ("da", "bsf", 200),
            ("is2", "psi", 10), ("is2", "spdk", 10), ("is2", "bsf", 200),
            ("is1", "psi", 10), ("is3", "psi", 10)]
    # the reference sweeps local vs global approximation too
    # (`/root/reference/benchmarks/replications.Rmd:33-44`); phase 1 of
    # every type (and da/pm stage 1) uses the Laplace approximation, so
    # the dimension applies to all 12 base cells: 24 total
    grid = [(mt, sm, pn, loc) for mt, sm, pn in base
            for loc in (True, False)]

    import jax
    rows = []
    for mcmc_type, sampling, particles, local in grid:
        t0 = time.time()
        try:
            out = run_mcmc(model, iter=args.iter, particles=particles,
                           mcmc_type=mcmc_type, sampling_method=sampling,
                           seed=1, output_type="theta",
                           local_approx=local,
                           n_chains=args.chains)
            elapsed = time.time() - t0
            th = out.flat_theta()
            w = out.flat_weights()
            row = {"mcmc_type": mcmc_type, "sampling": sampling or "-",
                   "particles": particles,
                   "approx": "local" if local else "global",
                   "time_s": round(elapsed, 2),
                   "acceptance": round(out.acceptance_rate, 4)}
            for j, name in enumerate(out.theta_names):
                row[f"mean_{name}"] = round(float(
                    weighted_mean(th[:, j], w)), 5)
                row[f"se_{name}"] = round(float(np.sqrt(max(
                    asymptotic_var(th[:, j], w), 0.0))), 6)
                row[f"ess_{name}"] = round(float(
                    estimate_ess(th[:, j], w)), 1)
            rows.append(row)
            print(json.dumps(row))
        except Exception as e:       # keep the grid running
            print(json.dumps({"mcmc_type": mcmc_type,
                              "sampling": sampling, "error": str(e)[:200]}))

    result = {"device": str(jax.devices()[0]),
              "dtype": str(model.theta_init.dtype),
              "iter": args.iter, "chains": args.chains, "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
