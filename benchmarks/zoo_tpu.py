"""Model-zoo TPU smoke: run one short MCMC per model family on the real
device and record wall time + finiteness + acceptance.

Evidence that every family (lg, ng, svm, mlg, mng, nlg, sde) executes on
TPU silicon in f32 — the statistical parity suite runs on CPU x64, and
the flagship bench only exercises bsm_ng, so this fills the hardware
coverage gap.  Writes ZOO_r0N.json when --out is given.

Usage: python benchmarks/zoo_tpu.py [--out ZOO_r04.json]
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
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--iter", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bssm_tpu.core.priors import (gamma_prior, halfnormal_prior,
                                      normal_prior, uniform_prior)
    from bssm_tpu.inference.mcmc import run_mcmc
    from bssm_tpu.models.ar1 import ar1_ng
    from bssm_tpu.models.bsm import bsm_lg, bsm_ng
    from bssm_tpu.models.examples import nlg_growth
    from bssm_tpu.models.sde import sde_gbm
    from bssm_tpu.models.ssm import ssm_mng
    from bssm_tpu.models.svm import svm
    from bssm_tpu.utils.datasets import airquality

    dt = jnp.float32
    rng = np.random.default_rng(7)
    rows = []

    def bench(name, model, **kw):
        t0 = time.time()
        out = run_mcmc(model, iter=args.iter, n_chains=args.chains,
                       seed=3, output_type="theta", **kw)
        el = time.time() - t0
        row = {"model": name, "elapsed_s": round(el, 2),
               "chains": args.chains, "iter": args.iter,
               "acceptance": round(float(out.acceptance_rate), 3),
               "finite": bool(np.all(np.isfinite(out.posterior))),
               "theta_mean": [round(float(v), 4)
                              for v in np.mean(out.flat_theta(), axis=0)]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    aq = airquality()
    xreg = np.column_stack([aq["Wind"], aq["Temp"]])
    bench("bsm_lg(airquality)", bsm_lg(
        aq["Ozone"], xreg=xreg, beta=normal_prior(np.zeros(2), 0.0, 1.0),
        sd_y=gamma_prior(1.0, 2.0, 0.01), sd_level=gamma_prior(1.0, 2.0, 0.01),
        sd_slope=gamma_prior(1.0, 2.0, 0.01), dtype=dt))

    y = rng.poisson(np.exp(np.cumsum(rng.normal(0, .1, 100)))).astype(float)
    bench("bsm_ng(poisson,is2)", bsm_ng(
        y, sd_level=halfnormal_prior(0.1, 1.0),
        sd_slope=halfnormal_prior(0.01, 0.1), distribution="poisson",
        dtype=dt), particles=10, mcmc_type="is2")

    bench("ar1_ng(negbin,pm)", ar1_ng(
        y, rho=uniform_prior(0.8, -0.999, 0.999),
        sigma=halfnormal_prior(0.3, 1.0), mu=normal_prior(1.0, 0.0, 2.0),
        phi=halfnormal_prior(2.0, 5.0),
        distribution="negative binomial", dtype=dt),
        particles=10, mcmc_type="pm")

    ysv = rng.normal(0, 1, 200) * np.exp(0.3 * np.sin(np.arange(200) / 9))
    bench("svm(is2)", svm(ysv, rho=uniform_prior(0.95, -0.999, 0.999),
                          sd_ar=halfnormal_prior(0.2, 2.0),
                          sigma=halfnormal_prior(0.8, 2.0), dtype=dt),
          particles=10, mcmc_type="is2")

    y2 = np.column_stack([rng.poisson(np.exp(np.cumsum(
        rng.normal(0, .1, 80)))), rng.normal(0, 1, 80).cumsum()])
    bench("ssm_mng(pois+gauss,da)", ssm_mng(
        y2.astype(float), Z=np.eye(2), T=0.95 * np.eye(2),
        R=0.2 * np.eye(2), distributions=["poisson", "gaussian"],
        phi=np.array([1.0, 1.0]), P1=np.eye(2),
        init_theta=(0.0,), update_fn=lambda th: {},
        dtype=dt), particles=10, mcmc_type="da")

    yg = 20.0 + np.cumsum(rng.normal(0.4, 1.0, 60))
    bench("nlg_growth(pm)", nlg_growth(yg, dtype=dt),
          particles=10, mcmc_type="pm")

    ysde = rng.poisson(np.exp(np.cumsum(rng.normal(0.02, 0.15, 40)))
                       ).astype(float)
    bench("sde_gbm(is2)", sde_gbm(ysde, x0=max(float(ysde[0]), 1.0),
                                  L_f=4, L_c=2, dtype=dt),
          particles=16, mcmc_type="is2")

    result = {"round": 4, "device": str(jax.devices()[0]),
              "dtype": "float32", "rows": rows,
              "all_finite": all(r["finite"] for r in rows)}
    print(json.dumps({"all_finite": result["all_finite"],
                      "device": result["device"]}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
