import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, json
import numpy as np
"""Single-config TPU probe: run the flagship IS-MCMC workload at a given
chain count and print phase timings.  Usage: python benchmarks/probe_chains.py [chains]."""
import jax
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parents[1] / ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
from bssm_tpu.core.priors import halfnormal_prior
from bssm_tpu.models.bsm import bsm_ng
from bssm_tpu.inference.mcmc import run_mcmc

rng = np.random.default_rng(1)
n = 153
slope = np.cumsum(rng.normal(0, 0.01, n))
level = np.cumsum(slope + rng.normal(0, 0.1, n)) + 2.0
y = rng.poisson(np.exp(0.5 * level / np.abs(level).max() + 1.0))
model = bsm_ng(y.astype(float), sd_level=halfnormal_prior(0.1, 1.0),
               sd_slope=halfnormal_prior(0.01, 0.1),
               distribution="poisson", dtype=jnp.float32)

import sys
n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 128
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
corr_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
def run(seed):
    return run_mcmc(model, iter=iters, particles=10,
                    mcmc_type="is2", n_chains=n_chains, seed=seed,
                    output_type="theta", corr_batch=corr_batch,
                    store_modes=False)
t0=time.time(); out = run(0); t_warm = time.time()-t0
t0=time.time(); out = run(1); t_run = time.time()-t0
print(json.dumps({"chains": n_chains, "warm_s": round(t_warm,2), "run_s": round(t_run,2),
                  "sps": round(n_chains*iters/t_run,1), "time": {k: round(v,2) for k,v in out.time.items()},
                  "device": str(jax.devices()[0]), "finite": bool(np.isfinite(out.posterior).all())}))
