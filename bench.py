"""Benchmark: IS-MCMC (bsm_ng Poisson, psi-APF) samples/s/chip.

Baseline (BASELINE.md): the reference runs 20k IS2 iterations with 10
psi-APF particles on the airquality bsm_ng in 7.71 s single-thread CPU
=> 2594 samples/s.  Here the same statistical workload (n=153-length series,
10-particle psi-APF correction, RAM adaptive chains) runs as vmapped chains
on one TPU chip — phase 1 through the fused chains-in-lanes Laplace/Kalman
Pallas kernel, phase 2 (one psi-APF correction per jump-chain head) through
the fused RTS-factor + psi-filter kernels.  samples/s = chains * iters /
wall-time (post-compile; the persistent XLA cache under .xla_cache makes
re-runs skip compilation entirely).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_S = 20000 / 7.71
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".xla_cache")


def _probe_device(timeout_s: int = 150, attempts: int = 6) -> bool:
    """Check the accelerator responds (in a subprocess, so a hung tunnel
    can't hang the bench itself); the axon tunnel flaps — sometimes for
    minutes — so retry over a ~7-minute window before falling back to
    CPU."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    for i in range(attempts):
        try:
            subprocess.run([sys.executable, "-c", code], check=True,
                           capture_output=True, timeout=timeout_s)
            return True
        except Exception:
            if i + 1 < attempts:
                time.sleep(45)
    return False


def main():
    if os.environ.get("BSSM_BENCH_FORCE") == "tpu":
        pass                       # trust the accelerator, retries handle flaps
    elif not _probe_device():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from bssm_tpu.core.priors import halfnormal_prior
    from bssm_tpu.models.bsm import bsm_ng
    from bssm_tpu.inference.mcmc import run_mcmc

    # airquality-scale workload: n = 153, level+slope BSM, Poisson obs
    rng = np.random.default_rng(1)
    n = 153
    slope = np.cumsum(rng.normal(0, 0.01, n))
    level = np.cumsum(slope + rng.normal(0, 0.1, n)) + 2.0
    y = rng.poisson(np.exp(0.5 * level / np.abs(level).max() + 1.0))
    model = bsm_ng(y.astype(float), sd_level=halfnormal_prior(0.1, 1.0),
                   sd_slope=halfnormal_prior(0.01, 0.1),
                   distribution="poisson", dtype=jnp.float32)

    on_cpu = jax.default_backend() == "cpu"
    n_chains = int(os.environ.get("BSSM_BENCH_CHAINS",
                                  "128" if on_cpu else "2048"))
    iters = 1000
    particles = 10

    def run(seed):
        return run_mcmc(model, iter=iters, particles=particles,
                        mcmc_type="is2", n_chains=n_chains, seed=seed,
                        output_type="theta", corr_batch=2048,
                        store_modes=False)

    # the tunnel to the device occasionally drops mid-run; retry a few times
    out = None
    for attempt in range(3):
        try:
            run(0)              # compile warm-up (persistent-cached)
            t0 = time.time()
            out = run(1)
            elapsed = time.time() - t0
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(30)

    total_samples = n_chains * iters
    sps = total_samples / elapsed
    # sanity: finite posteriors and IS weights
    ok = bool(np.all(np.isfinite(out.posterior)))
    result = {
        "metric": "samples_per_s_per_chip_is_mcmc_bsm_ng_psi",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_S, 2),
        "chains": n_chains, "iters": iters, "particles": particles,
        "elapsed_s": round(elapsed, 2), "finite": ok,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
