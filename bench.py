"""Benchmark: IS-MCMC (bsm_ng Poisson, psi-APF) samples/s/chip + ESS/s.

Baseline (BASELINE.md): the reference runs 20k IS2 iterations with 10
psi-APF particles on the airquality bsm_ng in 7.71 s single-thread CPU
=> 2594 samples/s.  Here the same statistical workload (n=153-length
series, psi-APF correction, RAM adaptive chains) runs as vmapped chains on
one TPU chip — phase 1 through the fused chains-in-lanes Laplace/Kalman
Pallas kernel, phase 2 (one psi-APF correction per jump-chain head)
through the fused RTS-factor + psi-filter kernels.

Five workloads (BASELINE.json metric: "samples/s/chip (IS-MCMC, bsm_ng
psi-APF N=256); ESS/s"):
  - psi_N10: the reference README config (its own headline number);
  - psi_N256 (+ reference-exact variant): the BASELINE flagship particle
    count through the large-N kernel;
  - pm_bsf_N200: the reference Table-1 bootstrap config as pm-MCMC;
  - gamma_airquality_N10: the exact 7.71 s baseline-anchor model,
    like-for-like.
IS rows report samples/s and ESS_IS (weight-degeneracy effective-sample
fraction — raw samples/s would reward a badly-weighted chain;
`diagnostics/summary.ess_is`); the pm row reports acceptance.

Prints ONE JSON line.  `device`/`tpu` fields state where it ran; a CPU
fallback is a FAILED artifact for perf purposes (the probe found the axon
tunnel down) and exits with code 3 so the driver records the failure —
the JSON is still printed, labeled `"tpu": false`, as a smoke signal that
the code path itself works.
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
    can't hang the bench itself).  The axon tunnel flaps — sometimes for
    minutes — so retry; worst case this holds the bench for
    attempts x (timeout_s + 45 s sleep) ~= 19 minutes before falling back
    to CPU, which is deliberate: a CPU artifact is a failed artifact, so
    waiting longer for the tunnel is the better trade."""
    code = ("import jax, jax.numpy as jnp;"
            "assert jax.devices()[0].platform != 'cpu';"
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


def _run_workload(model, jax, n_chains, iters, particles, corr_batch,
                  label, resample_every=1, sampling_method="psi"):
    from bssm_tpu.diagnostics.summary import ess_is
    from bssm_tpu.inference.mcmc import run_mcmc

    def run(seed):
        return run_mcmc(model, iter=iters, particles=particles,
                        mcmc_type="is2", n_chains=n_chains, seed=seed,
                        sampling_method=sampling_method,
                        output_type="theta", corr_batch=corr_batch,
                        store_modes=False,
                        psi_resample_every=resample_every)

    # the tunnel to the device occasionally drops mid-run; retry a few
    # times (compiles are persistent-cached, so retries are cheap)
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

    total = n_chains * iters
    w = out.flat_weights()
    eif = float(ess_is(w)) / w.size
    return {
        "label": label, "chains": n_chains, "iters": iters,
        "particles": particles, "resample_every": resample_every,
        "samples_per_s": round(total / elapsed, 1),
        "ess_is_per_s": round(eif * total / elapsed, 1),
        "ess_is_frac": round(eif, 4),
        "elapsed_s": round(elapsed, 3),
        "finite": bool(np.all(np.isfinite(out.posterior))),
        "kernel_tier": ("fused-pallas" if particles <= 32
                        else "fused-pallas-bigN" if particles <= 512
                        else "scan"),
    }


def _run_pm_bsf(model, jax, n_chains, iters, particles, label):
    from bssm_tpu.inference.mcmc import run_mcmc

    def run(seed):
        return run_mcmc(model, iter=iters, particles=particles,
                        mcmc_type="pm", sampling_method="bsf",
                        n_chains=n_chains, seed=seed, output_type="theta")

    out = None
    for attempt in range(3):
        try:
            run(0)
            t0 = time.time()
            out = run(1)
            elapsed = time.time() - t0
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(30)
    total = n_chains * iters
    return {
        "label": label, "chains": n_chains, "iters": iters,
        "particles": particles,
        "samples_per_s": round(total / elapsed, 1),
        "acceptance": round(float(out.acceptance_rate), 3),
        "elapsed_s": round(elapsed, 3),
        "finite": bool(np.all(np.isfinite(out.posterior))),
        "kernel_tier": "fused-pallas-bigN",
    }


def main():
    force = os.environ.get("BSSM_BENCH_FORCE")
    if force == "tpu":
        on_tpu = True        # trust the accelerator, retries handle flaps
    elif force == "cpu":
        on_tpu = False
    else:
        on_tpu = _probe_device()
    if not on_tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from bssm_tpu.core.priors import halfnormal_prior
    from bssm_tpu.models.bsm import bsm_ng

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
    tpu = not on_cpu
    # 4096 chains is the measured single-chip throughput sweet spot
    # (SCALING_r04.json: 1.93M samples/s vs 1.65M at 2048)
    chains = int(os.environ.get("BSSM_BENCH_CHAINS",
                                "128" if on_cpu else "4096"))
    iters = 1000

    # corr_batch trades host->device dispatch count (the axon tunnel costs
    # ~25 ms per chunk call, measured r5) against single-execution length
    # (must stay seconds-bounded for the tunnel's RPC deadline): 16384
    # rows/chunk is the measured sweet spot
    w10 = _run_workload(model, jax, chains, iters, 10, 16384, "psi_N10")
    # BASELINE flagship particle count through the particles-in-sublanes
    # big-N Pallas kernel (in-kernel PRNG).  Two rows: reference-exact
    # every-step resampling, and the period-8 schedule (unbiased for any
    # fixed schedule; ESS_IS reported as evidence)
    w256 = _run_workload(model, jax, chains, iters, 256, 16384,
                         "psi_N256", resample_every=8)
    w256x = _run_workload(model, jax, max(chains // 4, 8), iters, 256,
                          16384, "psi_N256_refexact", resample_every=1)

    # BSF with 200 particles (the reference Table-1 bootstrap config,
    # `/root/reference/benchmarks/replications.Rmd:27-78`) through the
    # large-N kernel's bsf mode, as pseudo-marginal MCMC — BSF's natural
    # role.  A calmer series than the flagship: BSF needs sd(log-lik)
    # ~<= 1.5 for pm to mix (the flagship's drift gives sd ~2+ at N=200,
    # which is a property of the estimator, not the kernel).
    yb = rng.poisson(np.exp(np.cumsum(rng.normal(0, 0.03, n)) + 1.0)
                     ).astype(float)
    bmodel = bsm_ng(yb, sd_level=halfnormal_prior(0.05, 0.5),
                    distribution="poisson", dtype=jnp.float32)
    wb = _run_pm_bsf(bmodel, jax, max(chains // 4, 8), 500, 200,
                     "pm_bsf_N200")

    # the reference's own 7.71 s anchor is the GAMMA airquality model
    # (`/root/reference/README.md:226-228`) — measure it like-for-like
    from bssm_tpu.core.priors import gamma_prior, normal_prior
    from bssm_tpu.utils.datasets import airquality
    aq = airquality()
    xreg = np.column_stack([aq["Wind"], aq["Temp"]])
    gmodel = bsm_ng(aq["Ozone"], xreg=xreg,
                    beta=normal_prior(np.zeros(2), 0.0, 1.0),
                    distribution="gamma",
                    phi=gamma_prior(1.0, 2.0, 0.01),
                    sd_level=gamma_prior(1.0, 2.0, 0.1),
                    sd_slope=gamma_prior(1.0, 2.0, 0.1),
                    dtype=jnp.float32)
    wg = _run_workload(gmodel, jax, chains, iters, 10, 16384,
                       "gamma_airquality_N10")

    result = {
        "metric": "samples_per_s_per_chip_is_mcmc_bsm_ng_psi",
        "value": w10["samples_per_s"],
        "unit": "samples/s/chip",
        "vs_baseline": round(w10["samples_per_s"] / BASELINE_SAMPLES_PER_S,
                             2),
        "vs_baseline_gamma_like_for_like": round(
            wg["samples_per_s"] / BASELINE_SAMPLES_PER_S, 2),
        "psi_N256_samples_per_s": w256["samples_per_s"],
        "device": str(jax.devices()[0]),
        "tpu": tpu,
        "ess_is_per_s": w10["ess_is_per_s"],
        "finite": all(w["finite"] for w in (w10, w256, w256x, wb, wg)),
        "workloads": [w10, w256, w256x, wb, wg],
    }
    print(json.dumps(result))
    if not tpu:
        # CPU fallback = failed perf artifact (VERDICT r03): exit nonzero
        # so the driver records the miss rather than a misleading number
        sys.exit(3)


if __name__ == "__main__":
    main()
