"""Worker for the 2-process jax.distributed CPU test.

Each process owns 4 virtual CPU devices (8 global), initialises the
coordinator via `bssm_tpu.parallel.distributed.initialize`, builds the
global chains mesh, and runs the two production sharded programs:

- phase-1 gaussian RAM chains (vmapped `_gaussian_chain`, chain keys
  sharded over the global "chains" axis);
- phase-2 psi-APF IS correction (`shard_map`-wrapped vmapped `psi_logw`,
  draws sharded over the same axis — the `_is_correction_flat` mesh
  program).

Every process also computes the UNSHARDED single-process reference on its
local devices and asserts its addressable shards of the global results
match — sharding across process boundaries must be placement-only.

Run by tests/test_parallel.py::test_two_process_distributed; exits 0 on
success (prints OK), nonzero on any mismatch.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax                                                      # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np                                              # noqa: E402
import jax.numpy as jnp                                         # noqa: E402


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    from bssm_tpu.parallel.distributed import (global_mesh, initialize,
                                               local_chain_slice)
    assert initialize(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=pid) is True
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    assert local_chain_slice(8) == slice(4 * pid, 4 * (pid + 1))

    mesh = global_mesh(("chains",))
    assert dict(mesh.shape) == {"chains": 8}
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("chains"))

    def globalize(host_np):
        a = jnp.asarray(host_np)
        return jax.make_array_from_callback(
            a.shape, sh, lambda idx: np.asarray(a[idx]))

    def check_shards(tag, global_arr, ref_np, atol):
        for s in global_arr.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(s.data), ref_np[s.index], atol=atol, rtol=1e-6,
                err_msg=f"{tag} shard {s.index} (process {pid})")

    # ---- model (identical on both processes) ----
    from bssm_tpu.core.priors import gamma_prior, halfnormal_prior
    from bssm_tpu.models.bsm import bsm_lg, bsm_ng
    rng = np.random.default_rng(0)
    y = rng.normal(2.0, 1.0, 24).cumsum()
    lg = bsm_lg(y, sd_y=gamma_prior(1.0, 2.0, 0.1),
                sd_level=gamma_prior(1.0, 2.0, 0.1))
    yp = rng.poisson(np.exp(0.3 * np.cumsum(rng.normal(0, .2, 20)))
                     ).astype(float)
    ng = bsm_ng(yp, sd_level=halfnormal_prior(0.1, 1.0),
                distribution="poisson")

    # ---- sharded gaussian RAM chains ----
    from bssm_tpu.inference.mcmc import _gaussian_chain
    chain = _gaussian_chain(lg, output_type="theta", n_iter=40, burnin=20,
                            thin=1, target=0.234, gamma=2.0 / 3.0,
                            end_ram=False)
    keys_np = np.asarray(jax.random.split(jax.random.PRNGKey(7), 8))
    theta0, S0 = lg.theta_init, lg.initial_S()
    run = jax.jit(jax.vmap(chain, in_axes=(0, None, None)))
    res = run(globalize(keys_np), theta0, S0)
    ref = jax.jit(jax.vmap(chain, in_axes=(0, None, None)))(
        jnp.asarray(keys_np), theta0, S0)
    check_shards("gaussian.theta", res["theta"], np.asarray(ref["theta"]),
                 1e-9)
    check_shards("gaussian.posterior", res["posterior"],
                 np.asarray(ref["posterior"]), 1e-7)

    # ---- sharded is2 psi correction (the _is_correction_flat program) ----
    from bssm_tpu.inference import approx as amod, particle as pf
    spec = ng.build(ng.theta_init)
    al0 = amod.approx_loglik(spec)
    al = amod.ApproxLoglik(al0.approx, al0.scales,
                           jnp.zeros((), spec.y.dtype),
                           jnp.zeros((), spec.y.dtype))

    def one(k):
        return pf.psi_logw(spec, al, 8, k)

    corr = jax.jit(jax.shard_map(jax.vmap(one), mesh=mesh, in_specs=P("chains"),
                                 out_specs=P("chains"), check_vma=False))
    ck_np = np.asarray(jax.random.split(jax.random.PRNGKey(11), 8))
    logw = corr(globalize(ck_np))
    logw_ref = jax.jit(jax.vmap(one))(jnp.asarray(ck_np))
    check_shards("is2.logw", logw, np.asarray(logw_ref), 1e-7)

    print(f"OK process {pid}", flush=True)


if __name__ == "__main__":
    main()
