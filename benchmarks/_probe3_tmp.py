import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, json
import numpy as np
import jax, jax.numpy as jnp
from bssm_tpu.core.priors import halfnormal_prior
from bssm_tpu.models.bsm import bsm_ng
from bssm_tpu.inference import approx as amod
from bssm_tpu.ops.pallas_kalman import fused_psi_logw_batched

rng = np.random.default_rng(1)
n = 153
y = rng.poisson(np.exp(np.cumsum(rng.normal(0, .1, n)) * 0.3 + 1.0)).astype(float)
model = bsm_ng(y, sd_level=halfnormal_prior(0.1, 1.0),
               sd_slope=halfnormal_prior(0.01, 0.1),
               distribution="poisson", dtype=jnp.float32)
B, N = 2048, 10
thetas = jnp.asarray(rng.normal(-2.5, .1, (B, 2)), jnp.float32)


def make_al(theta):
    spec = model.build(theta)
    al = amod.approx_loglik(spec)
    z = jnp.zeros((), jnp.float32)
    return spec, amod.ApproxLoglik(al.approx, al.scales, z, z)


print("building inputs...", flush=True)
specs, als = jax.jit(jax.vmap(make_al))(thetas)
jax.block_until_ready(specs.y)
eps = jax.random.normal(jax.random.PRNGKey(1), (B, n + 1, N, 2), jnp.float32)
us = jax.random.uniform(jax.random.PRNGKey(2), (B, n, N), jnp.float32)
print("compiling psi kernel...", flush=True)
t0 = time.time()
out = fused_psi_logw_batched(specs, als, eps, us, B)
out.block_until_ready()
t_compile = time.time() - t0
t0 = time.time()
out = fused_psi_logw_batched(specs, als, eps, us, B)
out.block_until_ready()
t_run = time.time() - t0
print(json.dumps({"B": B, "compile_s": round(t_compile, 1),
                  "run_s": round(t_run, 4),
                  "finite": bool(np.isfinite(np.asarray(out)).all())}))
