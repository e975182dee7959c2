import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, json
import numpy as np
import jax, jax.numpy as jnp
from bssm_tpu.core.priors import halfnormal_prior
from bssm_tpu.models.bsm import bsm_ng
from bssm_tpu.inference import approx as approx_mod
from bssm_tpu.inference import particle as pf_mod
from bssm_tpu.ops.kalman import smoother as kalman_smoother
from bssm_tpu.ops.chol import conditional_cov_factors

rng = np.random.default_rng(1)
n = 153
slope = np.cumsum(rng.normal(0, 0.01, n))
level = np.cumsum(slope + rng.normal(0, 0.1, n)) + 2.0
y = rng.poisson(np.exp(0.5 * level / np.abs(level).max() + 1.0))
model = bsm_ng(y.astype(float), sd_level=halfnormal_prior(0.1, 1.0),
               sd_slope=halfnormal_prior(0.01, 0.1),
               distribution="poisson", dtype=jnp.float32)

B = 2048
nsim = 10
thetas = jnp.asarray(rng.normal(-2.5, 0.1, size=(B, 2)), jnp.float32)
spec0 = model.build(thetas[0])
mode0 = spec0.initial_mode.astype(jnp.float32)
modes = jnp.broadcast_to(mode0, (B, n)) + jnp.asarray(
    rng.normal(0, 0.01, (B, n)), jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(0), B)


def al_from(theta, mode):
    spec = model.build(theta)
    ar = approx_mod.approximate_for_is(spec, mode)
    sc = jnp.where(spec.obs_mask, approx_mod.fam.scales(
        spec.distribution, spec.y, spec.u, spec.phi, ar.mode, ar.ytilde,
        ar.Htilde), 0.0)
    z = jnp.zeros((), jnp.float32)
    return spec, approx_mod.ApproxLoglik(ar, sc, z, z)


def prep_only(theta, mode):
    spec, al = al_from(theta, mode)
    g = al.approx.gaussian(spec)
    sm = kalman_smoother(g)
    Lc, Ac = conditional_cov_factors(sm.Vt, sm.ccov)
    return sm.alphahat.sum() + Lc.sum() + Ac.sum()


def full_psi(theta, mode, key):
    spec, al = al_from(theta, mode)
    pf = pf_mod.psi_filter(spec, al, nsim, key)
    return pf.loglik


f_prep = jax.jit(lambda t, m: jax.vmap(prep_only)(t, m))
f_full = jax.jit(lambda t, m, k: jax.vmap(full_psi)(t, m, k))

r = f_prep(thetas, modes); r.block_until_ready()
t0 = time.time(); r = f_prep(thetas, modes); r.block_until_ready()
t_prep = time.time() - t0
r = f_full(thetas, modes, keys); r.block_until_ready()
t0 = time.time(); r = f_full(thetas, modes, keys); r.block_until_ready()
t_full = time.time() - t0
print(json.dumps({"B": B, "prep_s": round(t_prep, 3),
                  "full_s": round(t_full, 3),
                  "psi_scan_s": round(t_full - t_prep, 3)}))
