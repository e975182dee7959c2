"""Fused Pallas chains-in-lanes Kalman kernel vs the lax.scan reference.

The kernel (ops/pallas_kalman.py) must be numerically interchangeable with
`ops.kalman.fast_smoother_ll` — same Joseph-form filter, same backward mean
pass, same missing-data masking — across state dims m=1..4, time-varying
H/D, and batch sizes that exercise the lane-block grid.  On CPU the kernel
runs in interpret mode; on TPU the same code compiles via Mosaic.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bssm_tpu.core import config
from bssm_tpu.core.spec import LGSpec
from bssm_tpu.ops import kalman
from bssm_tpu.ops.pallas_kalman import (fast_smoother_ll_auto,
                                        fused_fast_smoother_ll_batched)


def _batched_spec(rng, n, m, batch, tv_H=True, missing=True,
                  dtype=np.float32):
    y = rng.normal(size=(batch, n)).astype(dtype)
    if missing:
        y[:, rng.integers(0, n, size=max(1, n // 5))] = np.nan
    Z = rng.normal(size=(batch, 1, m)).astype(dtype)
    H = (np.abs(rng.normal(size=(batch, n if tv_H else 1))) + 0.3).astype(
        dtype)
    A = rng.normal(size=(batch, m, m)).astype(dtype)
    T = (0.8 * np.eye(m, dtype=dtype) + 0.1 * A)[:, None]
    R = (rng.normal(size=(batch, 1, m, m)) * 0.4).astype(dtype)
    a1 = rng.normal(size=(batch, m)).astype(dtype)
    P = rng.normal(size=(batch, m, m)).astype(dtype)
    P1 = np.einsum('bij,bkj->bik', P, P).astype(dtype)
    D = rng.normal(size=(batch, n)).astype(dtype)
    C = (rng.normal(size=(batch, 1, m)) * 0.1).astype(dtype)
    return LGSpec(y=jnp.asarray(y), Z=jnp.asarray(Z), H=jnp.asarray(H),
                  T=jnp.asarray(T), R=jnp.asarray(R), a1=jnp.asarray(a1),
                  P1=jnp.asarray(P1), D=jnp.asarray(D), C=jnp.asarray(C))


@pytest.mark.parametrize("n,m,batch", [(37, 1, 3), (37, 2, 5), (23, 3, 2),
                                       (19, 4, 130)])
def test_fused_matches_scan(rng, n, m, batch):
    spec = _batched_spec(rng, n, m, batch)
    ref_alpha, ref_ll = jax.vmap(kalman.fast_smoother_ll)(spec)
    out = fused_fast_smoother_ll_batched(spec, batch, interpret=True)
    assert out is not None
    alpha, ll = out
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref_ll),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha),
                               rtol=3e-4, atol=3e-4)


def test_custom_vmap_dispatch(rng):
    """vmap(fast_smoother_ll_auto) routes through the fused kernel when
    config.fused_kernels is forced on, with identical results."""
    spec = _batched_spec(rng, 31, 2, 4)
    ref_alpha, ref_ll = jax.vmap(kalman.fast_smoother_ll)(spec)
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        alpha, ll = jax.vmap(fast_smoother_ll_auto)(spec)
    finally:
        config.set_fused_kernels(old)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref_ll),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha),
                               rtol=3e-4, atol=3e-4)


def test_ll_only_kernel_matches_scan(rng):
    from bssm_tpu.ops.pallas_kalman import fused_log_likelihood_batched
    spec = _batched_spec(rng, 29, 2, 7)
    ref = jax.vmap(kalman.log_likelihood)(spec)
    ll = fused_log_likelihood_batched(spec, 7, interpret=True)
    assert ll is not None
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_unbatched_call_falls_back(rng):
    spec = _batched_spec(rng, 31, 2, 1)
    single = jax.tree_util.tree_map(lambda a: a[0], spec)
    a0, l0 = kalman.fast_smoother_ll(single)
    a1, l1 = fast_smoother_ll_auto(single)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1))
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))


def _ng_batch(rng, n, batch, m2=True, family="poisson"):
    import jax.numpy as jnp
    from bssm_tpu.core.priors import halfnormal_prior, uniform_prior
    from bssm_tpu.inference import approx as amod
    from bssm_tpu.models.bsm import bsm_ng
    from bssm_tpu.models.svm import svm as svm_model
    if family == "svm":
        y = rng.normal(0, 1, n) * np.exp(0.3 * np.sin(np.arange(n) / 5))
        model = svm_model(y, rho=uniform_prior(0.9, -0.999, 0.999),
                          sd_ar=halfnormal_prior(0.3, 1.0),
                          sigma=halfnormal_prior(1.0, 2.0),
                          dtype=jnp.float32)
        thetas = jnp.asarray(np.stack(
            [rng.normal([0.9, -1.2, 0.0], 0.05) for _ in range(batch)]),
            jnp.float32)
    else:
        y = rng.poisson(
            np.exp(np.cumsum(rng.normal(0, .1, n)))).astype(float)
        y[n // 3] = np.nan
        kw = dict(sd_level=halfnormal_prior(0.1, 1),
                  distribution=family, dtype=jnp.float32)
        if m2:
            kw["sd_slope"] = halfnormal_prior(0.01, 0.1)
        model = bsm_ng(y, **kw)
        d = 2 if m2 else 1
        thetas = jnp.asarray(rng.normal(-2.5, .2, (batch, d)), jnp.float32)

    def make_al(theta):
        spec = model.build(theta)
        al = amod.approx_loglik(spec)
        z = jnp.zeros((), jnp.float32)
        return spec, amod.ApproxLoglik(al.approx, al.scales, z, z)

    return jax.vmap(make_al)(thetas)


@pytest.mark.parametrize("family,m2", [("poisson", True), ("poisson", False),
                                       ("negative binomial", True),
                                       ("svm", False)])
def test_psi_kernel_matches_scan(rng, family, m2):
    """The fused psi-APF log-weight kernel must agree with the scan
    implementation given identical injected randomness."""
    from bssm_tpu.inference import particle as pf
    from bssm_tpu.ops.pallas_kalman import fused_psi_logw_batched
    n, B, N = 37, 5, 10
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)   # same factors on both paths
        specs, als = _ng_batch(rng, n, B, m2=m2, family=family)
        m = specs.a1.shape[-1]
        eps = jax.random.normal(jax.random.PRNGKey(1), (B, n + 1, N, m),
                                jnp.float32)
        us = jax.random.uniform(jax.random.PRNGKey(2), (B, n, N),
                                jnp.float32)
        ref = jax.vmap(pf.psi_logw_scan)(specs, als, eps, us)
        out = fused_psi_logw_batched(specs, als, eps, us, B, interpret=True)
        assert out is not None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    finally:
        config.set_fused_kernels(old)


@pytest.mark.parametrize("family", ["poisson", "binomial", "gamma"])
def test_laplace_step_kernel_matches_scan(rng, family):
    """The fused Laplace-step kernel (in-kernel pseudo-obs matching) must
    reproduce approx_loglik through the full while_loop."""
    import jax.numpy as jnp
    from bssm_tpu.core.priors import halfnormal_prior
    from bssm_tpu.inference import approx as amod
    from bssm_tpu.models.bsm import bsm_ng
    n = 43
    lam = np.exp(np.cumsum(rng.normal(0, .1, n)))
    if family == "poisson":
        y = rng.poisson(lam).astype(float)
        kw = {}
    elif family == "binomial":
        y = rng.binomial(20, 1 / (1 + np.exp(-np.log(lam)))).astype(float)
        kw = {"u": np.full(n, 20.0)}
    else:
        y = rng.gamma(2.0, lam / 2.0) + 1e-3
        kw = {"phi": 2.0}
    y[n // 4] = np.nan
    model = bsm_ng(y, sd_level=halfnormal_prior(0.1, 1),
                   distribution=family, dtype=jnp.float32, **kw)
    thetas = jnp.asarray(rng.normal(-2.3, .2, (3, 1)), jnp.float32)
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        lf = jax.vmap(lambda t: amod.approx_loglik(model.build(t)).loglik)(
            thetas)
        config.set_fused_kernels(False)
        ls = jax.vmap(lambda t: amod.approx_loglik(model.build(t)).loglik)(
            thetas)
    finally:
        config.set_fused_kernels(old)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                               rtol=5e-5, atol=5e-4)


def test_psi_logw_estimates_match_psi_filter(rng):
    """psi_logw (pre-generated randomness) and psi_filter (per-step keys)
    estimate the same log-likelihood within MC error at larger N."""
    from bssm_tpu.inference import particle as pf
    specs, als = _ng_batch(rng, 31, 1)
    spec = jax.tree_util.tree_map(lambda a: a[0], specs)
    al = jax.tree_util.tree_map(lambda a: a[0], als)
    keys = jax.random.split(jax.random.PRNGKey(0), 96)
    logw_fn = jax.jit(jax.vmap(lambda k: pf.psi_logw(spec, al, 64, k)))
    filt_fn = jax.jit(jax.vmap(lambda k: pf.psi_filter(spec, al, 64,
                                                       k).loglik))
    a = float(np.mean(np.asarray(logw_fn(keys[:48]))))
    b = float(np.mean(np.asarray(filt_fn(keys[48:]))))
    # per-key sd ~= 0.07 => MC se of the diff ~= 0.014; 0.05 ~= 3.5 sigma
    assert abs(a - b) < 0.05


def test_unsupported_shapes_return_none(rng):
    # time-varying T is outside the kernel contract
    spec = _batched_spec(rng, 12, 2, 2)
    Ttv = jnp.broadcast_to(spec.T, (2, 12, 2, 2))
    spec = spec._replace(T=Ttv)
    assert fused_fast_smoother_ll_batched(spec, 2, interpret=True) is None
    # m > 4 likewise
    spec5 = _batched_spec(rng, 12, 5, 2)
    assert fused_fast_smoother_ll_batched(spec5, 2, interpret=True) is None


def test_sublane_packed_blocks_match_scan(rng):
    """SUBS > 1 (chains packed into sublanes, (8, 128)-tile ops): the
    batched kernels must agree with the scan oracles at block sizes that
    trigger sublane packing (B >= 256 picks SUBS >= 2)."""
    from bssm_tpu.inference import particle as pf
    from bssm_tpu.ops.pallas_kalman import (_pick_subs,
                                            fused_laplace_solve_batched,
                                            fused_psi_logw_batched,
                                            _laplace_solve_base)
    n, B, N = 13, 1024, 4
    assert _pick_subs(0, 100, B) == 8
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        specs, als = _ng_batch(rng, n, B)
        mode0 = jnp.asarray(als.approx.mode, jnp.float32)
        out = fused_laplace_solve_batched(specs, mode0, 1e-6, 20, B,
                                          interpret=True)
        assert out is not None
        ref = jax.vmap(lambda s, m0: _laplace_solve_base(s, m0, 1e-6, 20))(
            specs, mode0)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[4]), np.asarray(ref[4]),
                                   rtol=1e-4, atol=1e-3)
        m = specs.a1.shape[-1]
        eps = jax.random.normal(jax.random.PRNGKey(1), (B, n + 1, N, m),
                                jnp.float32)
        us = jax.random.uniform(jax.random.PRNGKey(2), (B, n, N),
                                jnp.float32)
        logw = fused_psi_logw_batched(specs, als, eps, us, B,
                                      interpret=True)
        assert logw is not None
        ref_w = jax.vmap(pf.psi_logw_scan)(specs, als, eps, us)
        np.testing.assert_allclose(np.asarray(logw), np.asarray(ref_w),
                                   rtol=1e-4, atol=1e-3)
    finally:
        config.set_fused_kernels(old)


def test_rts_factors_match_smoother_oracle(rng):
    """The streamed-io RTS kernel's (ahat, Lb, Ab) backward factors must
    match the scan smoother_bwd_factors oracle DIRECTLY (the psi parity
    test feeds both paths from the same factors, so it cannot see factor
    bugs — this one compares against the fused-off oracle)."""
    from bssm_tpu.ops import kalman
    from bssm_tpu.ops.pallas_kalman import fused_smoother_bwd_factors_batched
    n, B = 37, 4
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        specs, als = _ng_batch(rng, n, B)
        g = specs.approx_gaussian(als.approx.ytilde, als.approx.Htilde)
        ahat, Lc, Ac = fused_smoother_bwd_factors_batched(g, B,
                                                          interpret=True)
    finally:
        config.set_fused_kernels(old)

    ra, rl, rc = jax.vmap(kalman.smoother_bwd_factors)(g)
    np.testing.assert_allclose(np.asarray(ahat), np.asarray(ra),
                               rtol=1e-4, atol=1e-4)
    # the factor itself is unique only up to the clipped-pinv tie-breaks at
    # near-singular V (f32 rounding flips the clip); compare the covariance
    # L L' and require the factor to match wherever V is well-conditioned
    LL = np.einsum('btij,btkj->btik', np.asarray(Lc), np.asarray(Lc))
    LLr = np.einsum('btij,btkj->btik', np.asarray(rl), np.asarray(rl))
    np.testing.assert_allclose(LL, LLr, atol=5e-3)
    lerr = np.abs(np.asarray(Lc) - np.asarray(rl)).max(axis=(0, 2, 3))
    aerr = np.abs(np.asarray(Ac) - np.asarray(rc)).max(axis=(0, 2, 3))
    n1 = lerr.shape[0]
    assert (lerr < 1e-3).sum() >= n1 - 5, lerr
    assert (aerr < 1e-3).sum() >= n1 - 5, aerr


def test_f32_is_weights_stable_at_degenerate_theta(rng):
    """Regression: the f32 psi-APF IS correction must not blow up at
    near-degenerate state noise.  Pre-J-form-smoother, the Durbin-Koopman
    N-recursion (V = P - P N P) lost the smoothed covariance to diffuse-P1
    cancellation (negative variances), and the hard pinv tolerance turned
    eigenvalue noise into conditional gains |A| ~ 500: single corrections
    returned log-weights in the thousands and ESS_IS collapsed to ~1.
    The psi correction satisfies |log_w| <~ 1 by design (suggest_N targets
    sd < 1, `/root/reference/R/post_correction.R:12-46`)."""
    import jax.numpy as jnp
    from bssm_tpu.core.priors import halfnormal_prior
    from bssm_tpu.inference import approx as amod
    from bssm_tpu.inference.mcmc import _make_correct_one
    from bssm_tpu.models.bsm import bsm_ng

    n = 97
    slope = np.cumsum(rng.normal(0, 0.01, n))
    level = np.cumsum(slope + rng.normal(0, 0.1, n)) + 2.0
    y = rng.poisson(np.exp(0.5 * level / np.abs(level).max() + 1.0))
    model = bsm_ng(y.astype(float), sd_level=halfnormal_prior(0.1, 1.0),
                   sd_slope=halfnormal_prior(0.01, 0.1),
                   distribution="poisson", dtype=jnp.float32)
    # the observed failure regime: sd_level ~ 2e-3, sd_slope ~ 3e-5
    th = jnp.asarray(np.log([[1.9e-3, 2.9e-5], [2.4e-4, 3.9e-3],
                             [1.0e-5, 1.0e-5], [0.04, 0.003]]), jnp.float32)
    modes = jnp.stack([amod.approximate(model.build(t)).mode for t in th])
    c1 = _make_correct_one(model, 10, "psi",
                           want_states=False, want_moments=False)
    f = jax.jit(jax.vmap(lambda t, m, k: c1((t, m, k))["log_w"]))
    for old, fused in ((config.fused_kernels, True),):
        try:
            config.set_fused_kernels(fused)
            for seed in (0, 1, 2):
                keys = jax.random.split(jax.random.PRNGKey(seed), 4)
                lw = np.asarray(f(th, modes, keys))
                assert np.all(np.isfinite(lw)), lw
                assert np.abs(lw).max() < 3.0, lw
        finally:
            config.set_fused_kernels(old)
    # scan path too
    for seed in (0, 1, 2):
        keys = jax.random.split(jax.random.PRNGKey(seed + 7), 4)
        lw = np.asarray(f(th, modes, keys))
        assert np.all(np.isfinite(lw)), lw
        assert np.abs(lw).max() < 3.0, lw


@pytest.mark.parametrize("m", [3, 4])
def test_rts_factors_m34_match_oracle(rng, m):
    """m in {3, 4} routes the RTS/factor kernel through the in-kernel
    cyclic-Jacobi eigensystem; compare the order-invariant quantities
    (alphahat, L L', J) against the scan + jnp.linalg.eigh oracle."""
    from bssm_tpu.ops.pallas_kalman import fused_smoother_bwd_factors_batched
    n, B = 29, 3
    spec = _batched_spec(rng, n, m, B, missing=True)
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        out = fused_smoother_bwd_factors_batched(spec, B, interpret=True)
    finally:
        config.set_fused_kernels(old)
    assert out is not None
    ahat, Lc, Ac = out

    ra, rl, rc = jax.vmap(kalman.smoother_bwd_factors)(spec)
    np.testing.assert_allclose(np.asarray(ahat), np.asarray(ra),
                               rtol=1e-3, atol=1e-3)
    LL = np.einsum('btij,btkj->btik', np.asarray(Lc), np.asarray(Lc))
    LLr = np.einsum('btij,btkj->btik', np.asarray(rl), np.asarray(rl))
    np.testing.assert_allclose(LL, LLr, atol=5e-3)
    np.testing.assert_allclose(np.asarray(Ac), np.asarray(rc),
                               rtol=2e-2, atol=2e-2)


def test_psi_kernel_n32_matches_scan(rng):
    """N = 32 (the suggest_N-recommended range) through the fused psi
    kernel (`/root/reference/R/post_correction.R:149-151`)."""
    from bssm_tpu.inference import particle as pf
    from bssm_tpu.ops.pallas_kalman import fused_psi_logw_batched
    n, B, N = 23, 3, 32
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        specs, als = _ng_batch(rng, n, B)
        m = specs.a1.shape[-1]
        eps = jax.random.normal(jax.random.PRNGKey(1), (B, n + 1, N, m),
                                jnp.float32)
        us = jax.random.uniform(jax.random.PRNGKey(2), (B, n, N),
                                jnp.float32)
        ref = jax.vmap(pf.psi_logw_scan)(specs, als, eps, us)
        out = fused_psi_logw_batched(specs, als, eps, us, B, interpret=True)
        assert out is not None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    finally:
        config.set_fused_kernels(old)


def test_psi_logw_large_n_keyed_matches_psi_filter(rng):
    """N > _MAX_N_PSI routes psi_logw through the per-step-RNG scan (no
    pre-generated randomness tensor); its stream is exactly psi_filter's,
    so the values must match identically."""
    from bssm_tpu.inference import approx as amod
    from bssm_tpu.inference import particle as pf
    from bssm_tpu.ops.pallas_kalman import _MAX_N_PSI
    specs, als = _ng_batch(rng, 23, 1)
    spec = jax.tree_util.tree_map(lambda a: a[0], specs)
    al = jax.tree_util.tree_map(lambda a: a[0], als)
    N = _MAX_N_PSI + 16
    key = jax.random.PRNGKey(9)
    lw = float(pf.psi_logw(spec, al, N, key))
    ref = float(pf.psi_filter(spec, al, N, key).loglik)
    np.testing.assert_allclose(lw, ref, rtol=0, atol=5e-5)


# ---------------------------------------------------------------------------
# large-N psi-APF kernel (particles in sublanes)
# ---------------------------------------------------------------------------

def _big_mirror(specs, als, eps, us, kk, B, N):
    """Straight-line jnp mirror of `_psi_big_kernel`'s math on (N, B)
    arrays — validates the kernel's ref plumbing / fori structure / roll /
    scratch against identical arithmetic (same shapes => same XLA CPU
    kernels in interpret mode)."""
    from bssm_tpu.ops.pallas_kalman import (
        _lane_log_weight, fused_smoother_bwd_factors_batched)
    f32 = jnp.float32
    n = specs.y.shape[-1]
    m = specs.a1.shape[-1]
    mm = m * m
    dist = int(specs.distribution)
    g = specs.approx_gaussian(als.approx.ytilde, als.approx.Htilde)
    ahat, Lc, Ac = fused_smoother_bwd_factors_batched(g, B, interpret=True)

    def bc(x):
        return np.broadcast_to(np.asarray(x), (B, n))
    obs = np.stack([np.asarray(als.approx.ytilde),
                    np.asarray(als.approx.Htilde), bc(specs.y),
                    bc(specs.u), np.asarray(als.scales),
                    bc(specs.D)], axis=2)
    pad0 = np.stack([np.full((B, 1), np.nan), np.ones((B, 1)),
                     np.full((B, 1), np.nan), np.ones((B, 1)),
                     np.zeros((B, 1)), np.zeros((B, 1))], axis=2)
    obs = np.concatenate([pad0, obs[:, ::-1]], axis=1).astype(np.float32)
    fac = np.concatenate(
        [np.asarray(ahat), np.asarray(Lc).reshape(B, n + 1, mm),
         np.asarray(Ac).reshape(B, n + 1, mm)],
        axis=2)[:, ::-1].astype(np.float32)
    ZT = jnp.asarray(np.asarray(specs.Z)[:, 0].T)              # (m, B)
    phiT = jnp.asarray(np.broadcast_to(
        np.asarray(specs.phi).reshape(-1, 1), (B, 1)).T.astype(np.float32))
    epsT = jnp.moveaxis(eps, 0, -1)                            # (n+1,m,N,B)
    usT = jnp.moveaxis(us, 0, -1)
    obsT = jnp.moveaxis(jnp.asarray(obs), 0, -1)
    facT = jnp.moveaxis(jnp.asarray(fac), 0, -1)

    neglogN = float(-np.log(N))
    rio = jax.lax.broadcasted_iota(f32, (N, B), 0)
    last_row = rio == (N - 1)
    Ulow = (jax.lax.broadcasted_iota(f32, (N, N), 1)
            <= jax.lax.broadcasted_iota(f32, (N, N), 0)).astype(f32)

    def weight(s, alpha, lnw, ll):
        o = obsT[s]
        ytv, htv, yv, uv, scv, dv = [o[k][None, :] for k in range(6)]
        if dist == 0:
            sig = alpha[0]
        else:
            sig = dv
            for i in range(m):
                sig = sig + ZT[i][None, :] * alpha[i]
        lw = _lane_log_weight(dist, yv, uv, phiT, sig, ytv, htv) - scv
        oky = jnp.isfinite(yv)
        lw = jnp.where(oky, lw, 0.0)
        lt = jnp.where(jnp.isfinite(lnw + lw), lnw + lw, -jnp.inf)
        mx = jnp.max(lt, axis=0, keepdims=True)
        mx_ok = jnp.isfinite(mx)
        mxs = jnp.where(mx_ok, mx, 0.0)
        w = jnp.where(jnp.isfinite(lt), jnp.exp(lt - mxs), 0.0)
        sw = jnp.sum(w, axis=0, keepdims=True)
        ok2 = (sw > 0) & mx_ok
        inc = jnp.where(ok2, mxs + jnp.log(jnp.maximum(sw, 1e-35)),
                        -jnp.inf)
        ll = ll + jnp.where(oky, inc, 0.0)
        return jnp.where(ok2, lt - inc, neglogN), ll

    def propagate(s, anc, ahp):
        f = facT[s]
        ah_t = [f[i][None, :] for i in range(m)]
        out = []
        for i in range(m):
            acc = ah_t[i]
            for j in range(m):
                acc = acc + f[m + mm + i * m + j][None, :] \
                    * (anc[j] - ahp[j]) \
                    + f[m + i * m + j][None, :] * epsT[s][j]
            out.append(acc)
        return out, ah_t

    def resample(s0, alpha, lnw):
        nw = jnp.where(jnp.isfinite(lnw), jnp.exp(lnw), 0.0)
        cum = jax.lax.dot_general(Ulow, nw, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        cum = jnp.where(last_row, 1.0, cum)
        u = (rio + usT[s0]) * (1.0 / N)
        anc = []
        for i in range(m):
            rolled = jnp.concatenate([alpha[i][1:], alpha[i][:1]], axis=0)
            dal = alpha[i] - jnp.where(last_row, 0.0, rolled)
            rows = [jnp.sum((cum >= u[p][None, :]).astype(f32) * dal,
                            axis=0) for p in range(N)]
            anc.append(jnp.stack(rows, axis=0))
        return anc

    @jax.jit
    def run():
        f0 = facT[0]
        ah0 = [f0[i][None, :] for i in range(m)]
        alpha = []
        for i in range(m):
            acc = ah0[i]
            for j in range(m):
                acc = acc + f0[m + i * m + j][None, :] * epsT[0][j]
            alpha.append(acc)
        lnw = jnp.full((N, B), neglogN, f32)
        ll = jnp.zeros((1, B), f32)
        ahp = ah0
        s = 1
        while s <= n:
            anc = resample(s, alpha, lnw)
            alpha, aht = propagate(s, anc, ahp)
            lnw, ll = weight(s, alpha, jnp.full((N, B), neglogN, f32), ll)
            ahp = aht
            for s2 in range(s + 1, min(s + kk, n + 1)):
                alpha, aht = propagate(s2, alpha, ahp)
                lnw, ll = weight(s2, alpha, lnw, ll)
                ahp = aht
            s += kk
        return ll[0]

    return np.asarray(run())


@pytest.mark.parametrize("family,kk", [("poisson", 1), ("poisson", 4),
                                       ("svm", 2)])
def test_psi_big_kernel_matches_mirror(rng, family, kk):
    """The particles-in-sublanes large-N kernel must reproduce identical
    arithmetic run as straight-line jnp, for every resample period."""
    from bssm_tpu.ops.pallas_kalman import psi_big_logw_stream
    n, B, N = 11, 128, 64
    m2 = family != "svm"
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        specs, als = _ng_batch(rng, n, B, m2=m2, family=family)
        m = specs.a1.shape[-1]
        eps = jax.random.normal(jax.random.PRNGKey(1), (B, n + 1, m, N),
                                jnp.float32)
        us = jax.random.uniform(jax.random.PRNGKey(2), (B, n + 1, N),
                                jnp.float32)
        out = psi_big_logw_stream(specs, als, eps, us, kk, interpret=True)
        assert out is not None
        ref = _big_mirror(specs, als, eps, us, kk, B, N)
        # tolerance scales with the per-draw cancellation magnitude: the
        # log-weight is a residue of +-|scales|-sized per-step terms, so
        # XLA-fusion rounding noise is ~1e-7 * sum|scales| (svm reaches
        # |scales| ~ 300).  That same noise can flip a stratified-
        # resampling boundary on rare draws, after which the two runs are
        # different-but-valid MC draws — allow <= 5% such lanes, bounded
        # by the MC spread.
        sc_mag = np.abs(np.asarray(als.scales)).sum(axis=1)
        diff = np.abs(np.asarray(out) - ref)
        atol = 2e-4 + 2e-6 * sc_mag
        assert np.mean(diff < atol) >= 0.95, (diff.max(), np.mean(
            diff < atol))
        assert np.all(diff < 0.5)
        assert np.all(np.isfinite(np.asarray(out)))
    finally:
        config.set_fused_kernels(old)


@pytest.mark.parametrize("kk", [1, 4])
def test_psi_big_unbiased_vs_scan(rng, kk):
    """log-mean-exp of the big-kernel psi weights must agree with the
    every-step scan tier within MC error (the likelihood-ratio estimate is
    unbiased for ANY fixed resampling schedule)."""
    from bssm_tpu.inference import particle as pf
    from bssm_tpu.ops.pallas_kalman import psi_big_logw_stream
    n, B, N = 17, 256, 64
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        specs, als = _ng_batch(rng, n, 1, m2=True, family="poisson")
        spec1, al1 = jax.tree_util.tree_map(lambda a: a[0], (specs, als))
        specs = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[0], (B,) + a.shape[1:]), specs)
        als = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[0], (B,) + a.shape[1:]), als)
        m = 2
        eps = jax.random.normal(jax.random.PRNGKey(kk), (B, n + 1, m, N),
                                jnp.float32)
        us = jax.random.uniform(jax.random.PRNGKey(40 + kk),
                                (B, n + 1, N), jnp.float32)
        out = np.asarray(psi_big_logw_stream(specs, als, eps, us, kk,
                                             interpret=True))
        keys = jax.random.split(jax.random.PRNGKey(7), B)
        ref = np.asarray(jax.jit(jax.vmap(
            lambda k: pf._psi_logw_keyed(spec1, al1, N, k)))(keys))

        def lme(x):
            mx = x.max()
            return mx + np.log(np.mean(np.exp(x - mx)))
        se = (ref.std() + out.std()) / np.sqrt(B)
        assert abs(lme(out) - lme(ref)) < 5 * se + 0.02
    finally:
        config.set_fused_kernels(old)


def test_psi_logw_big_dispatch(rng):
    """psi_logw at 32 < N <= 512 routes through the big-kernel custom_vmap
    (fused interpret on) and the keyed-scan fallback (fused off), with
    statistically consistent results; resample_every plumbs through."""
    from bssm_tpu.inference import particle as pf
    n, B, N = 17, 192, 64
    specs, als = _ng_batch(rng, n, 1, m2=True, family="poisson")
    spec1, al1 = jax.tree_util.tree_map(lambda a: a[0], (specs, als))
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        out_f = np.asarray(jax.jit(jax.vmap(
            lambda k: pf.psi_logw(spec1, al1, N, k, resample_every=4)))(
                keys))
        config.set_fused_kernels(False)
        out_s = np.asarray(jax.jit(jax.vmap(
            lambda k: pf.psi_logw(spec1, al1, N, k, resample_every=4)))(
                keys))
    finally:
        config.set_fused_kernels(old)
    assert np.all(np.isfinite(out_f)) and np.all(np.isfinite(out_s))
    se = (out_f.std() + out_s.std()) / np.sqrt(B)
    assert abs(out_f.mean() - out_s.mean()) < 5 * se + 0.02


def test_psi_keyed_resample_every_consistent(rng):
    """The keyed scan's general weight recursion (resample_every > 1) is
    statistically consistent with every-step resampling."""
    from bssm_tpu.inference import particle as pf
    n, B, N = 17, 192, 48
    specs, als = _ng_batch(rng, n, 1, m2=False, family="poisson")
    spec1, al1 = jax.tree_util.tree_map(lambda a: a[0], (specs, als))
    keys = jax.random.split(jax.random.PRNGKey(6), B)
    a = np.asarray(jax.jit(jax.vmap(
        lambda k: pf._psi_logw_keyed(spec1, al1, N, k)))(keys))
    b = np.asarray(jax.jit(jax.vmap(
        lambda k: pf._psi_logw_keyed(spec1, al1, N, k,
                                     resample_every=3)))(keys))
    se = (a.std() + b.std()) / np.sqrt(B)
    assert abs(a.mean() - b.mean()) < 5 * se + 0.02


@pytest.mark.parametrize("kk", [1, 4])
def test_bsf_big_unbiased_vs_scan(rng, kk):
    """The large-N BSF kernel (stream mode) must agree with the keyed
    scan tier within MC error — mean log-lik and log-mean-exp."""
    from bssm_tpu.core import distributions as fam
    from bssm_tpu.inference import particle as pf
    from bssm_tpu.ops.pallas_kalman import bsf_big_logw_stream
    n, B, N = 17, 256, 64
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        specs, als = _ng_batch(rng, n, 1, m2=True, family="poisson")
        spec1 = jax.tree_util.tree_map(lambda a: a[0], specs)
        specs = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[0], (B,) + a.shape[1:]), specs)
        m = 2
        eps = jax.random.normal(jax.random.PRNGKey(kk), (B, n, m, N),
                                jnp.float32)
        us = jax.random.uniform(jax.random.PRNGKey(50 + kk), (B, n, N),
                                jnp.float32)
        out = bsf_big_logw_stream(specs, eps, us, kk, interpret=True)
        assert out is not None
        const = float(fam.obs_log_const(spec1.distribution, spec1.y,
                                        spec1.u, spec1.phi))
        out = np.asarray(out) + const
        keys = jax.random.split(jax.random.PRNGKey(8), B)
        ref = np.asarray(jax.jit(jax.vmap(
            lambda k: pf.bsf_logw(spec1, N, k)))(keys))
        assert np.all(np.isfinite(out))
        se = (out.std() + ref.std()) / np.sqrt(B)
        assert abs(out.mean() - ref.mean()) < 5 * se + 0.05

        def lme(x):
            mx = x.max()
            return mx + np.log(np.mean(np.exp(x - mx)))
        assert abs(lme(out) - lme(ref)) < 5 * se + 0.05
    finally:
        config.set_fused_kernels(old)


def test_bsf_logw_keyed_matches_bsf_filter(rng):
    """At resample_every=1 the keyed BSF log-lik equals bsf_filter's
    bitwise (same RNG stream), and resample_every>1 stays consistent."""
    from bssm_tpu.core import distributions as fam
    from bssm_tpu.inference import particle as pf
    specs, als = _ng_batch(rng, 23, 1, m2=True, family="poisson")
    spec1 = jax.tree_util.tree_map(lambda a: a[0], specs)
    key = jax.random.PRNGKey(2)
    a = float(pf.bsf_filter(spec1, 24, key).loglik)
    const = float(fam.obs_log_const(spec1.distribution, spec1.y, spec1.u,
                                    spec1.phi))
    b = float(pf._bsf_logw_keyed(spec1, 24, key)) + const
    assert abs(a - b) < 1e-4
    keys = jax.random.split(key, 128)
    c = np.asarray(jax.jit(jax.vmap(
        lambda k: pf.bsf_logw(spec1, 48, k)))(keys))
    d = np.asarray(jax.jit(jax.vmap(
        lambda k: pf.bsf_logw(spec1, 48, k, resample_every=3)))(keys))
    se = (c.std() + d.std()) / np.sqrt(128)
    assert abs(c.mean() - d.mean()) < 5 * se + 0.05


def _bsf_mirror(specs, eps, us, kk, B, N):
    """Straight-line jnp mirror of `_psi_big_kernel(bsf=True)` — locks the
    BSF-specific row construction (a1/chol P1 init, C/R/T rows, step-0
    weighting, zero ah_prev) bit-for-bit."""
    from bssm_tpu.ops.chol import psd_chol
    from bssm_tpu.ops.pallas_kalman import _lane_log_weight
    f32 = jnp.float32
    n = specs.y.shape[-1]
    m = specs.a1.shape[-1]
    dist = int(specs.distribution)

    def bc(x):
        return np.broadcast_to(np.asarray(x), (B, n)).astype(np.float32)
    yB, uB, dB = bc(specs.y), bc(specs.u), bc(specs.D)
    ZT = jnp.asarray(np.asarray(specs.Z)[:, 0].T, f32)         # (m, B)
    phiT = jnp.asarray(np.broadcast_to(
        np.asarray(specs.phi).reshape(-1, 1), (B, 1)).T.astype(np.float32))
    a1 = jnp.asarray(np.asarray(specs.a1).T, f32)              # (m, B)
    L1 = np.asarray(jax.vmap(psd_chol)(jnp.asarray(specs.P1, f32)))
    L1T = jnp.asarray(np.moveaxis(L1, 0, -1), f32)             # (m, m, B)
    Cv = jnp.asarray(np.asarray(specs.C)[:, 0].T, f32)         # (m, B)
    T = jnp.asarray(np.moveaxis(np.asarray(specs.T)[:, 0], 0, -1), f32)
    R = np.asarray(specs.R)[:, 0]
    k = R.shape[-1]
    if k < m:
        R = np.concatenate([R, np.zeros((B, m, m - k), np.float32)], -1)
    R = jnp.asarray(np.moveaxis(R, 0, -1), f32)                # (m, m, B)
    epsT = jnp.moveaxis(eps, 0, -1)                            # (n, m, N, B)
    usT = jnp.moveaxis(us, 0, -1)                              # (n, N, B)
    yT = jnp.asarray(yB.T)                                     # (n, B)... 
    yT = jnp.moveaxis(jnp.asarray(yB), 0, -1)
    uT = jnp.moveaxis(jnp.asarray(uB), 0, -1)
    dT = jnp.moveaxis(jnp.asarray(dB), 0, -1)

    neglogN = float(-np.log(N))
    rio = jax.lax.broadcasted_iota(f32, (N, B), 0)
    last_row = rio == (N - 1)
    Ulow = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)).astype(f32)

    def weight(s, alpha, lnw, ll):
        yv, uv, dv = yT[s][None, :], uT[s][None, :], dT[s][None, :]
        if dist == 0:
            sig = alpha[0]
        else:
            sig = dv
            for i in range(m):
                sig = sig + ZT[i][None, :] * alpha[i]
        nanrow = jnp.full_like(yv, jnp.nan)
        lw = _lane_log_weight(dist, yv, uv, phiT, sig, nanrow,
                              jnp.ones_like(yv))
        oky = jnp.isfinite(yv)
        lw = jnp.where(oky, lw, 0.0)
        lt = jnp.where(jnp.isfinite(lnw + lw), lnw + lw, -jnp.inf)
        mx = jnp.max(lt, axis=0, keepdims=True)
        mx_ok = jnp.isfinite(mx)
        mxs = jnp.where(mx_ok, mx, 0.0)
        w = jnp.where(jnp.isfinite(lt), jnp.exp(lt - mxs), 0.0)
        sw = jnp.sum(w, axis=0, keepdims=True)
        ok2 = (sw > 0) & mx_ok
        inc = jnp.where(ok2, mxs + jnp.log(jnp.maximum(sw, 1e-35)),
                        -jnp.inf)
        ll = ll + jnp.where(oky, inc, 0.0)
        return jnp.where(ok2, lt - inc, neglogN), ll

    def propagate(s, anc):
        out = []
        for i in range(m):
            acc = Cv[i][None, :]
            for j in range(m):
                acc = acc + T[i, j][None, :] * anc[j] \
                    + R[i, j][None, :] * epsT[s][j]
            out.append(acc)
        return out

    def resample(s0, alpha, lnw):
        nw = jnp.where(jnp.isfinite(lnw), jnp.exp(lnw), 0.0)
        cum = jax.lax.dot_general(Ulow, nw, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        cum = jnp.where(last_row, 1.0, cum)
        u = (rio + usT[s0]) * (1.0 / N)
        anc = []
        for i in range(m):
            rolled = jnp.concatenate([alpha[i][1:], alpha[i][:1]], axis=0)
            dal = alpha[i] - jnp.where(last_row, 0.0, rolled)
            rows = [jnp.sum((cum >= u[p][None, :]).astype(f32) * dal,
                            axis=0) for p in range(N)]
            anc.append(jnp.stack(rows, axis=0))
        return anc

    @jax.jit
    def run():
        alpha = []
        for i in range(m):
            acc = a1[i][None, :]
            for j in range(m):
                acc = acc + L1T[i, j][None, :] * epsT[0][j]
            alpha.append(acc)
        lnw, ll = weight(0, alpha, jnp.full((N, B), neglogN, f32),
                         jnp.zeros((1, B), f32))
        s = 1
        while s <= n - 1:
            anc = resample(s, alpha, lnw)
            alpha = propagate(s, anc)
            lnw, ll = weight(s, alpha, jnp.full((N, B), neglogN, f32), ll)
            for s2 in range(s + 1, min(s + kk, n)):
                alpha = propagate(s2, alpha)
                lnw, ll = weight(s2, alpha, lnw, ll)
            s += kk
        return ll[0]

    return np.asarray(run())


@pytest.mark.parametrize("kk", [1, 3])
def test_bsf_big_kernel_matches_mirror(rng, kk):
    from bssm_tpu.ops.pallas_kalman import bsf_big_logw_stream
    n, B, N = 11, 128, 64
    old = config.fused_kernels
    try:
        config.set_fused_kernels(True)
        specs, als = _ng_batch(rng, n, B, m2=True, family="poisson")
        m = 2
        eps = jax.random.normal(jax.random.PRNGKey(1), (B, n, m, N),
                                jnp.float32)
        us = jax.random.uniform(jax.random.PRNGKey(2), (B, n, N),
                                jnp.float32)
        out = bsf_big_logw_stream(specs, eps, us, kk, interpret=True)
        assert out is not None
        ref = _bsf_mirror(specs, eps, us, kk, B, N)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                                   atol=2e-4)
    finally:
        config.set_fused_kernels(old)
