"""IS-type semantics: is1 count-scaling, is2 head sharing, post_correct
replay, and the multi-chain summary variance.

Reference anchors: is1 corrects each jump-chain head with nsim x count
particles (`/root/reference/src/approx_mcmc.cpp:375-377`); is2 corrects each
stored head once (`approx_mcmc.cpp:364-368`); post_correct re-weights a
stored approximate run (`/root/reference/R/post_correction.R:245-308`).
"""
import numpy as np

import jax.numpy as jnp

from bssm_tpu.core.priors import halfnormal_prior
from bssm_tpu.models.bsm import bsm_ng, bsm_lg
from bssm_tpu.inference.mcmc import run_mcmc, is_correction_key
from bssm_tpu.inference.postcorrect import post_correct


def _poisson_model(n=40, seed=0):
    rng = np.random.default_rng(seed)
    lvl = np.cumsum(rng.normal(0, 0.1, n)) + 1.0
    y = rng.poisson(np.exp(0.4 * lvl)).astype(float)
    return bsm_ng(y, sd_level=halfnormal_prior(0.1, 1.0),
                  sd_slope=halfnormal_prior(0.01, 0.1),
                  distribution="poisson")


def _segments(accepted):
    """Jump-chain segment id per flat slot (slot 0 of each chain = head)."""
    acc = accepted.astype(bool).copy()
    acc[:, 0] = True
    return np.cumsum(acc.reshape(-1)) - 1


def test_is_types_agree_statistically():
    """is1/is2/is3 are all unbiased corrections of the same approximate
    chain: the weighted posterior means must agree within MC error, while
    the weight columns themselves differ (distinct estimators)."""
    model = _poisson_model()
    outs = {}
    for t in ("is1", "is2", "is3"):
        outs[t] = run_mcmc(model, iter=800, particles=10, mcmc_type=t,
                           seed=11, n_chains=2, output_type="theta")
    means = {}
    for t, o in outs.items():
        w = o.flat_weights()
        th = o.flat_theta()
        means[t] = (w[:, None] * th).sum(0) / w.sum()
    for t in ("is1", "is3"):
        np.testing.assert_allclose(means[t], means["is2"], rtol=0.1,
                                   atol=0.02)
    # phase-1 chains identical across is types (same seed, same program)
    np.testing.assert_array_equal(outs["is1"].theta, outs["is2"].theta)
    # ... but the corrections are genuinely different estimators
    assert not np.array_equal(outs["is1"].weights, outs["is2"].weights)
    assert not np.array_equal(outs["is3"].weights, outs["is2"].weights)


def test_is1_weights_constant_within_segments():
    """is1 averages the count independent estimates of each segment, so the
    stored log-weight must be constant inside a jump-chain segment — and is
    generally different from the is2 single-head estimate."""
    model = _poisson_model()
    out = run_mcmc(model, iter=600, particles=8, mcmc_type="is1",
                   seed=3, n_chains=2, output_type="theta")
    log_w = out.posterior - out.prior - out.approx_loglik
    seg = _segments(out.accepted)
    lw = log_w.reshape(-1)
    for s in np.unique(seg):
        vals = lw[seg == s]
        np.testing.assert_allclose(vals, vals[0], rtol=0, atol=1e-10)


def test_is1_lower_variance_than_is2():
    """Across independent correction replays, the per-head is1 weight
    (count-averaged) has lower variance than the is2 single-shot weight on
    segments with count >= 2 (`approx_mcmc.cpp:375-377` semantics)."""
    model = _poisson_model()
    base = run_mcmc(model, iter=600, particles=8, mcmc_type="approx",
                    seed=5, n_chains=1, output_type="theta")
    seg = _segments(base.accepted)
    counts = np.bincount(seg)
    multi = counts[seg] >= 3          # slots living in count>=3 segments
    reps = {1: [], 2: []}
    for s in range(10):
        for t in (1, 2):
            o = post_correct(model, base, particles=8, is_type=t,
                             seed=100 + s, output_type="theta")
            lw = (o.posterior - base.posterior).reshape(-1)
            reps[t].append(lw)
    v1 = np.var(np.stack(reps[1]), axis=0)[multi].mean()
    v2 = np.var(np.stack(reps[2]), axis=0)[multi].mean()
    assert v1 < v2, (v1, v2)


def test_post_correct_replays_run_mcmc_is2_exactly():
    """post_correct with the run_mcmc correction key reproduces the stored
    is2 run bit-exactly (same device program, same inputs)."""
    model = _poisson_model()
    kw = dict(iter=400, particles=8, seed=7, n_chains=2,
              output_type="full")
    out_is = run_mcmc(model, mcmc_type="is2", **kw)
    out_ap = run_mcmc(model, mcmc_type="approx", **kw)
    # same seed + same phase-1 program => identical stored chains
    np.testing.assert_array_equal(out_ap.theta, out_is.theta)
    pc = post_correct(model, out_ap, particles=8, is_type=2,
                      key=is_correction_key(7, 2), output_type="full")
    np.testing.assert_array_equal(pc.weights, out_is.weights)
    np.testing.assert_array_equal(pc.alpha, out_is.alpha)
    np.testing.assert_allclose(pc.posterior, out_is.posterior, rtol=0,
                               atol=1e-12)


def test_post_correct_summary_moments():
    """post_correct(output_type='summary') matches the weighted moments of
    the full-output correction at the same key."""
    model = _poisson_model()
    base = run_mcmc(model, iter=400, particles=8, mcmc_type="approx",
                    seed=9, n_chains=2, output_type="theta")
    key = is_correction_key(9, 2)
    full = post_correct(model, base, particles=8, is_type=2, key=key,
                        output_type="full")
    summ = post_correct(model, base, particles=8, is_type=2, key=key,
                        output_type="summary")
    assert summ.alphahat is not None and summ.Vt is not None
    w = full.flat_weights()
    a = full.alpha.reshape((-1,) + full.alpha.shape[2:])
    mean = np.einsum('s,stm->tm', w, a) / w.sum()
    # the summary mean comes from exact per-draw PF moments, the full-output
    # mean from one sampled trajectory per draw: agree within MC error
    np.testing.assert_allclose(summ.alphahat, mean, atol=0.25)
    assert np.all(np.linalg.eigvalsh(summ.Vt[1:]) > -1e-8)


def test_gaussian_summary_includes_between_chain_variance():
    """Multi-chain summary Vt = E[Vt_theta] + Var[alphahat_theta] pooled
    over ALL chains' draws (law of total variance), not the plain average
    of per-chain outputs."""
    rng = np.random.default_rng(2)
    y = np.cumsum(rng.normal(0, 0.3, 60)) + rng.normal(0, 0.5, 60)
    model = bsm_lg(y, sd_y=halfnormal_prior(0.5, 2.0),
                   sd_level=halfnormal_prior(0.3, 2.0))
    out = run_mcmc(model, iter=400, mcmc_type="gaussian", seed=4,
                   n_chains=4, output_type="summary")
    # oracle: pooled law of total variance over every stored draw
    from bssm_tpu.inference.predict import _to_sampled
    from bssm_tpu.ops.kalman import smoother
    import jax
    th = out.theta.reshape(-1, out.theta.shape[-1])
    ths = np.asarray(jax.vmap(lambda x: _to_sampled(model, x))(
        jnp.asarray(th)))
    ahat, vts = [], []
    for t in ths:
        sm = smoother(model.build(jnp.asarray(t)))
        ahat.append(np.asarray(sm.alphahat))
        vts.append(np.asarray(sm.Vt))
    ahat, vts = np.stack(ahat), np.stack(vts)
    mean = ahat.mean(0)
    dev = ahat - mean
    vt = vts.mean(0) + np.einsum('sti,stj->tij', dev, dev) / ahat.shape[0]
    np.testing.assert_allclose(out.alphahat, mean, atol=1e-8)
    np.testing.assert_allclose(out.Vt, vt, atol=1e-8)
