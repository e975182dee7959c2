"""KFAS `SSModel` ingestion round-trip (`/root/reference/R/as_bssm.R`).

No R in the image, so the .rds fixtures are fabricated with the minimal
writer in `rds_writer.py` using the exact SSModel component layouts KFAS
serializes (time-last system arrays, P1inf exact-diffuse marks, per-series
distribution vector)."""
import numpy as np
import pytest

from bssm_tpu.models.ssm import as_bssm
from bssm_tpu.utils.rdata import load_rds
from rds_writer import write_rds


def _nile_like(rng, n=60):
    """Local-level SSModel: Nile ~ SSMtrend(1, Q=2, P1inf), H=2
    (the reference's as_bssm docstring example, `as_bssm.R:20-24`)."""
    y = 900 + np.cumsum(rng.normal(0, 5, n)) + rng.normal(0, 10, n)
    return {
        "y": (y.reshape(n, 1), {"dim": np.array([n, 1.0])}),
        "Z": np.ones((1, 1, 1)),
        "H": np.full((1, 1, 1), 2.0),
        "T": np.ones((1, 1, 1)),
        "R": np.ones((1, 1, 1)),
        "Q": np.full((1, 1, 1), 2.0),
        "a1": np.zeros((1, 1)),
        "P1": np.zeros((1, 1)),
        "P1inf": np.ones((1, 1)),
        "u": np.ones((n, 1)),
        "distribution": "gaussian",
    }


def test_rds_roundtrip(tmp_path, rng):
    m = _nile_like(rng)
    p = str(tmp_path / "nile.rds")
    write_rds(p, m)
    back = load_rds(p)
    assert set(back) == set(m)
    np.testing.assert_allclose(back["y"], m["y"][0])
    np.testing.assert_allclose(back["Q"], m["Q"])
    assert list(np.atleast_1d(back["distribution"])) == ["gaussian"]


def test_as_bssm_kfas_gaussian_loglik(tmp_path, rng):
    """kappa replaces the exact-diffuse P1 and the logLik matches a
    directly built ssm_ulg (`as_bssm.R:34`, example lines 20-24)."""
    from bssm_tpu.inference.loglik import logLik as loglik
    from bssm_tpu.models.ssm import ssm_ulg
    m = _nile_like(rng)
    p = str(tmp_path / "nile.rds")
    write_rds(p, m)
    model = as_bssm(p, kappa=1e4)
    y = np.asarray(m["y"][0])[:, 0]
    direct = ssm_ulg(y, Z=np.ones(1), H=np.sqrt(2.0), T=np.ones((1, 1)),
                     R=np.full((1, 1), np.sqrt(2.0)), a1=np.zeros(1),
                     P1=np.full((1, 1), 1e4))
    ll_kfas = float(loglik(model))
    ll_direct = float(loglik(direct))
    assert np.isfinite(ll_kfas)
    np.testing.assert_allclose(ll_kfas, ll_direct, rtol=1e-10)


def test_as_bssm_kfas_poisson(tmp_path, rng):
    m = _nile_like(rng)
    lam = np.exp(np.cumsum(rng.normal(0, 0.1, 60)))
    m["y"] = (rng.poisson(lam).astype(float).reshape(60, 1),
              {"dim": np.array([60, 1.0])})
    m["distribution"] = "poisson"
    m["u"] = np.full((60, 1), 2.0)                # exposure kept for poisson
    p = str(tmp_path / "pois.rds")
    write_rds(p, m)
    model = as_bssm(p)
    assert model.kind == "ng"
    spec = model.build(model.theta_init)
    np.testing.assert_allclose(np.asarray(spec.u), 2.0)
    np.testing.assert_allclose(float(np.asarray(spec.P1)[0, 0]), 100.0)


def test_as_bssm_kfas_negbin_phi_from_u(tmp_path, rng):
    m = _nile_like(rng)
    m["y"] = (rng.poisson(5.0, 60).astype(float).reshape(60, 1),
              {"dim": np.array([60, 1.0])})
    m["distribution"] = "negative binomial"
    m["u"] = np.full((60, 1), 3.5)               # KFAS stores phi in u
    p = str(tmp_path / "nb.rds")
    write_rds(p, m)
    model = as_bssm(p)
    spec = model.build(model.theta_init)
    np.testing.assert_allclose(float(np.asarray(spec.phi)), 3.5)
    np.testing.assert_allclose(np.asarray(spec.u), 1.0)


def test_as_bssm_kfas_mlg_ldl(tmp_path, rng):
    """p = 2 Gaussian with correlated H and 2-column Q: both go through
    the LDL re-factorisation (`as_bssm.R:36-52,141-147`)."""
    n = 40
    y = rng.normal(size=(n, 2)).cumsum(axis=0)
    Hfull = np.array([[2.0, 0.5], [0.5, 1.0]])
    Qfull = np.array([[0.3, 0.1], [0.1, 0.2]])
    m = {
        "y": (y, {"dim": np.array([n, 2.0])}),
        "Z": np.eye(2).reshape(2, 2, 1),
        "H": Hfull.reshape(2, 2, 1),
        "T": np.eye(2).reshape(2, 2, 1),
        "R": np.eye(2).reshape(2, 2, 1),
        "Q": Qfull.reshape(2, 2, 1),
        "a1": np.zeros((2, 1)),
        "P1": np.eye(2) * 5.0,
        "P1inf": np.zeros((2, 2)),
        "u": np.ones((n, 2)),
        "distribution": ["gaussian", "gaussian"],
    }
    p = str(tmp_path / "mlg.rds")
    write_rds(p, m)
    model = as_bssm(p)
    assert model.kind == "mlg"
    spec = model.build(model.theta_init)
    H = np.asarray(spec.H)[0]
    R = np.asarray(spec.R)[0]
    np.testing.assert_allclose(H @ H.T, Hfull, atol=1e-12)
    np.testing.assert_allclose(R @ R.T, Qfull, atol=1e-12)


def test_as_bssm_kfas_mng_mixed(tmp_path, rng):
    n = 30
    y = np.column_stack([rng.poisson(3.0, n).astype(float),
                         rng.normal(0, 1, n)])
    m = {
        "y": (y, {"dim": np.array([n, 2.0])}),
        "Z": np.eye(2).reshape(2, 2, 1),
        "H": np.zeros((2, 2, 1)),
        "T": np.eye(2).reshape(2, 2, 1),
        "R": np.eye(2).reshape(2, 2, 1),
        "Q": (0.1 * np.eye(2)).reshape(2, 2, 1),
        "a1": np.zeros((2, 1)),
        "P1": np.eye(2),
        "P1inf": np.zeros((2, 2)),
        "u": np.column_stack([np.ones(n), np.full(n, 4.0)]),
        "distribution": ["poisson", "gaussian"],
    }
    p = str(tmp_path / "mng.rds")
    write_rds(p, m)
    model = as_bssm(p)
    assert model.kind == "mng"
    spec = model.build(model.theta_init)
    # gaussian series: phi = sqrt(u), u reset to 1 (`as_bssm.R:118-125`)
    np.testing.assert_allclose(np.asarray(spec.phi)[1], 2.0)
    np.testing.assert_allclose(np.asarray(spec.u)[:, 1], 1.0)


def test_as_bssm_kfas_time_varying_phi_rejected(tmp_path, rng):
    m = _nile_like(rng)
    m["distribution"] = "negative binomial"
    m["u"] = np.linspace(1, 2, 60).reshape(60, 1)
    p = str(tmp_path / "bad.rds")
    write_rds(p, m)
    with pytest.raises(ValueError, match="time-varying"):
        as_bssm(p)
