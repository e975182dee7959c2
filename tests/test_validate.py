"""Bad-argument validation parity (`/root/reference/tests/testthat/test_models.R`
and `/root/reference/R/check_arguments.R`): constructors must reject
malformed y/Z/T/R/a1/P1/H/D/C/u/xreg/beta with friendly errors, and the
checker helpers must normalise the accepted layouts."""
import numpy as np
import pytest

from bssm_tpu.core import validate as val
from bssm_tpu.core.priors import normal_prior
from bssm_tpu.models.ar1 import ar1_lg
from bssm_tpu.models.bsm import bsm_lg, bsm_ng
from bssm_tpu.models.ssm import ssm_mlg, ssm_mng, ssm_ulg, ssm_ung

Y = np.arange(1.0, 11.0)


def test_check_y_errors():
    with pytest.raises(ValueError, match="1d"):
        val.check_y(np.ones((4, 2)))
    with pytest.raises(ValueError, match="at least 2"):
        val.check_y(np.ones(1))
    with pytest.raises(ValueError, match="finite"):
        val.check_y(np.array([1.0, np.inf, 3.0]))
    with pytest.raises(ValueError, match="Negative or non-integer"):
        val.check_y(np.array([1.0, -2.0, 3.0]), distribution="poisson")
    with pytest.raises(ValueError, match="Negative or non-integer"):
        val.check_y(np.array([1.0, 2.5, 3.0]), distribution="binomial")
    with pytest.raises(ValueError, match="2d"):
        val.check_y(np.ones(5), multivariate=True)
    # NaN allowed
    val.check_y(np.array([1.0, np.nan, 3.0]))


def test_check_system_matrix_shapes():
    n, m = 10, 2
    # Z layouts: (m,), (m, n); bad width rejected
    assert val.check_Z(np.ones(m), 1, n).shape == (m, 1)
    assert val.check_Z(np.ones((m, n)), 1, n).shape == (m, n)
    with pytest.raises(ValueError, match="'Z'"):
        val.check_Z(np.ones((m, 3)), 1, n)
    # multivariate Z: (p, m) -> (p, m, 1)
    assert val.check_Z(np.ones((3, m)), 3, n, multivariate=True).shape \
        == (3, m, 1)
    with pytest.raises(ValueError, match="'Z'"):
        val.check_Z(np.ones((2, m)), 3, n, multivariate=True)
    # T
    assert val.check_T(1.0, 1, n).shape == (1, 1, 1)
    assert val.check_T(np.eye(m), m, n).shape == (m, m, 1)
    with pytest.raises(ValueError, match="'T'"):
        val.check_T(np.ones((m, 3)), m, n)
    with pytest.raises(ValueError, match="'T'"):
        val.check_T(np.ones((m, m, 4)), m, n)
    # R: k <= m
    assert val.check_R(np.ones(m), m, n).shape == (m, 1, 1)
    with pytest.raises(ValueError, match="'R'"):
        val.check_R(np.ones((m, m + 1)), m, n)
    # a1 / P1
    assert val.check_a1(None, m).shape == (m,)
    assert val.check_a1(1.0, m).tolist() == [1.0, 1.0]
    with pytest.raises(ValueError, match="a1"):
        val.check_a1(np.ones(3), m)
    with pytest.raises(ValueError, match="P1"):
        val.check_P1(np.ones((m, 3)), m)
    # H
    assert val.check_H(2.0, 1, n).shape == (1,)
    assert val.check_H(np.ones(n), 1, n).shape == (n,)
    with pytest.raises(ValueError, match="'H'"):
        val.check_H(np.ones(3), 1, n)
    assert val.check_H(np.eye(3), 3, n, multivariate=True).shape == (3, 3, 1)
    with pytest.raises(ValueError, match="'H'"):
        val.check_H(np.ones((3, 2)), 3, n, multivariate=True)
    # D / C
    assert val.check_D(None, 1, n).shape == (1,)
    assert val.check_D(np.ones(3), 3, n).shape == (3, 1)
    with pytest.raises(ValueError, match="'D'"):
        val.check_D(np.ones(4), 3, n)
    assert val.check_C(None, m, n).shape == (m, 1)
    with pytest.raises(ValueError, match="'C'"):
        val.check_C(np.ones((m, 5)), m, n)


def test_check_misc():
    with pytest.raises(ValueError, match="xreg"):
        val.check_xreg(np.ones((4, 2)), 10)
    with pytest.raises(ValueError, match="beta"):
        val.check_beta(np.array([1.0, np.inf]), 2)
    with pytest.raises(ValueError, match="number of columns"):
        val.check_beta(np.ones(3), 2)
    with pytest.raises(ValueError, match="'mu'"):
        val.check_mu(np.ones(2))
    with pytest.raises(ValueError, match="positive integer"):
        val.check_intmax(0, "particles")
    with pytest.raises(ValueError, match="do not want"):
        val.check_intmax(10 ** 9, "iter")
    assert val.check_intmax(5.0, "iter") == 5
    with pytest.raises(ValueError, match="positive real"):
        val.check_positive_real(-1.0, "conv_tol")
    with pytest.raises(TypeError, match="Prior"):
        val.check_prior(3.0, "sd_level")
    val.check_prior(normal_prior(0, 0, 1), "sd_level")
    with pytest.raises(ValueError, match="Missing values"):
        val.check_missingness({"T": np.array([1.0, np.nan])})
    with pytest.raises(ValueError, match="Non-integer"):
        val.check_distribution(np.array([[1.0, 2.5]]).T.repeat(2, 1),
                               ["poisson", "poisson"])


def test_constructor_rejections():
    with pytest.raises(ValueError):
        ssm_ulg(Y, Z=np.ones((2, 3)), H=1.0, T=np.eye(2), R=np.eye(2))
    with pytest.raises(ValueError):
        ssm_ulg(Y, Z=np.ones(2), H=np.ones(3), T=np.eye(2), R=np.eye(2))
    with pytest.raises(ValueError):
        ssm_ulg(Y, Z=np.ones(2), H=1.0, T=np.eye(3), R=np.eye(2))
    with pytest.raises(ValueError):
        ssm_ulg(Y, Z=np.ones(2), H=1.0, T=np.eye(2), R=np.ones((2, 3)))
    with pytest.raises(ValueError, match="Missing values"):
        ssm_ulg(Y, Z=np.array([1.0, np.nan]), H=1.0, T=np.eye(2),
                R=np.eye(2))
    with pytest.raises(ValueError, match="positive finite"):
        ssm_ung(Y, Z=np.ones(1), T=np.ones((1, 1)), R=np.ones((1, 1)),
                distribution="poisson", u=-1.0)
    with pytest.raises(ValueError, match="Negative or non-integer"):
        ssm_ung(-Y, Z=np.ones(1), T=np.ones((1, 1)), R=np.ones((1, 1)),
                distribution="poisson")
    ymv = np.column_stack([Y, Y])
    with pytest.raises(ValueError):
        ssm_mlg(ymv, Z=np.ones((3, 2)), H=np.eye(2), T=np.eye(2),
                R=np.eye(2))
    with pytest.raises(ValueError):
        ssm_mlg(ymv, Z=np.ones((2, 2)), H=np.eye(3), T=np.eye(2),
                R=np.eye(2))
    with pytest.raises(ValueError, match="Non-integer"):
        ssm_mng(ymv + 0.5, Z=np.ones((2, 2)), T=np.eye(2), R=np.eye(2),
                distributions="poisson")
    with pytest.raises(ValueError, match="period"):
        bsm_lg(Y, sd_y=1.0, sd_level=1.0, sd_seasonal=1.0, period=2)
    with pytest.raises(ValueError, match="xreg"):
        bsm_lg(Y, sd_y=1.0, sd_level=1.0, xreg=np.ones((3, 1)),
               beta=normal_prior(0, 0, 1))
    with pytest.raises(ValueError, match="number of columns"):
        bsm_ng(Y, sd_level=1.0, distribution="poisson",
               xreg=np.ones((10, 2)), beta=normal_prior(0, 0, 1))
    with pytest.raises(ValueError, match="xreg"):
        ar1_lg(Y, rho=normal_prior(0.5, 0, 1), sigma=normal_prior(1, 0, 1),
               mu=normal_prior(0, 0, 1), sd_y=normal_prior(1, 0, 1),
               xreg=np.ones((3, 1)), beta=normal_prior(0, 0, 1))


def test_constructor_accepts_normalised_layouts():
    # scalar Z with m=1; time-varying Z (m, n)
    m1 = ssm_ulg(Y, Z=1.0, H=0.5, T=1.0, R=0.3)
    s = m1.build(m1.theta_init)
    assert s.Z.shape == (1, 1) and s.T.shape == (1, 1, 1)
    Zt = np.ones((2, Y.shape[0]))
    m2 = ssm_ulg(Y, Z=Zt, H=0.5, T=np.eye(2), R=np.eye(2))
    s2 = m2.build(m2.theta_init)
    assert s2.Z.shape == (Y.shape[0], 2)
