"""Round-trip tests for ssm ↔ expectations ↔ naturals (mirrors
tests/unit/test_ssm_gaussian_transformations.py of the reference)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.ops.btd import btd_matvec
from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel
from vi_diffusion_processes_tpu.ssm.transforms import (
    expectations_to_ssm_params,
    naturals_to_ssm_params,
    naturals_to_ssm_params_no_smoothing,
    ssm_to_expectations,
    ssm_to_naturals,
    ssm_to_naturals_no_smoothing,
)

from ..tools.oracles import random_ssm_params

N, D = 6, 2


@pytest.fixture
def ssm(rng, batch_shape):
    params = random_ssm_params(rng, batch_shape, N, D)
    return StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})


def assert_ssm_params_close(ssm, params, rtol=1e-7, atol=1e-9):
    a_s, offsets, chol_p0, chol_qs, mu0 = params
    np.testing.assert_allclose(a_s, ssm.state_transitions, rtol=rtol, atol=atol)
    np.testing.assert_allclose(offsets, ssm.state_offsets, rtol=rtol, atol=atol)
    np.testing.assert_allclose(chol_p0, ssm.chol_initial_covariance, rtol=rtol, atol=atol)
    np.testing.assert_allclose(chol_qs, ssm.chol_process_covariances, rtol=rtol, atol=atol)
    np.testing.assert_allclose(mu0, ssm.initial_mean, rtol=rtol, atol=atol)


def test_expectations_roundtrip(ssm):
    etas = ssm_to_expectations(ssm)
    assert_ssm_params_close(ssm, expectations_to_ssm_params(*etas))


def test_naturals_roundtrip(ssm):
    thetas = ssm_to_naturals(ssm)
    assert_ssm_params_close(ssm, naturals_to_ssm_params(*thetas))


def test_naturals_no_smoothing_roundtrip(ssm):
    thetas = ssm_to_naturals_no_smoothing(ssm)
    assert_ssm_params_close(ssm, naturals_to_ssm_params_no_smoothing(*thetas))


def test_naturals_consistent_with_precision(ssm):
    """Θ must encode the precision: K = (−2Θ_diag, −Θ_sub), K μ = θ."""
    theta_linear, theta_diag, theta_sub = ssm_to_naturals(ssm)
    prec = ssm.precision()
    np.testing.assert_allclose(prec.diag, -2.0 * theta_diag, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(prec.sub, -theta_sub, rtol=1e-8, atol=1e-10)
    means, _ = ssm.marginals()
    np.testing.assert_allclose(
        btd_matvec(prec, means), theta_linear, rtol=1e-7, atol=1e-9
    )
