"""Kalman API parity layer (KalmanFilter / WithSites / WithSparseSites)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression
from vi_diffusion_processes_tpu.parallel.kalman import (
    KalmanFilter,
    KalmanFilterWithSites,
    KalmanFilterWithSparseSites,
)
from vi_diffusion_processes_tpu.parallel.sites import GaussianSites

NOISE = 0.1


@pytest.fixture
def setup(rng):
    t = jnp.asarray(np.sort(rng.uniform(0, 4, size=25)))
    y = jnp.asarray((np.sin(2 * np.asarray(t)) + 0.3 * rng.normal(size=25))[:, None])
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.2))
    return kernel, t, y


def test_kalman_filter_matches_gpr(setup):
    kernel, t, y = setup
    kf = KalmanFilter(
        state_space_model=kernel.state_space_model(t),
        emission_model=kernel.generate_emission_model(t),
        observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    gpr = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    np.testing.assert_allclose(kf.log_likelihood(), gpr.log_likelihood(), rtol=1e-10)
    m1, c1 = kf.posterior_state_space_model().marginals()
    m2, c2 = gpr.posterior_state_space_model().marginals()
    np.testing.assert_allclose(m1, m2, rtol=1e-9)


def test_sites_filter_matches_gaussian_filter(setup):
    """Sites with θ₂ = −1/(2σ²), θ₁ = y/σ² reproduce Gaussian observations
    (kalman_filter.py:440 semantics)."""
    kernel, t, y = setup
    ssm = kernel.state_space_model(t)
    emission = kernel.generate_emission_model(t)
    sites = GaussianSites(
        nat1=y / NOISE,
        nat2=jnp.broadcast_to(-0.5 / NOISE * jnp.eye(1), y.shape + (1,)),
    )
    kf_sites = KalmanFilterWithSites(
        state_space_model=ssm, emission_model=emission, sites=sites
    )
    kf = KalmanFilter(
        state_space_model=ssm, emission_model=emission, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    np.testing.assert_allclose(kf_sites.log_likelihood(), kf.log_likelihood(), rtol=1e-10)


def test_sparse_sites_on_dense_grid(setup, rng):
    """Sparse sites on a dense grid == dense filter restricted to the
    observed subset (kalman_filter.py:504-639)."""
    kernel, t_obs, y = setup
    # dense grid containing the observation times
    grid = jnp.asarray(np.sort(np.concatenate([np.asarray(t_obs), np.linspace(0, 4, 40)])))
    obs_idx = jnp.searchsorted(grid, t_obs)
    ssm = kernel.state_space_model(grid)
    emission = kernel.generate_emission_model(grid)
    sites = GaussianSites(
        nat1=y / NOISE,
        nat2=jnp.broadcast_to(-0.5 / NOISE * jnp.eye(1), y.shape + (1,)),
    )
    kf_sparse = KalmanFilterWithSparseSites(
        state_space_model=ssm, emission_model=emission, sites=sites, obs_indices=obs_idx
    )
    gpr = GaussianProcessRegression(
        kernel=kernel, time_points=t_obs, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    # marginal likelihood is invariant to adding unobserved grid points
    np.testing.assert_allclose(kf_sparse.log_likelihood(), gpr.log_likelihood(), rtol=1e-8)
    # posterior at the observed points matches
    post_dense = kf_sparse.posterior_state_space_model()
    means_dense, _ = post_dense.marginals()
    means_obs, _ = gpr.posterior_state_space_model().marginals()
    np.testing.assert_allclose(
        jnp.take(means_dense, obs_idx, axis=0), means_obs, rtol=1e-6, atol=1e-9
    )
