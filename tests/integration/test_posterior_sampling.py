"""Posterior sampling (Matheron delta correction) and SparsePEP coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.likelihoods.pep import PEPGaussian
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression
from vi_diffusion_processes_tpu.models.sparse_pep import SparsePowerExpectationPropagation

NOISE = 0.1


@pytest.fixture
def fitted_gpr(rng):
    t = np.sort(rng.uniform(0, 4, size=20))
    y = (np.sin(2 * t) + 0.3 * rng.normal(size=20))[:, None]
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.2))
    return GaussianProcessRegression(
        kernel=kernel,
        time_points=jnp.asarray(t),
        observations=jnp.asarray(y),
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )


def test_matheron_samples_match_posterior_moments(fitted_gpr, key):
    """Joint posterior samples at new points must reproduce predict_f
    marginals (mean and variance) — validates the delta correction."""
    post = fitted_gpr.posterior
    t_new = jnp.asarray(np.linspace(0.5, 3.5, 7))
    f = post.sample_f(t_new, key, (20_000,))
    want_mean, want_var = post.predict_f(t_new)
    np.testing.assert_allclose(f.mean(0), want_mean, atol=4e-2)
    np.testing.assert_allclose(f.var(0), want_var, rtol=0.1)


def test_matheron_joint_covariance(fitted_gpr, key):
    """Cross-covariances between two sampled points must match the exact
    joint posterior (not just the marginals) — the property the naive
    independent-conditional sampler would violate."""
    post = fitted_gpr.posterior
    # two new points INSIDE the same inducing interval
    t_pts = np.asarray(fitted_gpr.time_points)
    mid = (t_pts[7] + t_pts[8]) / 2
    t_new = jnp.asarray([t_pts[7] + 0.25 * (t_pts[8] - t_pts[7]), mid])
    samples = post.sample_state(t_new, key, (40_000,))[..., 0]
    emp_cov = np.cov(np.asarray(samples).T)

    # exact joint: append both points to the grid and compute the posterior
    t_all = np.sort(np.concatenate([t_pts, np.asarray(t_new)]))
    idx = np.searchsorted(t_all, np.asarray(t_new))
    model2 = GaussianProcessRegression(
        kernel=fitted_gpr.kernel,
        time_points=jnp.asarray(t_all),
        observations=jnp.asarray(
            np.insert(np.asarray(fitted_gpr.observations)[:, 0], np.searchsorted(t_pts, np.asarray(t_new)), 0.0)
        )[:, None],
        chol_obs_covariance=fitted_gpr.chol_obs_covariance,
    )
    # instead of pseudo observations, use sites: easier — exact joint via
    # filter with zero sites at the new points
    from vi_diffusion_processes_tpu.parallel.pskf import filter_smoother_with_sites
    from vi_diffusion_processes_tpu.parallel.sites import gaussian_observation_sites

    prior = fitted_gpr.kernel.state_space_model(jnp.asarray(t_all))
    emission = fitted_gpr.kernel.generate_emission_model(jnp.asarray(t_all))
    obs_mask = np.isin(t_all, t_pts)
    y_dense = np.zeros((len(t_all), 1))
    y_dense[obs_mask] = np.asarray(fitted_gpr.observations)
    nat1, nat2, _ = gaussian_observation_sites(
        emission.emission_matrix, fitted_gpr.chol_obs_covariance, jnp.asarray(y_dense)
    )
    mask = jnp.asarray(obs_mask, nat1.dtype)
    nat1 = nat1 * mask[:, None]
    nat2 = nat2 * mask[:, None, None]
    _, smooth = filter_smoother_with_sites(prior, nat1, nat2)
    want_var = np.asarray(smooth.covs)[idx, 0, 0]
    want_cross = np.asarray(smooth.gains[idx[0]] @ smooth.covs[idx[1]])[0, 0]
    # (idx[1] = idx[0] + 1 since the two points are adjacent in the union)
    np.testing.assert_allclose(np.diag(emp_cov), want_var, rtol=0.1)
    np.testing.assert_allclose(emp_cov[0, 1], want_cross, rtol=0.15)


def test_sparse_pep_gaussian_improves(rng):
    t = np.sort(rng.uniform(0, 4, size=30))
    y = (np.sin(2 * t) + 0.3 * rng.normal(size=30))[:, None]
    z = jnp.asarray(np.linspace(0.0, 4.0, 10))
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.2))
    model = SparsePowerExpectationPropagation.initialize(
        kernel,
        PEPGaussian(base=Gaussian(variance=jnp.asarray(NOISE))),
        z,
        alpha=0.8,
        learning_rate=0.3,
    )
    data = (jnp.asarray(t), jnp.asarray(y))
    e0 = float(model.classic_elbo(data))
    for _ in range(10):
        model = model.update_sites(data)
    e1 = float(model.classic_elbo(data))
    assert e1 > e0
    energy = float(model.energy(data))
    assert np.isfinite(energy)
    # predictions are sane
    f_mu, f_var = model.posterior.predict_f(jnp.asarray(t))
    corr = np.corrcoef(np.asarray(f_mu[:, 0]), y[:, 0])[0, 1]
    assert corr > 0.7
