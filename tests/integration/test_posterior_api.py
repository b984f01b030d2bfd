"""Posterior API behaviors mirrored from the reference's
tests/integration/test_posterior.py (sample shapes, mean functions) and
tests/integration/models/test_variational.py (VGP ≡ GPR across the
batch × output-dim grid).

The reference reaches VGP=GPR by Adam-looping up to 10k steps
(test_variational.py:137-153); here conjugate natgrad one-step exactness
lands on the same optimum in a single γ=1 step, so the whole grid runs in
seconds while asserting the same identity.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.base import IndependentMultiOutput
from vi_diffusion_processes_tpu.kernels.matern import Matern12, Matern32
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression
from vi_diffusion_processes_tpu.models.variational import VariationalGaussianProcess
from vi_diffusion_processes_tpu.optim.natgrad import natgrad_step
from vi_diffusion_processes_tpu.ssm.mean_functions import LinearMeanFunction

NOISE = 0.4


@pytest.fixture
def fitted_gpr(rng):
    t = np.sort(rng.uniform(0, 4, size=12))
    y = (np.sin(2 * t) + 0.3 * rng.normal(size=12))[:, None]
    return GaussianProcessRegression(
        kernel=Matern32(lengthscale=jnp.asarray(0.9), variance=jnp.asarray(1.1)),
        time_points=jnp.asarray(t),
        observations=jnp.asarray(y),
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )


def test_zero_samples_returns_zero_samples(fitted_gpr, key):
    """sample_f with an empty sample shape axis returns an empty array
    (reference test_posterior.py:163-169)."""
    t_new = jnp.asarray(np.linspace(4.5, 6.0, 4))
    samples = fitted_gpr.posterior.sample_f(t_new, key, (0,))
    assert samples.size == 0


@pytest.mark.parametrize(
    "sample_shape", [(0,), (1,), (6,), (10, 10), (3, 1), (0, 1), (1, 1, 1), (2, 1, 3)]
)
def test_sample_shapes(fitted_gpr, key, sample_shape):
    """Leading sample axes come out exactly as requested — including
    zero-sized and nested shapes (reference test_posterior.py:172-184)."""
    t_new = jnp.asarray(np.linspace(4.5, 6.0, 5))
    samples = fitted_gpr.posterior.sample_f(t_new, key, sample_shape)
    assert samples.shape == sample_shape + (5, 1)


def test_predict_f_with_mean_function_off_grid(rng):
    """predict_f with a LinearMeanFunction at intermediate AND future time
    points: the latent posterior is mean-corrected on the way in and the
    mean is added back at the new points (reference test_posterior.py:101-118
    checks the same against GPflow; the oracle here is the zero-mean model
    plus the closed-form mean shift)."""
    t = np.sort(rng.uniform(0, 4, size=15))
    coef = 1.1
    f_latent = np.sin(2 * t)
    y = (f_latent + coef * t + 0.3 * rng.normal(size=15))[:, None]
    kernel = Matern32(lengthscale=jnp.asarray(0.9), variance=jnp.asarray(1.1))
    chol_r = jnp.asarray([[np.sqrt(NOISE)]])

    with_mean = GaussianProcessRegression(
        kernel=kernel, time_points=jnp.asarray(t), observations=jnp.asarray(y),
        chol_obs_covariance=chol_r,
        mean_function=LinearMeanFunction(coefficient=jnp.asarray(coef)),
    )
    zero_mean = GaussianProcessRegression(
        kernel=kernel, time_points=jnp.asarray(t),
        observations=jnp.asarray(y) - coef * jnp.asarray(t)[:, None],
        chol_obs_covariance=chol_r,
    )
    # intermediate + future points, like the reference's split
    t_new = jnp.asarray(np.concatenate([np.arange(0.25, 4.0, 0.5), [4.5, 5.0]]))
    mu_m, var_m = with_mean.posterior.predict_f(t_new)
    mu_0, var_0 = zero_mean.posterior.predict_f(t_new)
    np.testing.assert_allclose(mu_m, mu_0 + coef * t_new[:, None], rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(var_m, var_0, rtol=1e-9, atol=1e-12)
    # log-likelihoods agree too (gpr.py mean-corrects the observations)
    np.testing.assert_allclose(
        with_mean.log_likelihood(), zero_mean.log_likelihood(), rtol=1e-9
    )


def _vgp_gpr_pair(rng, batch_shape, output_dim, mean_function=None):
    n = 16
    t = np.sort(rng.uniform(0, 4, size=batch_shape + (n,)), axis=-1)
    y = np.sin(2.0 * t[..., None]) + 0.3 * rng.normal(size=batch_shape + (n, output_dim))
    if mean_function is not None:
        y = y + np.asarray(mean_function(jnp.asarray(t)))
    t, y = jnp.asarray(t), jnp.asarray(y)
    kernel = IndependentMultiOutput(
        kernels=tuple(
            Matern12(lengthscale=jnp.asarray(1.5), variance=jnp.asarray(1.0))
            for _ in range(output_dim)
        )
    )
    gpr = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.sqrt(NOISE) * jnp.eye(output_dim),
        mean_function=mean_function,
    )
    vgp = VariationalGaussianProcess.initialize(
        kernel, Gaussian(variance=jnp.asarray(NOISE)), t, y,
        mean_function=mean_function,
    )
    return vgp, gpr


def test_vgp_reaches_gpr_across_grid(rng, batch_shape, output_dim):
    """VGP with a Gaussian likelihood attains the exact GPR log marginal
    likelihood, across batch shapes × output dims
    (test_variational.py:154-161; conjugate one-step natgrad exactness
    replaces the reference's 10k-step Adam loop)."""
    vgp, gpr = _vgp_gpr_pair(rng, batch_shape, output_dim)
    new_q, _, _ = natgrad_step(lambda q: jnp.sum(vgp.loss(q)), vgp.dist_q, gamma=1.0)
    np.testing.assert_allclose(vgp.elbo(new_q), gpr.log_likelihood(), rtol=1e-8, atol=1e-6)


def test_vgp_reaches_gpr_with_mean_function(rng, output_dim):
    """Same identity with a LinearMeanFunction (test_variational.py:163-169)."""
    mf = LinearMeanFunction(coefficient=jnp.asarray(1.5), obs_dim=output_dim)
    vgp, gpr = _vgp_gpr_pair(rng, (), output_dim, mean_function=mf)
    new_q, _, _ = natgrad_step(lambda q: jnp.sum(vgp.loss(q)), vgp.dist_q, gamma=1.0)
    np.testing.assert_allclose(vgp.elbo(new_q), gpr.log_likelihood(), rtol=1e-8, atol=1e-6)
    # loss is the negative ELBO (test_variational.py:117-121)
    np.testing.assert_allclose(vgp.loss(new_q), -vgp.elbo(new_q), rtol=1e-12)
