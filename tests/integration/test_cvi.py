"""CVI model tests (mirrors the reference's tests/integration/models/
CVI coverage): conjugate exactness in one full step, two ELBO paths agree at
convergence, non-conjugate monotone improvement."""
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.likelihoods.discrete import Poisson
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.cvi import CVIGaussianProcess
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression

NOISE = 0.08


def make_data(rng, n=25):
    t = np.sort(rng.uniform(0, 4, size=n))
    y = (np.sin(2 * t) + 0.2 * rng.normal(size=n))[:, None]
    return jnp.asarray(t), jnp.asarray(y)


def test_cvi_gaussian_one_step_exact(rng):
    """With a Gaussian likelihood and lr=1, one site update recovers the
    exact sites, so elbo == GPR log marginal likelihood."""
    t, y = make_data(rng)
    kernel = Matern32(lengthscale=jnp.asarray(0.9), variance=jnp.asarray(1.1))
    model = CVIGaussianProcess.initialize(
        kernel, Gaussian(variance=jnp.asarray(NOISE)), t, y, learning_rate=1.0
    )
    model = model.update_sites()

    gpr = GaussianProcessRegression(
        kernel=kernel,
        time_points=t,
        observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    np.testing.assert_allclose(model.elbo(), gpr.log_likelihood(), rtol=1e-8)
    np.testing.assert_allclose(model.classic_elbo(), gpr.log_likelihood(), rtol=1e-8)

    # posterior marginals match the exact ones
    q_means, q_covs = model.dist_q.marginals()
    p_means, p_covs = gpr.posterior_state_space_model().marginals()
    np.testing.assert_allclose(q_means, p_means, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(q_covs, p_covs, rtol=1e-6, atol=1e-8)


def test_cvi_poisson_improves(rng):
    t = jnp.asarray(np.sort(rng.uniform(0, 4, size=30)))
    f = np.sin(2 * np.asarray(t))
    y = jnp.asarray(rng.poisson(np.exp(f))[:, None].astype(np.float64))
    kernel = Matern32(lengthscale=jnp.asarray(0.9), variance=jnp.asarray(1.0))
    model = CVIGaussianProcess.initialize(kernel, Poisson(), t, y, learning_rate=0.5)
    elbos = [float(model.classic_elbo())]
    for _ in range(15):
        model = model.update_sites()
        elbos.append(float(model.classic_elbo()))
    assert elbos[-1] > elbos[0]
    # the ELBO improves monotonically after warm-up (CVI fixed point)
    assert elbos[-1] >= elbos[-2] - 1e-8
