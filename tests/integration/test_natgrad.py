"""Natural-gradient exactness: one step with γ=1 on a conjugate model lands
on the exact posterior (mirrors tests/integration/test_ssm_natgrad.py:46-66
of the reference)."""
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression
from vi_diffusion_processes_tpu.models.variational import VariationalGaussianProcess
from vi_diffusion_processes_tpu.optim.natgrad import natgrad_step

NOISE = 0.05


def make_data(rng, n=30):
    t = np.sort(rng.uniform(0, 4, size=n))
    y = (np.sin(2 * t) + 0.2 * rng.normal(size=n))[:, None]
    return jnp.asarray(t), jnp.asarray(y)


def test_one_step_natgrad_reaches_gpr(rng):
    t, y = make_data(rng)
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.2))

    vgp = VariationalGaussianProcess.initialize(
        kernel, Gaussian(variance=jnp.asarray(NOISE)), t, y
    )
    new_q, _, _ = natgrad_step(lambda q: vgp.loss(q), vgp.dist_q, gamma=1.0)

    gpr = GaussianProcessRegression(
        kernel=kernel,
        time_points=t,
        observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    # ELBO at the one-step q equals the exact log marginal likelihood
    elbo = vgp.elbo(new_q)
    np.testing.assert_allclose(elbo, gpr.log_likelihood(), atol=1e-5)

    # and q equals the exact posterior marginals
    post = gpr.posterior_state_space_model()
    means_q, covs_q = new_q.marginals()
    means_p, covs_p = post.marginals()
    np.testing.assert_allclose(means_q, means_p, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(covs_q, covs_p, rtol=1e-6, atol=1e-8)


def test_natgrad_with_momentum_converges(rng):
    from vi_diffusion_processes_tpu.optim.natgrad import natgrad_init

    t, y = make_data(rng, n=20)
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.2))
    vgp = VariationalGaussianProcess.initialize(
        kernel, Gaussian(variance=jnp.asarray(NOISE)), t, y
    )
    q = vgp.dist_q
    state = natgrad_init(q)
    losses = []
    for _ in range(20):
        q, state, loss = natgrad_step(lambda d: vgp.loss(d), q, gamma=0.5, state=state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
