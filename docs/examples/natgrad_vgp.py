# %% [markdown]
# # Natural-gradient VGP
# Reference: `docs/notebooks/markovflow_variational.py` + the natgrad
# exactness property (tests/integration/test_ssm_natgrad.py): one step with
# γ=1 on a conjugate model reaches the exact posterior.

# %%
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import Matern12
from vi_diffusion_processes_tpu.likelihoods import Gaussian
from vi_diffusion_processes_tpu.models import (
    GaussianProcessRegression,
    VariationalGaussianProcess,
)
from vi_diffusion_processes_tpu.optim import natgrad_step

rng = np.random.default_rng(7)
t = jnp.asarray(np.sort(rng.uniform(0, 4, 40)))
y = jnp.asarray(np.sin(2 * np.asarray(t))[:, None] + 0.2 * rng.normal(size=(40, 1)))

kernel = Matern12(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.0))
vgp = VariationalGaussianProcess.initialize(kernel, Gaussian(variance=jnp.asarray(0.04)), t, y)

# %% one γ=1 natgrad step == exact inference
q1, _, loss0 = natgrad_step(lambda q: vgp.loss(q), vgp.dist_q, gamma=1.0)
gpr = GaussianProcessRegression(
    kernel=kernel, time_points=t, observations=y, chol_obs_covariance=jnp.asarray([[0.2]])
)
print("ELBO after one step:", float(vgp.elbo(q1)))
print("exact log marginal: ", float(gpr.log_likelihood()))
np.testing.assert_allclose(float(vgp.elbo(q1)), float(gpr.log_likelihood()), atol=1e-5)
print("natgrad one-step exactness holds ✓")
