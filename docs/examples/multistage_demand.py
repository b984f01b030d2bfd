# %% [markdown]
# # Intermittent demand forecasting with the MultiStage likelihood
# Reference: `docs/notebooks/markovflow_multistage.py` — three latent GPs
# drive a Bernoulli/Bernoulli/Poisson decision tree over count data.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import IndependentMultiOutput, Matern32
from vi_diffusion_processes_tpu.likelihoods import MultiStageLikelihood
from vi_diffusion_processes_tpu.models import VariationalGaussianProcess
from vi_diffusion_processes_tpu.optim import natgrad_init, natgrad_step

key = jax.random.PRNGKey(11)
rng = np.random.default_rng(11)
t = jnp.asarray(np.sort(rng.uniform(0, 5, 80)))

# simulate demand from the generative model
lik = MultiStageLikelihood()
f_true = jnp.stack(
    [jnp.sin(1.5 * t), jnp.cos(2.0 * t), 0.3 * t - 0.5], axis=-1
)
y = lik.sample_y(f_true, key)
print("counts histogram:", np.bincount(np.asarray(y[:, 0]).astype(int), minlength=5)[:5])

# %% three independent latent GPs (one per likelihood stage)
mk = lambda: Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
kernel = IndependentMultiOutput(kernels=(mk(), mk(), mk()))
vgp = VariationalGaussianProcess.initialize(kernel, lik, t, y)

q = vgp.dist_q
state = natgrad_init(q)
step = jax.jit(
    lambda q, s: natgrad_step(lambda d: vgp.loss(d), q, gamma=0.2, state=s)
)
losses = []
for _ in range(25):
    q, state, loss = step(q, state)
    losses.append(float(loss))
print(f"-ELBO: {losses[0]:.1f} -> {losses[-1]:.1f}")
assert losses[-1] < losses[0]
