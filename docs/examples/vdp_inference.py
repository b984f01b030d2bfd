# %% [markdown]
# # VDP: Archambeau-style variational inference for SDEs
# Reference: `docs/diffusion_processes/vi_markov_gp.py` — approximate the
# posterior of a nonlinear diffusion with a time-varying linear SDE via
# fixed-point iteration on (A, b) with backward Lagrange ODEs.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.likelihoods import Gaussian
from vi_diffusion_processes_tpu.models import VariationalMarkovGP
from vi_diffusion_processes_tpu.optim import VDPTrainer
from vi_diffusion_processes_tpu.sde import BenesSDE, euler_maruyama

key = jax.random.PRNGKey(3)
sde = BenesSDE(theta=jnp.asarray(1.0), q_mat=jnp.asarray([[0.5]]))
grid = jnp.linspace(0.0, 3.0, 301)
path = euler_maruyama(sde, jnp.asarray([0.5]), grid, key)
obs_idx = np.arange(10, 300, 12)
obs_t = grid[obs_idx]
obs_y = path[obs_idx] + 0.2 * jax.random.normal(jax.random.fold_in(key, 9), (len(obs_idx), 1))

# %% inference with the warmup + lr-decay schedule
model = VariationalMarkovGP.initialize(
    (obs_t, obs_y), sde, grid, Gaussian(variance=jnp.asarray(0.04))
)
trainer = VDPTrainer(model, lr=0.02, max_iters=150)
elbo = trainer.perform_inference()
print("final ELBO:", elbo)

m, s = trainer.model.forward_pass()
err = float(jnp.sqrt(jnp.mean((m[:, 0] - path[:, 0]) ** 2)))
print("RMSE vs latent path:", err)
assert err < 0.6
