# %% [markdown]
# # CVI-DP: variational inference for a double-well diffusion
# The AISTATS 2024 paper's main experiment (reference:
# `docs/diffusion_processes/cvi_dp.py`): infer the latent path of a
# double-well SDE from sparse noisy observations with site-based CVI,
# alternating site updates and prior re-linearization.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.exp.metrics import grid_indices, nlpd, rmse
from vi_diffusion_processes_tpu.likelihoods import Gaussian
from vi_diffusion_processes_tpu.models import CVISitesSDE
from vi_diffusion_processes_tpu.optim import CVISitesTrainer
from vi_diffusion_processes_tpu.sde import DoubleWellSDE, euler_maruyama

key = jax.random.PRNGKey(42)
sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]]))
grid = jnp.linspace(0.0, 4.0, 401)
path = euler_maruyama(sde, jnp.asarray([1.0]), grid, key)

obs_idx = np.arange(10, 400, 15)
obs_t = grid[obs_idx]
obs_y = path[obs_idx] + 0.2 * jax.random.normal(jax.random.fold_in(key, 1), (len(obs_idx), 1))

# %% inference
model = CVISitesSDE.initialize_sde(
    sde, grid, (obs_t, obs_y), Gaussian(variance=jnp.asarray(0.04))
)
trainer = CVISitesTrainer(model, sites_lr=0.5, max_inner_iters=10, max_outer_iters=4)
elbos = trainer.optimize()
print("ELBO trace:", [round(e, 2) for e in elbos])

# %% evaluate against the true latent path
means, covs = trainer.model.dist_q.marginals()
print("RMSE vs latent path:", float(rmse(means[:, 0], path[:, 0])))
assert float(rmse(means[:, 0], path[:, 0])) < 0.5
