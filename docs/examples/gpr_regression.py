# %% [markdown]
# # Exact GP regression with state-space kernels
# Equivalent of the reference's `docs/notebooks/markovflow_gpr.py` tutorial:
# fit an exact GP to noisy observations with a Matern-3/2 kernel, train the
# hyperparameters, and predict at new time points.

# %%
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vi_diffusion_processes_tpu.kernels import Matern32
from vi_diffusion_processes_tpu.models import GaussianProcessRegression

N = int(jnp.asarray(60))  # dataset size

rng = np.random.default_rng(0)
t = jnp.asarray(np.sort(rng.uniform(0.0, 5.0, N)))
y = jnp.asarray(np.sin(2 * np.asarray(t))[:, None] + 0.2 * rng.normal(size=(N, 1)))

# %% fit
def make_model(kernel):
    return GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[0.2]]),
    )

kernel = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
loss_fn = jax.jit(lambda k: make_model(k).loss())
opt = optax.adam(0.05)
state = opt.init(kernel)

@jax.jit
def train_step(k, s):
    g = jax.grad(lambda kk: make_model(kk).loss())(k)
    updates, s = opt.update(g, s)
    return optax.apply_updates(k, updates), s

print("initial loss:", float(loss_fn(kernel)))
for _ in range(60):
    kernel, state = train_step(kernel, state)
print("trained loss:", float(loss_fn(kernel)))
print("lengthscale:", float(kernel.lengthscale), "variance:", float(kernel.variance))

# %% predict
t_new = jnp.linspace(-0.5, 5.5, 100)
f_mu, f_var = make_model(kernel).posterior.predict_f(t_new)
assert np.isfinite(np.asarray(f_mu)).all()
print("predictions:", np.asarray(f_mu[:3, 0]))
