# %% [markdown]
# # Sparse variational GP classification
# Reference: `docs/notebooks/markovflow_sparse_variational.py` — Bernoulli
# observations, inducing points in time, natural-gradient-free Adam training
# of the variational state space model.

# %%
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vi_diffusion_processes_tpu.kernels import Matern32
from vi_diffusion_processes_tpu.likelihoods import Bernoulli
from vi_diffusion_processes_tpu.models import SparseVariationalGaussianProcess

rng = np.random.default_rng(1)
t = jnp.asarray(np.sort(rng.uniform(0, 6, 120)))
p = jax.nn.sigmoid(3.0 * jnp.sin(2.0 * t))
y = jnp.asarray(rng.random(120) < np.asarray(p), jnp.float64)[:, None]

z = jnp.linspace(0.0, 6.0, 20)
model = SparseVariationalGaussianProcess.initialize(
    Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(3.0)),
    Bernoulli(),
    z,
    num_data=120,
)

# %% train q with Adam on the ELBO
opt = optax.adam(0.08)
state = opt.init(model.dist_q)
loss = jax.jit(lambda q: -model.replace(dist_q=q).elbo((t, y)))

@jax.jit
def step(q, s):
    g = jax.grad(loss)(q)
    updates, s = opt.update(g, s)
    return optax.apply_updates(q, updates), s

q = model.dist_q
l0 = float(loss(q))
for _ in range(100):
    q, state = step(q, state)
l1 = float(loss(q))
print(f"-ELBO: {l0:.2f} -> {l1:.2f}")
assert l1 < l0

# %% predicted class probabilities
model = model.replace(dist_q=q)
f_mu, f_var = model.posterior.predict_f(t)
probs = jax.nn.sigmoid(f_mu[:, 0])
acc = float(jnp.mean((probs > 0.5) == (y[:, 0] > 0.5)))
print("train accuracy:", acc)
assert acc > 0.7
