# %% [markdown]
# # Stacked kernels: multiple series in one model
# Reference: `docs/notebooks/stacked_kernels.py` — a stacked kernel adds a
# leading batch axis so S independent chains (one per output column) are
# filtered together; data are ``[N, S]`` with the stack axis trailing.
# On TPU the stack axis is a pure batch dim — every scan/matmul vectorizes
# over it for free.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import (
    IndependentMultiOutputStack,
    Matern12,
    Matern32,
)
from vi_diffusion_processes_tpu.likelihoods import Gaussian
from vi_diffusion_processes_tpu.models import SparseVariationalGaussianProcess
from vi_diffusion_processes_tpu.optim import natgrad_step

rng = np.random.default_rng(13)
n = 80
t = jnp.asarray(np.sort(rng.uniform(0, 4, n)))
f_true = np.stack(
    [np.sin(2 * np.asarray(t)), np.cos(np.asarray(t)) * np.asarray(t) / 2.0], axis=-1
)
y = jnp.asarray(f_true + 0.1 * rng.normal(size=(n, 2)))

# one rough chain, one smooth chain — different state dims are zero-padded
kernel = IndependentMultiOutputStack(kernels=(
    Matern12(lengthscale=jnp.asarray(0.6), variance=jnp.asarray(1.0)),
    Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0)),
))
model = SparseVariationalGaussianProcess.initialize(
    kernel, Gaussian(variance=jnp.asarray(0.01)), inducing_points=jnp.linspace(0, 4, 25)
)
print("stacked q(s) batch shape:", model.dist_q.batch_shape)

# %% natgrad fit — the batched SSM is updated in one shot
data = (t, y)


@jax.jit
def step(q):
    new_q, _, loss = natgrad_step(
        lambda qq: model.replace(dist_q=qq).loss(data), q, gamma=0.5
    )
    return new_q, loss


q = model.dist_q
print("initial ELBO:", float(model.elbo(data)))
for _ in range(10):
    q, loss = step(q)
model = model.replace(dist_q=q)
print("fitted ELBO: ", -float(loss))

# %% both series are recovered by their own chain
f_mu, f_var = model.posterior.predict_f(t)
assert f_mu.shape == (n, 2)
for s in range(2):
    corr = np.corrcoef(np.asarray(f_mu[:, s]), f_true[:, s])[0, 1]
    print(f"series {s}: corr with truth = {corr:.3f}")
    assert corr > 0.95
