# %% [markdown]
# # Spatio-temporal sparse CVI
# Reference: `docs/notebooks/markovflow_spatio_temporal.py` — a factor
# kernel k((s,t),(s',t')) = kₛ(s,s')·kₜ(t,t') with spatial inducing points
# and a Markovian temporal chain, fitted with CVI site updates.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import Matern32, SpatialRBF
from vi_diffusion_processes_tpu.likelihoods import Gaussian
from vi_diffusion_processes_tpu.models import SpatioTemporalSparseCVI

rng = np.random.default_rng(5)
n = 80
x_space = rng.uniform(0, 1, size=(n, 1))
t = np.sort(rng.uniform(0, 3, size=n))
f_true = np.sin(2 * t) * np.cos(3 * x_space[:, 0])
y = jnp.asarray((f_true + 0.1 * rng.normal(size=n))[:, None])
inputs = jnp.asarray(np.concatenate([x_space, t[:, None]], axis=-1))

model = SpatioTemporalSparseCVI.initialize(
    inducing_space=jnp.linspace(0.05, 0.95, 6)[:, None],
    inducing_time=jnp.linspace(0.0, 3.0, 10),
    kernel_space=SpatialRBF(variance=jnp.asarray(1.0), lengthscale=jnp.asarray(0.4)),
    kernel_time=Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0)),
    likelihood=Gaussian(variance=jnp.asarray(0.05)),
    learning_rate=0.4,
)

# %% fit
update = jax.jit(lambda m: m.update_sites((inputs, y)))
print("initial ELBO:", float(model.elbo((inputs, y))))
for _ in range(12):
    model = update(model)
print("fitted ELBO: ", float(model.elbo((inputs, y))))

f_mu, f_var = model.space_time_predict_f(inputs)
corr = np.corrcoef(np.asarray(f_mu[:, 0]), f_true)[0, 1]
print("correlation with the true field:", round(corr, 3))
assert corr > 0.8
