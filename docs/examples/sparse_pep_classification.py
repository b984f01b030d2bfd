# %% [markdown]
# # Sparse Power Expectation Propagation classification
# Reference: `docs/notebooks/markovflow_sparse_pep.py` — binary
# classification with a Bernoulli likelihood and PEP sites living on M
# inducing points (pair-site naturals on the inducing chain), α-power EP
# updates plus Adam on the kernel hyperparameters through the PEP energy.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import Matern52
from vi_diffusion_processes_tpu.likelihoods import Bernoulli
from vi_diffusion_processes_tpu.likelihoods.pep import PEPScalarLikelihood
from vi_diffusion_processes_tpu.models.sparse_pep import (
    SparsePowerExpectationPropagation,
)

rng = np.random.default_rng(0)
num_data, num_inducing = 120, 25
t = np.linspace(0.0, 1.0, num_data)
f_true = np.cos(t * 20.0)
y = jnp.asarray(((f_true + rng.normal(size=num_data)) > 0).astype(float)[:, None])
t = jnp.asarray(t)
z = jnp.asarray(np.linspace(0.0, 1.0, num_inducing))
data = (t, y)

model = SparsePowerExpectationPropagation.initialize(
    kernel=Matern52(lengthscale=jnp.asarray(0.08), variance=jnp.asarray(1.0)),
    likelihood=PEPScalarLikelihood(base=Bernoulli()),
    inducing_points=z,
    alpha=1.0,
    learning_rate=0.5,
)

# %% run PEP site updates on the inducing chain to a fixed point
update = jax.jit(lambda m: m.update_sites(data))
e0 = float(model.classic_elbo(data))
for _ in range(15):
    model = update(model)
e1 = float(model.classic_elbo(data))
print(f"objective: {e0:.2f} -> {e1:.2f}")
assert e1 > e0

energy = float(model.energy(data))
print("PEP energy:", energy)
assert np.isfinite(energy)

# %% the sparse posterior recovers the class structure on the full grid
f_mu, f_var = model.posterior.predict_f(t)
acc = float(jnp.mean((f_mu[:, 0] > 0) == (y[:, 0] > 0.5)))
bayes = float(np.mean((f_true > 0) == (np.asarray(y[:, 0]) > 0.5)))
print(f"training accuracy: {acc:.3f} (Bayes classifier: {bayes:.3f})")
assert acc > bayes - 0.1

# latent correlation with the generating function
corr = float(np.corrcoef(np.asarray(f_mu[:, 0]), f_true)[0, 1])
print("corr(f_pred, f_true):", round(corr, 3))
assert corr > 0.6
