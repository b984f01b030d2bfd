# %% [markdown]
# # Power Expectation Propagation for classification
# Reference: `docs/notebooks/markovflow_pep.py` — binary classification with
# a Bernoulli likelihood wrapped in α-power EP sites (α interpolates between
# EP (α=1) and VI (α→0)).

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import Matern52
from vi_diffusion_processes_tpu.likelihoods import Bernoulli
from vi_diffusion_processes_tpu.likelihoods.pep import PEPScalarLikelihood
from vi_diffusion_processes_tpu.models import PowerExpectationPropagation

rng = np.random.default_rng(3)
n = 100
t = np.sort(rng.uniform(0, 6, size=n))
f_true = 4.0 * np.sin(1.5 * t)
y = jnp.asarray((rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-f_true))).astype(float)[:, None])
t = jnp.asarray(t)

model = PowerExpectationPropagation.initialize(
    kernel=Matern52(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(4.0)),
    likelihood=PEPScalarLikelihood(base=Bernoulli()),
    time_points=t,
    observations=y,
    alpha=0.9,
    learning_rate=0.5,
)

# %% run EP site updates to a fixed point
update = jax.jit(lambda m: m.update_sites())
print("initial energy:", float(model.energy()))
for _ in range(20):
    model = update(model)
energy = float(model.energy())
print("fitted energy: ", energy)
assert np.isfinite(energy)

# %% the posterior probability tracks the true class structure
f_mu, f_var = model.posterior.predict_f(t)
p_mu, _ = model.likelihood.predict_mean_and_var(f_mu, f_var)
acc = float(jnp.mean((p_mu[:, 0] > 0.5) == (y[:, 0] > 0.5)))
bayes = float(np.mean((f_true > 0) == (np.asarray(y[:, 0]) > 0.5)))
print(f"training accuracy: {acc:.3f} (Bayes classifier: {bayes:.3f})")
assert acc > bayes - 0.05  # within reach of the optimal rule

# latent recovery: predicted f correlates with the generating function
corr = np.corrcoef(np.asarray(f_mu[:, 0]), f_true)[0, 1]
print("correlation with true logit:", round(corr, 3))
assert corr > 0.85
