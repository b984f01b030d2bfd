# %% [markdown]
# # GP factor analysis
# Reference: `docs/notebooks/factor_analysis.py` — o observed series are a
# time-varying mixture of m latent GPs: ``fᵢ(t) = Σⱼ Aᵢⱼ(t) Bⱼₖ gₖ(t)``.
# An SVGP with a `FactorAnalysisKernel` recovers the mixed signal with far
# fewer latent processes than outputs.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import FactorAnalysisKernel, Matern12, Matern32
from vi_diffusion_processes_tpu.likelihoods import Gaussian
from vi_diffusion_processes_tpu.models import SparseVariationalGaussianProcess
from vi_diffusion_processes_tpu.optim import natgrad_step

rng = np.random.default_rng(11)
n, num_outputs = 120, 3
t_np = np.sort(rng.uniform(0, 6, size=n))

# two latent functions, slow and fast
g = np.stack([np.sin(t_np), np.cos(3.0 * t_np)], axis=-1)  # [n, 2]


def weight_fn(t):
    """A(t): [.., n, o, m] — smooth time-varying mixing weights."""
    a = jnp.stack(
        [jnp.ones_like(t), 0.5 * jnp.sin(t),
         0.3 * t / 6.0, jnp.ones_like(t),
         jnp.cos(t), -0.5 * jnp.ones_like(t)],
        axis=-1,
    )
    return a.reshape(t.shape + (3, 2))


f_true = np.einsum("nom,nm->no", np.asarray(weight_fn(jnp.asarray(t_np))), g)
y = jnp.asarray(f_true + 0.1 * rng.normal(size=(n, num_outputs)))
t = jnp.asarray(t_np)

kernel = FactorAnalysisKernel.create(
    weight_function=weight_fn,
    kernels=(
        Matern32(lengthscale=jnp.asarray(1.5), variance=jnp.asarray(1.0)),
        Matern12(lengthscale=jnp.asarray(0.4), variance=jnp.asarray(1.0)),
    ),
    output_dim=num_outputs,
)
model = SparseVariationalGaussianProcess.initialize(
    kernel, Gaussian(variance=jnp.asarray(0.01)), inducing_points=jnp.linspace(0, 6, 40)
)

# %% natural-gradient fit of q(s(z))
data = (t, y)


@jax.jit
def step(q):
    new_q, _, loss = natgrad_step(
        lambda qq: model.replace(dist_q=qq).loss(data), q, gamma=0.5
    )
    return new_q, loss


q = model.dist_q
print("initial ELBO:", -float(model.loss(data)))
for i in range(15):
    q, loss = step(q)
model = model.replace(dist_q=q)
print("fitted ELBO: ", -float(loss))

# %% reconstruction: 3 outputs from only 2 latent processes
f_mu, f_var = model.posterior.predict_f(t)
rmse = float(jnp.sqrt(jnp.mean((f_mu - f_true) ** 2)))
print("reconstruction RMSE:", round(rmse, 4), "(noise σ = 0.1)")
assert rmse < 0.15
for i in range(num_outputs):
    corr = np.corrcoef(np.asarray(f_mu[:, i]), f_true[:, i])[0, 1]
    print(f"output {i}: corr with truth = {corr:.3f}")
    assert corr > 0.9
