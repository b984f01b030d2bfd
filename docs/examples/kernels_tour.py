# %% [markdown]
# # Kernel tour: families and combinators
# Reference: `docs/notebooks/markovflow_choosing_and_combining_kernels.py`.

# %%
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels import (
    Constant,
    HarmonicOscillator,
    IndependentMultiOutput,
    LatentExponentiallyGenerated,
    Matern12,
    Matern32,
    Matern52,
    OrnsteinUhlenbeck,
    PiecewiseKernel,
    Product,
    Sum,
)

t = jnp.linspace(0.0, 4.0, 50)

kernels = {
    "Matern12": Matern12(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.0)),
    "Matern32": Matern32(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.0)),
    "Matern52": Matern52(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.0)),
    "OU": OrnsteinUhlenbeck(decay=jnp.asarray(2.0), diffusion=jnp.asarray(1.0)),
    "Constant": Constant(variance=jnp.asarray(0.7)),
    "Harmonic": HarmonicOscillator(variance=jnp.asarray(1.0), period=jnp.asarray(1.5)),
    "LEG": LatentExponentiallyGenerated(
        N=jnp.asarray(np.eye(2)), R=jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
    ),
}

for name, k in kernels.items():
    ssm = k.state_space_model(t)
    means, covs = ssm.marginals()
    print(f"{name:10s} state_dim={k.state_dim} output_dim={k.output_dim} "
          f"stationary var={float(covs[0, 0, 0]):.3f}")

# %% combinators: sum, product, multi-output, regime switching
m12 = kernels["Matern12"]
m32 = kernels["Matern32"]
combos = {
    "Sum": m12 + m32,
    "Product": m12 * m32,
    "IMO": IndependentMultiOutput(kernels=(m12, m32)),
    "Piecewise": PiecewiseKernel(
        kernels=(
            Matern32(lengthscale=jnp.asarray(0.3), variance=jnp.asarray(1.0)),
            Matern32(lengthscale=jnp.asarray(2.0), variance=jnp.asarray(1.0)),
        ),
        change_points=jnp.asarray([2.0]),
    ),
}
for name, k in combos.items():
    ssm = k.state_space_model(t)
    print(f"{name:10s} state_dim={k.state_dim} output_dim={k.output_dim} "
          f"transitions={ssm.num_transitions}")

# the sum kernel's stationary variance adds
ssm = combos["Sum"].state_space_model(t)
em = combos["Sum"].generate_emission_model(t)
_, f_var = em.project_state_marginals_to_f(*ssm.marginals())
np.testing.assert_allclose(f_var[0, 0], 2.0, rtol=1e-6)
print("sum-of-variances check passed ✓")
