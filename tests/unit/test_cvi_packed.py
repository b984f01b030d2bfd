"""Packed non-conjugate CVI site step ≡ the generic model step.

The packed loop (models/cvi_packed.py) re-expresses
``CVIGaussianProcess.update_sites`` (variational_cvi.py:354-377) on rank-1
``[T]`` buffers with the natural-parameter posterior refresh
(variational_cvi.py:111-135) instead of the generic filter/smoother.  Both
roads materialize the same posterior, so sites and cached marginals must
track to dtype resolution over several steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels import Matern12, Matern32
from vi_diffusion_processes_tpu.likelihoods import Bernoulli, Poisson
from vi_diffusion_processes_tpu.models import CVIGaussianProcess
from vi_diffusion_processes_tpu.models.cvi_packed import (
    pack_cvi,
    packed_site_step,
    unpack_cvi,
)


def _build_model(kernel, likelihood, n=257, dtype=jnp.float64):
    rng = np.random.default_rng(0)
    t = jnp.linspace(0.0, 6.0, n, dtype=dtype)
    rate = np.exp(0.8 * np.sin(1.1 * np.asarray(t)))
    if isinstance(likelihood, Poisson):
        y = rng.poisson(rate).astype(np.float64)
    else:
        y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-np.sin(np.asarray(t))))).astype(
            np.float64
        )
    return CVIGaussianProcess.initialize(
        kernel, likelihood, t, jnp.asarray(y[:, None], dtype), learning_rate=0.3
    )


@pytest.mark.parametrize("kernel_cls", [Matern32, Matern12])
@pytest.mark.parametrize("lik_cls", [Poisson, Bernoulli])
def test_packed_site_step_matches_generic(kernel_cls, lik_cls):
    dtype = jnp.float64
    kernel = kernel_cls(
        lengthscale=jnp.asarray(1.2, dtype), variance=jnp.asarray(0.9, dtype)
    )
    model = _build_model(kernel, lik_cls(), dtype=dtype)
    state = pack_cvi(model)

    # the pack-time marginal cache equals the generic posterior marginals
    f_mu, f_var = model.posterior_marginals_f()
    np.testing.assert_allclose(state.fx_mu, f_mu[:, 0], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(state.fx_var, f_var[:, 0], rtol=1e-8, atol=1e-8)

    step = jax.jit(lambda s: packed_site_step(model, s))
    generic = model
    for _ in range(3):
        generic = generic.update_sites()
        state = step(state)

    np.testing.assert_allclose(
        state.d_nat1, generic.sites.nat1[:, 0], rtol=1e-8, atol=1e-9
    )
    np.testing.assert_allclose(
        state.d_nat2, generic.sites.nat2[:, 0, 0], rtol=1e-8, atol=1e-9
    )
    f_mu, f_var = generic.posterior_marginals_f()
    np.testing.assert_allclose(state.fx_mu, f_mu[:, 0], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(state.fx_var, f_var[:, 0], rtol=1e-7, atol=1e-9)

    # unpack restores the API model: its ELBO matches the generic path
    restored = unpack_cvi(model, state)
    np.testing.assert_allclose(restored.elbo(), generic.elbo(), rtol=1e-10)


def test_packed_site_step_f32_tracks():
    """f32 model: packed (f64 naturals) vs generic (f32 filter) agree to
    f32-resolution — the dtype boundary the flagship packed loop uses."""
    dtype = jnp.float32
    kernel = Matern32(
        lengthscale=jnp.asarray(1.2, dtype), variance=jnp.asarray(0.9, dtype)
    )
    model = _build_model(kernel, Poisson(), dtype=dtype)
    state = pack_cvi(model)
    step = jax.jit(lambda s: packed_site_step(model, s))
    generic = model
    for _ in range(3):
        generic = generic.update_sites()
        state = step(state)
    np.testing.assert_allclose(
        state.d_nat1, generic.sites.nat1[:, 0], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        state.fx_mu, generic.posterior_marginals_f()[0][:, 0], rtol=2e-3, atol=2e-3
    )


def test_pack_rejects_multi_output():
    kernel = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
    t = jnp.linspace(0.0, 1.0, 16)
    y = jnp.zeros((16, 2))
    model = CVIGaussianProcess.initialize(kernel, Poisson(), t, y)
    with pytest.raises(ValueError, match="single output"):
        pack_cvi(model)
