"""Robustness: deterministic kernels (Q=0), batched models, out-of-range
prediction."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern12, Matern32
from vi_diffusion_processes_tpu.kernels.misc import Constant, HarmonicOscillator
from vi_diffusion_processes_tpu.kernels.base import Sum
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression

NOISE = 0.1


def test_gpr_with_deterministic_component(rng):
    """Sum of Constant (Q=0) + Matern: the zero-process-noise chain must not
    break the filter/smoother (chol-or-zero masking path)."""
    t = jnp.asarray(np.sort(rng.uniform(0, 4, size=15)))
    y = jnp.asarray((1.5 + np.sin(2 * np.asarray(t)) + 0.2 * rng.normal(size=15))[:, None])
    kernel = Sum(kernels=(
        Constant(variance=jnp.asarray(1.0)),
        Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.0)),
    ))
    model = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    ll = float(model.log_likelihood())
    assert np.isfinite(ll)
    f_mu, f_var = model.posterior.predict_f(t)
    assert np.isfinite(np.asarray(f_mu)).all()
    # the constant offset is captured: residual mean ≈ 0
    assert abs(float(jnp.mean(y[:, 0] - f_mu[:, 0]))) < 0.2


def test_gpr_with_harmonic_kernel(rng):
    """Periodic (deterministic, Q=0, d=2) + noise kernel."""
    t = jnp.asarray(np.sort(rng.uniform(0, 6, size=40)))
    y_true = np.sin(2 * np.pi * np.asarray(t) / 2.0)
    y = jnp.asarray((y_true + 0.1 * rng.normal(size=40))[:, None])
    kernel = Sum(kernels=(
        HarmonicOscillator(variance=jnp.asarray(1.0), period=jnp.asarray(2.0)),
        Matern12(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(0.1)),
    ))
    model = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(0.01)]]),
    )
    assert np.isfinite(float(model.log_likelihood()))
    # forecast one period ahead: periodic structure extrapolates
    t_new = t[-1] + jnp.asarray([2.0])
    f_mu, _ = model.posterior.predict_f(t_new)
    f_at_last, _ = model.posterior.predict_f(t[-1:])
    np.testing.assert_allclose(f_mu, f_at_last, atol=0.3)


def test_batched_gpr_loglik(rng):
    """GPR with leading batch dims: loglik per batch element matches the
    unbatched computation."""
    batch, n = 3, 12
    t = jnp.asarray(np.tile(np.sort(rng.uniform(0, 3, size=n)), (batch, 1)))
    y = jnp.asarray(rng.normal(size=(batch, n, 1)))
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.0))
    model = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    lls = model.log_likelihood()
    assert lls.shape == (batch,)
    for b in range(batch):
        single = GaussianProcessRegression(
            kernel=kernel, time_points=t[b], observations=y[b],
            chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
        )
        np.testing.assert_allclose(lls[b], single.log_likelihood(), rtol=1e-9)


def test_predict_far_outside_range(rng):
    """Far-extrapolated predictions revert to the prior (APPROX_INF path)."""
    t = jnp.asarray(np.sort(rng.uniform(0, 2, size=10)))
    y = jnp.asarray(rng.normal(size=(10, 1)))
    kernel = Matern32(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.3))
    model = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    f_mu, f_var = model.posterior.predict_f(jnp.asarray([50.0, 100.0]))
    np.testing.assert_allclose(f_mu, 0.0, atol=1e-6)
    np.testing.assert_allclose(f_var, 1.3, rtol=1e-5)
