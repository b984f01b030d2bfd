"""Emission models and mean functions (mirrors tests/unit/test_emission_model.py
and test_mean_function.py of the reference)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern12, Matern32
from vi_diffusion_processes_tpu.ssm.emission import (
    ComposedPairEmissionModel,
    EmissionModel,
    StackEmissionModel,
)
from vi_diffusion_processes_tpu.ssm.mean_functions import (
    ImpulseMeanFunction,
    LinearMeanFunction,
    StepMeanFunction,
    ZeroMeanFunction,
)


def test_emission_projections(rng, batch_shape, output_dim):
    n, m, d = 5, output_dim, 3
    h = jnp.asarray(rng.normal(size=batch_shape + (n, m, d)))
    em = EmissionModel(h)
    x = jnp.asarray(rng.normal(size=batch_shape + (n, d)))
    np.testing.assert_allclose(
        em.project_state_to_f(x), np.einsum("...ij,...j->...i", h, x), rtol=1e-12
    )
    cov = jnp.asarray(rng.normal(size=batch_shape + (n, d, d)))
    cov = cov @ np.swapaxes(cov, -1, -2)
    full = em.project_state_covariance_to_f(cov, full_output_cov=True)
    want = np.einsum("...ij,...jk,...lk->...il", h, cov, h)
    np.testing.assert_allclose(full, want, rtol=1e-10)
    diag = em.project_state_covariance_to_f(cov, full_output_cov=False)
    np.testing.assert_allclose(diag, np.diagonal(want, axis1=-2, axis2=-1), rtol=1e-10)


def test_composed_pair_emission(rng):
    n, d = 4, 3
    inner = jnp.asarray(rng.normal(size=(n, 2, d)))
    outer = jnp.asarray(rng.normal(size=(n, 1, 2)))
    em = ComposedPairEmissionModel(
        emission_matrix=outer @ inner, inner_emission_matrix=inner
    )
    x = jnp.asarray(rng.normal(size=(n, d)))
    np.testing.assert_allclose(
        em.project_state_to_f(x),
        np.einsum("nij,nj->ni", np.asarray(outer @ inner), x),
        rtol=1e-12,
    )
    assert em.project_state_to_inner(x).shape == (n, 2)


def test_stack_emission(rng):
    s, n, d = 3, 4, 2
    h = jnp.asarray(rng.normal(size=(s, n, 1, d)))
    em = StackEmissionModel(h)
    x = jnp.asarray(rng.normal(size=(s, n, d)))
    f = em.project_state_to_f(x)
    assert f.shape == (n, s)
    want = np.einsum("snij,snj->sni", h, x)[..., 0].T
    np.testing.assert_allclose(f, want, rtol=1e-12)


def test_zero_and_linear_mean_functions():
    t = jnp.asarray([0.0, 1.0, 2.0])
    assert np.all(np.asarray(ZeroMeanFunction(obs_dim=2)(t)) == 0.0)
    lin = LinearMeanFunction(coefficient=jnp.asarray(1.5))
    np.testing.assert_allclose(lin(t)[:, 0], 1.5 * np.asarray(t), rtol=1e-12)


def test_impulse_mean_function_decays():
    """After an impulse the mean follows the kernel dynamics (decay)."""
    kernel = Matern12(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
    mf = ImpulseMeanFunction(
        action_times=jnp.asarray([1.0]),
        state_perturbations=jnp.asarray([[2.0]]),
        kernel=kernel,
    )
    t = jnp.asarray([0.5, 1.1, 2.0, 4.0])
    vals = np.asarray(mf(t))[:, 0]
    assert vals[0] == 0.0  # before the impulse
    np.testing.assert_allclose(vals[1], 2.0 * np.exp(-0.1), rtol=1e-9)
    assert vals[1] > vals[2] > vals[3] > 0  # exponential decay


def test_step_mean_function_piecewise():
    kernel = Matern12(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
    mf = StepMeanFunction(
        action_times=jnp.asarray([0.0, 2.0]),
        state_offsets=jnp.asarray([[1.0], [0.0]]),
        kernel=kernel,
    )
    t = jnp.asarray([0.5, 1.5, 10.0])
    vals = np.asarray(mf(t))[:, 0]
    # du/dt = -u + 1 from 0: u(t) = 1 - e^{-t} on [0, 2)
    np.testing.assert_allclose(vals[0], 1 - np.exp(-0.5), rtol=1e-9)
    np.testing.assert_allclose(vals[1], 1 - np.exp(-1.5), rtol=1e-9)
    # input returns to 0 at t=2 → decays back toward 0
    assert vals[2] < 0.01
