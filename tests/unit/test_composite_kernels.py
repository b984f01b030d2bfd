"""Piecewise / FactorAnalysis / Stack kernels + MultiStage likelihood."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.composite import (
    FactorAnalysisKernel,
    IndependentMultiOutputStack,
    PiecewiseKernel,
    StackKernel,
)
from vi_diffusion_processes_tpu.kernels.matern import Matern12, Matern32
from vi_diffusion_processes_tpu.likelihoods.multistage import MultiStageLikelihood


def test_piecewise_selects_regimes():
    k1 = Matern12(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.0))
    k2 = Matern12(lengthscale=jnp.asarray(2.0), variance=jnp.asarray(1.0))
    pk = PiecewiseKernel(kernels=(k1, k2), change_points=jnp.asarray([1.0]))
    t = jnp.asarray([0.2, 0.6, 1.5, 2.0])
    idx = pk.split_time_indices(t)
    np.testing.assert_array_equal(idx, [0, 0, 1, 1])
    dts = jnp.asarray([0.4, 0.4, 0.5])  # transitions at t=[0.2, 0.6, 1.5]
    a, q = pk.transition_statistics(t[:-1], dts)
    # regimes: transitions starting at 0.2, 0.6 use k1; at 1.5 uses k2
    np.testing.assert_allclose(a[0, 0, 0], np.exp(-0.4 / 0.5), rtol=1e-12)
    np.testing.assert_allclose(a[2, 0, 0], np.exp(-0.5 / 2.0), rtol=1e-12)


def test_piecewise_ssm_marginals_stationary():
    k1 = Matern32(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.0))
    k2 = Matern32(lengthscale=jnp.asarray(2.0), variance=jnp.asarray(1.0))
    pk = PiecewiseKernel(kernels=(k1, k2), change_points=jnp.asarray([1.0]))
    t = jnp.asarray([0.0, 0.5, 2.0, 3.0])
    ssm = pk.state_space_model(t)
    assert ssm.num_transitions == 3
    means, covs = ssm.marginals()
    assert np.isfinite(np.asarray(covs)).all()


def test_factor_analysis_emission():
    kernels = (
        Matern12(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.0)),
        Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0)),
    )
    weight_fn = lambda t: jnp.stack(
        [jnp.ones_like(t), t, jnp.sin(t), jnp.cos(t)], axis=-1
    ).reshape(t.shape + (2, 2))
    fak = FactorAnalysisKernel.create(weight_fn, kernels, output_dim=2)
    t = jnp.asarray([0.0, 1.0, 2.0])
    em = fak.generate_emission_model(t)
    assert em.emission_matrix.shape == (3, 2, 3)  # outputs 2, states 1+2
    ssm = fak.state_space_model(t)
    assert ssm.state_dim == 3
    f_mu, f_var = em.project_state_marginals_to_f(*ssm.marginals())
    assert f_mu.shape == (3, 2)


def test_stack_kernel_batched_ssm():
    kernels = (
        Matern12(lengthscale=jnp.asarray(0.5), variance=jnp.asarray(1.3)),
        Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(0.7)),
    )
    sk = StackKernel(kernels=kernels)
    assert sk.state_dim == 2 and sk.output_dim == 2
    t = jnp.asarray([0.0, 0.5, 1.0])
    ssm = sk.state_space_model(t)
    assert ssm.batch_shape == (2,)
    means, covs = ssm.marginals()
    # each stacked chain keeps its own P∞ (zero-padded for the smaller state)
    np.testing.assert_allclose(covs[0, 0, 0, 0], 1.3, rtol=1e-8)
    np.testing.assert_allclose(covs[1, 0, 0, 0], 0.7, rtol=1e-8)
    em = sk.generate_emission_model(t)
    f = em.project_state_to_f(means)
    assert f.shape == (3, 2)


def test_imo_stack_operators():
    k = lambda l: Matern12(lengthscale=jnp.asarray(l), variance=jnp.asarray(1.0))
    s1 = IndependentMultiOutputStack(kernels=(k(0.5), k(1.0)))
    s2 = IndependentMultiOutputStack(kernels=(k(2.0), k(3.0)))
    added = s1 + s2
    assert added.num_kernels == 2
    assert added.state_dim == 2  # sum kernel state dims 1+1
    mul = s1 * s2
    assert mul.state_dim == 1  # product of two d=1 kernels


def test_multistage_likelihood(key):
    lik = MultiStageLikelihood()
    f = jnp.asarray([[0.5, -0.3, 1.0], [2.0, 0.0, 0.0], [-1.0, -2.0, 0.3]])
    for y_val in (0.0, 1.0, 4.0):
        y = jnp.full((3, 1), y_val)
        lp = lik.log_probability_density(f, y)
        assert lp.shape == (3,)
        assert np.isfinite(np.asarray(lp)).all()
    # VE ≤ log p at the mean as var → 0 consistency (Jensen sanity)
    ve = lik.variational_expectations(f, jnp.full((3, 3), 1e-10), jnp.full((3, 1), 1.0))
    lp = lik.log_probability_density(f, jnp.full((3, 1), 1.0))
    np.testing.assert_allclose(ve, lp, atol=1e-4)
    y = lik.sample_y(f, key)
    assert y.shape == (3, 1)


def test_multistage_ve_matches_mc(key):
    lik = MultiStageLikelihood()
    mu = jnp.asarray([[0.2, -0.5, 0.8]])
    var = jnp.asarray([[0.3, 0.5, 0.2]])
    y = jnp.asarray([[3.0]])
    ve = lik.variational_expectations(mu, var, y)
    eps = jax.random.normal(key, (200_000, 1, 3))
    f = mu + jnp.sqrt(var) * eps
    mc = jnp.mean(lik.log_probability_density(f, y))
    np.testing.assert_allclose(ve, mc, atol=5e-3)
