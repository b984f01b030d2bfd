"""Sampling edge cases for StateSpaceModel.sample.

Mirrors the reference's tests/unit/test_sampling_from_ssm.py:35-130 —
empty batch shapes, zero-sample shapes, and the almost-deterministic model
whose samples must all collapse onto the affine mean recursion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel

from ..tools.oracles import random_ssm_params


@pytest.fixture(params=[(1,), (0, 4), (4, 4), (100,)], ids=["s1", "s04", "s44", "s100"])
def sample_shape(request):
    return request.param


def _make_ssm(rng, batch_shape, n, d, deterministic=False):
    params = random_ssm_params(rng, batch_shape, n, d)
    if deterministic:
        # near-zero noise: samples must reproduce the affine mean recursion
        # (reference test_sampling_from_ssm.py:55-72 uses sys.float_info.min)
        tiny = np.sqrt(np.finfo(np.float64).tiny)
        params["chol_initial_covariance"] = np.broadcast_to(
            tiny * np.eye(d), batch_shape + (d, d)
        ).copy()
        params["chol_process_covariances"] = np.broadcast_to(
            tiny * np.eye(d), batch_shape + (n, d, d)
        ).copy()
    return StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()}), params


def _expected_means(params):
    a_s = params["state_transitions"]
    b_s = params["state_offsets"]
    mu = params["initial_mean"]
    out = [mu]
    for i in range(b_s.shape[-2]):
        out.append(
            np.einsum("...jk,...k->...j", a_s[..., i, :, :], out[-1]) + b_s[..., i, :]
        )
    return np.stack(out, axis=-2)


def test_sample_shape_empty_batch(rng, key, state_dim, num_transitions, sample_shape):
    ssm, _ = _make_ssm(rng, (), num_transitions, state_dim)
    samples = ssm.sample(key, sample_shape)
    assert samples.shape == sample_shape + (num_transitions + 1, state_dim)


def test_sample_shape_batched(rng, key, batch_shape, state_dim, sample_shape):
    n = 3
    ssm, _ = _make_ssm(rng, batch_shape, n, state_dim)
    samples = ssm.sample(key, sample_shape)
    assert samples.shape == sample_shape + batch_shape + (n + 1, state_dim)


def test_zero_samples(rng, key, batch_shape, state_dim):
    ssm, _ = _make_ssm(rng, batch_shape, 3, state_dim)
    samples = ssm.sample(key, (0,))
    assert samples.size == 0
    assert samples.shape == (0,) + batch_shape + (4, state_dim)


def test_almost_deterministic_model_samples_all_match(
    rng, key, batch_shape, state_dim, sample_shape
):
    ssm, params = _make_ssm(rng, batch_shape, 1, state_dim, deterministic=True)
    samples = np.asarray(ssm.sample(key, sample_shape))
    means = _expected_means(params)
    expected = np.broadcast_to(means, sample_shape + means.shape)
    np.testing.assert_allclose(samples, expected, rtol=1e-7, atol=1e-12)


def test_almost_deterministic_transitions(rng, key, batch_shape, num_transitions, sample_shape):
    ssm, params = _make_ssm(rng, batch_shape, num_transitions, 1, deterministic=True)
    samples = np.asarray(ssm.sample(key, sample_shape))
    means = _expected_means(params)
    expected = np.broadcast_to(means, sample_shape + means.shape)
    np.testing.assert_allclose(samples, expected, rtol=1e-7, atol=1e-12)


def test_sample_jittable(rng, key, state_dim):
    ssm, _ = _make_ssm(rng, (), 4, state_dim)
    jitted = jax.jit(lambda m, k: m.sample(k, (6,)))
    np.testing.assert_allclose(
        np.asarray(jitted(ssm, key)), np.asarray(ssm.sample(key, (6,))), rtol=1e-12
    )
