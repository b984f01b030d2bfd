"""Parallel associative-scan filter/smoother vs sequential NumPy oracle.

This is the parity proof for the TPU-native replacement of the reference's
banded information-form smoother (kalman_filter.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.parallel.pskf import (
    filter_smoother_with_sites,
    parallel_filter,
    posterior_ssm_from_smoothed,
    site_log_normalizer,
)
from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel

from ..tools.oracles import kalman_filter_rts, random_ssm_params

N, D = 7, 2


def make_case(rng, sparse=False):
    params = random_ssm_params(rng, (), N, D)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    nat1 = rng.normal(size=(N + 1, D))
    a = rng.normal(size=(N + 1, D, D))
    nat2 = a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(D)
    if sparse:
        # unobserved points get exactly-zero sites (sparse-sites model,
        # kalman_filter.py:504)
        mask = rng.random(N + 1) < 0.5
        nat1 = nat1 * mask[:, None]
        nat2 = nat2 * mask[:, None, None]
    return params, ssm, nat1, nat2


@pytest.mark.parametrize("sparse", [False, True], ids=["dense-sites", "sparse-sites"])
def test_filter_smoother_vs_oracle(rng, sparse):
    params, ssm, nat1, nat2 = make_case(rng, sparse)
    fm, fc, sm, sc, gains, log_z = kalman_filter_rts(params, nat1, nat2)

    filt, smooth = filter_smoother_with_sites(ssm, jnp.asarray(nat1), jnp.asarray(nat2))
    np.testing.assert_allclose(filt.means, fm, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(filt.covs, fc, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(smooth.means, sm, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(smooth.covs, sc, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(smooth.gains, gains, rtol=1e-8, atol=1e-10)


def test_log_normalizer_vs_oracle(rng):
    params, ssm, nat1, nat2 = make_case(rng)
    *_, log_z = kalman_filter_rts(params, nat1, nat2)
    filt = parallel_filter(ssm, jnp.asarray(nat1), jnp.asarray(nat2))
    got = site_log_normalizer(filt, jnp.asarray(nat1), jnp.asarray(nat2))
    np.testing.assert_allclose(got, log_z, rtol=1e-9)


def test_log_normalizer_vs_dense_integral(rng):
    """log Z must equal the dense Gaussian-integral evidence."""
    from ..tools.oracles import dense_joint_from_ssm

    params, ssm, nat1, nat2 = make_case(rng)
    mean, cov = dense_joint_from_ssm(params)
    th = nat1.reshape(-1)
    lam = np.zeros(((N + 1) * D, (N + 1) * D))
    for k in range(N + 1):
        lam[k * D : (k + 1) * D, k * D : (k + 1) * D] = nat2[k]
    # ∫ N(x; mean, cov) exp(θᵀx − ½xᵀΛx) dx
    ipl = np.eye((N + 1) * D) + cov @ lam
    want = (
        -0.5 * np.linalg.slogdet(ipl)[1]
        - 0.5 * mean @ lam @ np.linalg.solve(ipl, mean)
        + th @ np.linalg.solve(ipl, mean)
        + 0.5 * th @ np.linalg.solve(ipl, cov @ th)
    )
    filt = parallel_filter(ssm, jnp.asarray(nat1), jnp.asarray(nat2))
    got = site_log_normalizer(filt, jnp.asarray(nat1), jnp.asarray(nat2))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_posterior_ssm_marginals(rng):
    """The forward posterior SSM must reproduce the smoothed marginals."""
    params, ssm, nat1, nat2 = make_case(rng)
    filt, smooth = filter_smoother_with_sites(ssm, jnp.asarray(nat1), jnp.asarray(nat2))
    post = posterior_ssm_from_smoothed(ssm, smooth)
    means, covs = post.marginals()
    np.testing.assert_allclose(means, smooth.means, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(covs, smooth.covs, rtol=1e-6, atol=1e-8)


def test_batched(rng, batch_shape):
    if not batch_shape:
        pytest.skip("unbatched covered above")
    params = random_ssm_params(rng, batch_shape, N, D)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    nat1 = rng.normal(size=batch_shape + (N + 1, D))
    a = rng.normal(size=batch_shape + (N + 1, D, D))
    nat2 = a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(D)
    filt, smooth = filter_smoother_with_sites(ssm, jnp.asarray(nat1), jnp.asarray(nat2))
    assert smooth.means.shape == batch_shape + (N + 1, D)
    idx = (0,) * len(batch_shape)
    sub_params = {k: v[idx] for k, v in params.items()}
    fm, fc, sm, sc, *_ = kalman_filter_rts(sub_params, nat1[idx], nat2[idx])
    np.testing.assert_allclose(smooth.means[idx], sm, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(smooth.covs[idx], sc, rtol=1e-8, atol=1e-10)
