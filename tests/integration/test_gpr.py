"""Exact GPR vs dense-GP oracle (mirrors the reference's
tests/integration/test_kalman_filter.py + test_kernels.py strategy)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern12, Matern32, Matern52
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression

from ..tools.oracles import dense_joint_from_ssm


def dense_gram(kernel, time_points):
    """Dense output-space Gram matrix via the SSM joint covariance."""
    ssm = kernel.state_space_model(jnp.asarray(time_points))
    params = {
        "initial_mean": np.asarray(ssm.initial_mean),
        "chol_initial_covariance": np.asarray(ssm.chol_initial_covariance),
        "state_transitions": np.asarray(ssm.state_transitions),
        "state_offsets": np.asarray(ssm.state_offsets),
        "chol_process_covariances": np.asarray(ssm.chol_process_covariances),
    }
    mean, cov = dense_joint_from_ssm(params)
    h = np.asarray(kernel.generate_emission_model(jnp.asarray(time_points)).emission_matrix)
    d = h.shape[-1]
    n = len(time_points)
    big_h = np.zeros((n, n * d))
    for k in range(n):
        big_h[k, k * d : (k + 1) * d] = h[k, 0]
    return big_h @ mean, big_h @ cov @ big_h.T


@pytest.fixture(params=[Matern12, Matern32, Matern52], ids=["m12", "m32", "m52"])
def kernel(request):
    return request.param(lengthscale=jnp.asarray(0.9), variance=jnp.asarray(1.7))


@pytest.fixture
def data(rng):
    t = np.sort(rng.uniform(0.0, 5.0, size=40))
    y = (np.sin(2 * t) + 0.3 * rng.normal(size=40))[:, None]
    return jnp.asarray(t), jnp.asarray(y)


NOISE = 0.1


def test_log_likelihood_vs_dense(kernel, data):
    t, y = data
    model = GaussianProcessRegression(
        kernel=kernel,
        time_points=t,
        observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    got = model.log_likelihood()

    mean_f, gram = dense_gram(kernel, np.asarray(t))
    cov_y = gram + NOISE * np.eye(len(np.asarray(t)))
    resid = np.asarray(y)[:, 0] - mean_f
    _, logdet = np.linalg.slogdet(cov_y)
    want = -0.5 * (resid @ np.linalg.solve(cov_y, resid) + logdet + len(resid) * np.log(2 * np.pi))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_posterior_predict_f_vs_dense(kernel, data, rng):
    t, y = data
    model = GaussianProcessRegression(
        kernel=kernel,
        time_points=t,
        observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    t_new = np.sort(rng.uniform(-0.5, 5.5, size=17))
    f_means, f_vars = model.posterior.predict_f(jnp.asarray(t_new))

    # dense oracle on the union grid
    t_all = np.concatenate([np.asarray(t), t_new])
    order = np.argsort(t_all)
    t_union = t_all[order]
    _, gram_union = dense_gram(kernel, t_union)
    inv_order = np.argsort(order)
    n_train = len(np.asarray(t))
    idx_train = inv_order[:n_train]
    idx_new = inv_order[n_train:]
    k_tt = gram_union[np.ix_(idx_train, idx_train)]
    k_st = gram_union[np.ix_(idx_new, idx_train)]
    k_ss = gram_union[np.ix_(idx_new, idx_new)]
    cov_y = k_tt + NOISE * np.eye(n_train)
    want_mean = k_st @ np.linalg.solve(cov_y, np.asarray(y)[:, 0])
    want_cov = k_ss - k_st @ np.linalg.solve(cov_y, k_st.T)
    np.testing.assert_allclose(f_means[:, 0], want_mean, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(f_vars[:, 0], np.diag(want_cov), rtol=1e-6, atol=1e-8)


def test_posterior_marginals_match_training_points(kernel, data):
    """Predicting at the training points must equal the smoothed marginals."""
    t, y = data
    model = GaussianProcessRegression(
        kernel=kernel,
        time_points=t,
        observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    post_ssm = model.posterior_state_space_model()
    means, covs = post_ssm.marginals()
    f_means, f_vars = model.posterior.predict_f(t)
    h = kernel.generate_emission_model(t).emission_matrix
    want_mean = jnp.einsum("...ij,...j->...i", h, means)
    np.testing.assert_allclose(f_means, want_mean, rtol=1e-6, atol=1e-8)
