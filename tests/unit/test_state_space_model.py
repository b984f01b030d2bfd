"""StateSpaceModel vs dense NumPy oracles (mirrors the reference's
tests/unit/test_state_space_model.py strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from vi_diffusion_processes_tpu.ops.btd import btd_to_dense
from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel

from ..tools.oracles import dense_joint_from_ssm, random_ssm_params

N, D = 5, 2


@pytest.fixture
def ssm_and_dense(rng):
    params = random_ssm_params(rng, (), N, D)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    mean, cov = dense_joint_from_ssm(params)
    return ssm, params, mean, cov


def test_marginals_vs_dense(ssm_and_dense):
    ssm, _, mean, cov = ssm_and_dense
    means, covs = ssm.marginals()
    np.testing.assert_allclose(np.asarray(means).reshape(-1), mean, rtol=1e-9)
    for k in range(N + 1):
        np.testing.assert_allclose(
            covs[k], cov[k * D : (k + 1) * D, k * D : (k + 1) * D], rtol=1e-9
        )


def test_batched_marginals(rng, batch_shape):
    params = random_ssm_params(rng, batch_shape, N, D)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    means, covs = ssm.marginals()
    assert means.shape == batch_shape + (N + 1, D)
    assert covs.shape == batch_shape + (N + 1, D, D)
    # check one batch element against the dense oracle
    if batch_shape:
        idx = (0,) * len(batch_shape)
        sub = {k: v[idx] for k, v in params.items()}
        mean, cov = dense_joint_from_ssm(sub)
        np.testing.assert_allclose(np.asarray(means[idx]).reshape(-1), mean, rtol=1e-9)


def test_precision_vs_dense(ssm_and_dense):
    ssm, _, _, cov = ssm_and_dense
    prec = btd_to_dense(ssm.precision())
    np.testing.assert_allclose(np.asarray(prec), np.linalg.inv(cov), rtol=1e-7, atol=1e-9)


def test_log_det_precision(ssm_and_dense):
    ssm, _, _, cov = ssm_and_dense
    want = -np.linalg.slogdet(cov)[1]
    np.testing.assert_allclose(ssm.log_det_precision(), want, rtol=1e-9)


def test_log_pdf_vs_scipy(ssm_and_dense, rng):
    ssm, _, mean, cov = ssm_and_dense
    x = rng.normal(size=(7, N + 1, D))
    got = ssm.log_pdf(jnp.asarray(x))
    want = scipy.stats.multivariate_normal(mean, cov).logpdf(x.reshape(7, -1))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_sample_moments(ssm_and_dense, key):
    ssm, _, mean, cov = ssm_and_dense
    samples = ssm.sample(key, (200_000,))
    flat = np.asarray(samples).reshape(200_000, -1)
    np.testing.assert_allclose(flat.mean(0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.12)


def test_kl_divergence_vs_dense(rng):
    p1 = random_ssm_params(rng, (), N, D)
    p2 = random_ssm_params(rng, (), N, D)
    ssm_q = StateSpaceModel(**{k: jnp.asarray(v) for k, v in p1.items()})
    ssm_p = StateSpaceModel(**{k: jnp.asarray(v) for k, v in p2.items()})
    m_q, c_q = dense_joint_from_ssm(p1)
    m_p, c_p = dense_joint_from_ssm(p2)
    dim = (N + 1) * D
    want = 0.5 * (
        np.trace(np.linalg.solve(c_p, c_q))
        + (m_p - m_q) @ np.linalg.solve(c_p, m_p - m_q)
        - dim
        + np.linalg.slogdet(c_p)[1]
        - np.linalg.slogdet(c_q)[1]
    )
    got = ssm_q.kl_divergence(ssm_p)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_kl_self_zero(ssm_and_dense):
    ssm, *_ = ssm_and_dense
    np.testing.assert_allclose(ssm.kl_divergence(ssm), 0.0, atol=1e-9)


def test_marginals_jittable(ssm_and_dense):
    ssm, _, mean, _ = ssm_and_dense
    means, _ = jax.jit(lambda s: s.marginals())(ssm)
    np.testing.assert_allclose(np.asarray(means).reshape(-1), mean, rtol=1e-9)
