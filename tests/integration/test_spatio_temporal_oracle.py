"""Spatio-temporal CVI vs a dense product-kernel GPR oracle.

Mirrors the reference's strongest spatio-temporal identity
(tests/integration/models/test_spatio_temporal_variational.py:124-143):
``SpatioTemporalSparseCVI`` trained on data located exactly at the
(space x time) inducing grid must reach the dense GPR log marginal
likelihood (product kernel k_space * k_time) and its predictive mean,
both to 1e-6.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.kernels.matern import Matern12
from vi_diffusion_processes_tpu.kernels.spatial import SpatialMatern32
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.spatio_temporal import SpatioTemporalSparseCVI


def test_st_cvi_at_inducing_grid_matches_dense_gpr(rng):
    # data exactly on the inducing grid (the reference's 2x2 meshgrid setup,
    # enlarged to 3 space x 4 time for a stronger check)
    x_unique = np.array([0.0, 0.6, 1.0])
    t_unique = np.array([2.0, 2.5, 3.0, 3.75])
    xx, tt = np.meshgrid(x_unique, t_unique)
    inputs = np.stack([xx.ravel(), tt.ravel()], axis=-1)
    inputs = inputs[np.argsort(inputs[:, 1], kind="stable")]
    y = rng.normal(size=(inputs.shape[0], 1))

    # the reference pairs gpflow Matern32 (space) x markovflow Matern12
    # (time); both factors here have closed-form dense grams for the oracle
    ks = SpatialMatern32(variance=jnp.asarray(1.3), lengthscale=jnp.asarray(0.7))
    kt = Matern12(lengthscale=jnp.asarray(1.1), variance=jnp.asarray(0.9))
    noise = 0.35

    model = SpatioTemporalSparseCVI.initialize(
        jnp.asarray(x_unique[:, None]),
        jnp.asarray(t_unique),
        ks,
        kt,
        Gaussian(variance=jnp.asarray(noise)),
        learning_rate=1.0,
    )
    data = (jnp.asarray(inputs), jnp.asarray(y))
    update = jax.jit(lambda m: m.update_sites(data))
    for _ in range(10):
        model = update(model)

    # dense oracle: log N(y; 0, Ks o Kt + noise I) with the product kernel
    ks_gram = np.asarray(ks(jnp.asarray(inputs[:, :1])))
    kt_gram = float(kt.variance) * np.exp(
        -np.abs(inputs[:, 1:2] - inputs[:, 1:2].T) / float(kt.lengthscale)
    )
    k = ks_gram * kt_gram
    kn = k + noise * np.eye(len(y))
    chol = np.linalg.cholesky(kn)
    alpha = np.linalg.solve(kn, np.asarray(y)[:, 0])
    loglik = (
        -0.5 * np.asarray(y)[:, 0] @ alpha
        - np.log(np.diag(chol)).sum()
        - 0.5 * len(y) * np.log(2 * np.pi)
    )

    elbo = float(model.elbo(data))
    np.testing.assert_allclose(elbo, loglik, rtol=1e-6, atol=1e-6)

    st_mean, _ = model.space_time_predict_f(data[0])
    np.testing.assert_allclose(np.asarray(st_mean)[:, 0], k @ alpha, rtol=1e-5, atol=1e-6)
