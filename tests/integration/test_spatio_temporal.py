"""Spatio-temporal models: ELBO improves, prediction shapes, CVI vs
variational consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.kernels.spatial import SpatialRBF
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.spatio_temporal import (
    SpatioTemporalSparseCVI,
    SpatioTemporalSparseVariational,
)


@pytest.fixture
def st_data(rng):
    n = 60
    x_space = rng.uniform(0, 1, size=(n, 1))
    t = np.sort(rng.uniform(0, 3, size=n))
    y = (np.sin(2 * t) * np.cos(3 * x_space[:, 0]) + 0.1 * rng.normal(size=n))[:, None]
    inputs = np.concatenate([x_space, t[:, None]], axis=-1)
    return jnp.asarray(inputs), jnp.asarray(y)


@pytest.fixture
def st_setup():
    z_space = jnp.linspace(0.05, 0.95, 5)[:, None]
    z_time = jnp.linspace(0.0, 3.0, 8)
    kernel_space = SpatialRBF(variance=jnp.asarray(1.0), lengthscale=jnp.asarray(0.5))
    kernel_time = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
    return z_space, z_time, kernel_space, kernel_time


def test_st_variational_elbo_improves(st_data, st_setup):
    inputs, y = st_data
    z_space, z_time, ks, kt = st_setup
    model = SpatioTemporalSparseVariational.initialize(
        z_space, z_time, ks, kt, Gaussian(variance=jnp.asarray(0.05))
    )
    f_mu, f_var = model.space_time_predict_f(inputs)
    assert f_mu.shape == (60, 1) and f_var.shape == (60, 1)
    assert np.isfinite(np.asarray(f_mu)).all()

    # train dist_q by gradient ascent on the ELBO
    import optax

    loss = jax.jit(lambda q: -model.replace(dist_q=q).elbo((inputs, y)))
    opt = optax.adam(0.05)
    q = model.dist_q
    state = opt.init(q)

    @jax.jit
    def step(q, state):
        g = jax.grad(loss)(q)
        updates, state = opt.update(g, state)
        return optax.apply_updates(q, updates), state

    l0 = float(loss(q))
    for _ in range(40):
        q, state = step(q, state)
    l1 = float(loss(q))
    assert l1 < l0


def test_st_cvi_elbo_improves(st_data, st_setup):
    inputs, y = st_data
    z_space, z_time, ks, kt = st_setup
    model = SpatioTemporalSparseCVI.initialize(
        z_space, z_time, ks, kt, Gaussian(variance=jnp.asarray(0.05)), learning_rate=0.4
    )
    update = jax.jit(lambda m: m.update_sites((inputs, y)))
    e0 = float(model.elbo((inputs, y)))
    for _ in range(10):
        model = update(model)
    e1 = float(model.elbo((inputs, y)))
    assert e1 > e0
    f_mu, _ = model.space_time_predict_f(inputs)
    # posterior mean should correlate with data strongly after fitting
    corr = np.corrcoef(np.asarray(f_mu[:, 0]), np.asarray(y[:, 0]))[0, 1]
    assert corr > 0.5
