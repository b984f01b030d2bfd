"""Packed spatio-temporal CVI site step ≡ the generic model step.

The plane-layout loop (models/spatio_packed.py) re-expresses
``SpatioTemporalSparseCVI.update_sites`` (spatio_temporal_variational.py:
509-553) with all loop invariants hoisted into a pack-time cache and the
posterior refresh on the CVI-DP channel engine; both roads must produce
the same site naturals over several iterations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.kernels.spatial import SpatialRBF
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.spatio_temporal import SpatioTemporalSparseCVI
from vi_diffusion_processes_tpu.models.spatio_packed import (
    pack_spatio,
    packed_spatio_site_step,
    unpack_spatio,
)


def _build(m_space, n=150, mt=60):
    rng = np.random.default_rng(4)
    x_space = rng.uniform(0, 1, size=(n, 1))
    t = np.sort(rng.uniform(0, 10.0, size=n))
    y = jnp.asarray(
        (np.sin(2 * t) * np.cos(3 * x_space[:, 0]) + 0.1 * rng.normal(size=n))[:, None]
    )
    inputs = jnp.asarray(np.concatenate([x_space, t[:, None]], axis=-1))
    model = SpatioTemporalSparseCVI.initialize(
        jnp.linspace(0.05, 0.95, m_space)[:, None],
        jnp.linspace(0.0, 10.0, mt),
        SpatialRBF(variance=jnp.asarray(1.0), lengthscale=jnp.asarray(0.5)),
        Matern32(lengthscale=jnp.asarray(2.0), variance=jnp.asarray(1.0)),
        Gaussian(variance=jnp.asarray(0.05)),
        learning_rate=0.5,
    )
    return model, (inputs, y)


@pytest.mark.parametrize("m_space", [1, 3])
def test_packed_spatio_step_matches_generic(m_space):
    model, data = _build(m_space)
    cache, state = pack_spatio(model, data)

    step = jax.jit(lambda s: packed_spatio_site_step(model, cache, s))
    generic = model
    for _ in range(3):
        generic = generic.update_sites(data)
        state = step(state)

    restored = unpack_spatio(model, state)
    np.testing.assert_allclose(restored.nat1, generic.nat1, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(restored.nat2, generic.nat2, rtol=1e-7, atol=1e-9)

    # downstream parity: the restored model predicts/ELBOs identically
    np.testing.assert_allclose(
        restored.elbo(data), generic.elbo(data), rtol=1e-9
    )


def test_packed_spatio_elbo_improves():
    model, data = _build(3)
    cache, state = pack_spatio(model, data)
    step = jax.jit(lambda s: packed_spatio_site_step(model, cache, s))
    e0 = float(model.elbo(data))
    for _ in range(12):
        state = step(state)
    e1 = float(unpack_spatio(model, state).elbo(data))
    assert e1 > e0 + 1.0, (e0, e1)
