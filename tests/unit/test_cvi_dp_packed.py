"""Packed (structure-of-scalars) CVI-DP step ≡ the generic model step.

The packed d=1 hot loop (models/cvi_dp_packed.py) re-expresses the exact
trainer inner iteration — update_data_sites → update_girsanov_sites →
classic_elbo (variational_cvi_sde.py:279-352) — on rank-1 arrays.  Same
math, same dtype boundaries (f64 naturals, f32 compute), different layout;
here we check the two paths track each other to float32 resolution over
several steps of the double-well benchmark configuration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
from vi_diffusion_processes_tpu.models.cvi_dp_packed import (
    pack_state,
    packed_natgrad_step,
    unpack_state,
)
from vi_diffusion_processes_tpu.sde.utils import Gaussian as GaussianState
from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE


def _build_model(t_points=400, dtype=jnp.float32):
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]], dtype))
    grid = jnp.linspace(0.0, 4.0, t_points, dtype=dtype)
    rng = np.random.default_rng(3)
    obs_idx = np.arange(10, t_points - 1, 17)
    obs_t = grid[obs_idx]
    obs_y = jnp.asarray(
        np.sign(np.sin(1.3 * np.asarray(obs_t)))[:, None]
        + 0.2 * rng.normal(size=(len(obs_idx), 1)),
        dtype,
    )
    model = CVISitesSDE.initialize(
        prior_ssm=None,
        time_grid=grid,
        input_data=(obs_t, obs_y),
        likelihood=Gaussian(variance=jnp.asarray(0.04, dtype)),
        prior_initial_state=GaussianState(
            mu=jnp.zeros((1,), dtype), cov=jnp.asarray([[0.8]], dtype)
        ),
        prior_sde=sde,
        stabilize_ssm=True,
        clip_state_transitions=(-1.0, 1.0),
    )
    return model.set_linearized_prior()


@pytest.mark.parametrize(
    "dtype,site_tol,elbo_tol",
    [
        # f32: reduction-order noise in the KL quadrature gradients is
        # amplified by Q⁻¹-scale natural parameters — sites agree to ~1e-3
        (jnp.float32, 5e-3, 1e-4),
        # f64: both paths run the identical f64 algebra — near machine tight
        (jnp.float64, 1e-8, 1e-10),
    ],
)
def test_packed_step_matches_generic(dtype, site_tol, elbo_tol):
    n_steps = 3
    model = _build_model(dtype=dtype)
    lr = 0.3

    generic = model
    elbos_generic = []
    for _ in range(n_steps):
        generic = generic.update_data_sites(lr).update_girsanov_sites(lr)
        elbos_generic.append(float(generic.classic_elbo()))

    state = pack_state(model)
    elbos_packed = []
    step = jax.jit(packed_natgrad_step)
    for _ in range(n_steps):
        state, elbo = step(model, state, lr)
        elbos_packed.append(float(elbo))

    np.testing.assert_allclose(elbos_packed, elbos_generic, rtol=elbo_tol)

    restored = unpack_state(model, state)
    for packed_v, generic_v in [
        (restored.girsanov_sites.nat1, generic.girsanov_sites.nat1),
        (restored.girsanov_sites.nat2_diag, generic.girsanov_sites.nat2_diag),
        (restored.girsanov_sites.nat2_sub, generic.girsanov_sites.nat2_sub),
        (restored.data_sites.nat1, generic.data_sites.nat1),
        (restored.data_sites.nat2, generic.data_sites.nat2),
        (restored.fx_mus, generic.fx_mus),
        (restored.fx_covs, generic.fx_covs),
    ]:
        np.testing.assert_allclose(
            packed_v, generic_v, rtol=site_tol, atol=site_tol
        )


def test_pack_unpack_roundtrip():
    model = _build_model(t_points=64)
    state = pack_state(model)
    restored = unpack_state(model, state)
    np.testing.assert_array_equal(restored.girsanov_sites.nat1, model.girsanov_sites.nat1)
    np.testing.assert_array_equal(restored.fx_covs, model.fx_covs)
    np.testing.assert_array_equal(restored.data_sites.nat2, model.data_sites.nat2)


def test_packed_rejects_d2():
    import flax.struct  # noqa: F401

    model = _build_model(t_points=32)
    bad = model.replace(observations=jnp.zeros((4, 2), jnp.float32))
    with pytest.raises(ValueError):
        pack_state(bad)
