"""Channelized packed CVI-DP step (d=2) ≡ the generic model step.

Same contract as tests/unit/test_cvi_dp_packed.py for d=1: the channel
loop (models/cvi_dp_packed_ch.py) mirrors update_data_sites →
update_girsanov_sites → classic_elbo exactly; f64 runs near machine-tight,
f32 within reduction-order noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
from vi_diffusion_processes_tpu.models.cvi_dp_packed_ch import (
    pack_state_ch,
    packed_natgrad_step_ch,
    unpack_state_ch,
)
from vi_diffusion_processes_tpu.sde.utils import Gaussian as GaussianState
from vi_diffusion_processes_tpu.sde.zoo import VanderPolOscillatorSDE


def _build_model(t_points=200, dtype=jnp.float32):
    sde = VanderPolOscillatorSDE(
        a=jnp.asarray(1.0, dtype),
        tau=jnp.asarray(1.0, dtype),
        q_mat=0.5 * jnp.eye(2, dtype=dtype),
    )
    grid = jnp.linspace(0.0, 2.0, t_points, dtype=dtype)
    rng = np.random.default_rng(4)
    obs_idx = np.arange(8, t_points - 1, 13)
    obs_t = grid[obs_idx]
    obs_y = jnp.asarray(
        np.stack(
            [np.sin(1.1 * np.asarray(obs_t)), np.cos(1.1 * np.asarray(obs_t))],
            -1,
        )
        + 0.2 * rng.normal(size=(len(obs_idx), 2)),
        dtype,
    )
    model = CVISitesSDE.initialize(
        prior_ssm=None,
        time_grid=grid,
        input_data=(obs_t, obs_y),
        likelihood=Gaussian(variance=jnp.asarray(0.04, dtype)),
        prior_initial_state=GaussianState(
            mu=jnp.zeros((2,), dtype), cov=0.5 * jnp.eye(2, dtype=dtype)
        ),
        prior_sde=sde,
        stabilize_ssm=True,
        clip_state_transitions=(-2.0, 2.0),
    )
    return model.set_linearized_prior()


@pytest.mark.parametrize(
    "dtype,site_tol,elbo_tol",
    [
        (jnp.float32, 1e-2, 5e-4),
        (jnp.float64, 1e-7, 1e-9),
    ],
)
def test_packed_ch_step_matches_generic(dtype, site_tol, elbo_tol):
    n_steps = 3
    model = _build_model(dtype=dtype)
    lr = 0.2

    generic = model
    elbos_generic = []
    for _ in range(n_steps):
        generic = generic.update_data_sites(lr).update_girsanov_sites(lr)
        elbos_generic.append(float(generic.classic_elbo()))

    state = pack_state_ch(model)
    elbos_packed = []
    step = jax.jit(packed_natgrad_step_ch)
    for _ in range(n_steps):
        state, elbo = step(model, state, lr)
        elbos_packed.append(float(elbo))

    np.testing.assert_allclose(elbos_packed, elbos_generic, rtol=elbo_tol)

    restored = unpack_state_ch(model, state)
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


def test_pack_unpack_roundtrip_ch():
    model = _build_model(t_points=48)
    state = pack_state_ch(model)
    restored = unpack_state_ch(model, state)
    np.testing.assert_array_equal(
        restored.girsanov_sites.nat2_diag, model.girsanov_sites.nat2_diag
    )
    np.testing.assert_array_equal(restored.fx_covs, model.fx_covs)
    np.testing.assert_array_equal(restored.data_sites.nat2, model.data_sites.nat2)
