"""Batched packed CVI-DP step ≡ the generic model step, per trajectory.

The [B, T]-plane hot loop (models/cvi_dp_packed_batched.py) flattens B
independent chains into ONE block-diagonal BTD system of length B·T and
runs the flagship flat d=1 path on it.  Correctness hinges on the zero
cross-boundary couplings decoupling every sweep exactly; here we drive
B trajectories with *different* observations and initial states through
several steps and compare against the vmapped generic step
(variational_cvi_sde.py:279-352 semantics) — any cross-trajectory leakage
or KL mask error shows up immediately.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
from vi_diffusion_processes_tpu.models.cvi_dp_packed_batched import (
    pack_state_batched,
    packed_natgrad_step_batched,
    unpack_state_batched,
)
from vi_diffusion_processes_tpu.sde.utils import Gaussian as GaussianState
from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE


def _build_models(batch=3, t_points=300, dtype=jnp.float64):
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]], dtype))
    grid = jnp.linspace(0.0, 4.0, t_points, dtype=dtype)
    models = []
    for j in range(batch):
        rng = np.random.default_rng(100 + j)
        obs_idx = np.arange(7 + j, t_points - 1, 13)
        obs_t = grid[obs_idx]
        obs_y = jnp.asarray(
            np.sign(np.sin((1.1 + 0.2 * j) * np.asarray(obs_t)))[:, None]
            + 0.2 * rng.normal(size=(len(obs_idx), 1)),
            dtype,
        )
        m = CVISitesSDE.initialize(
            prior_ssm=None,
            time_grid=grid,
            input_data=(obs_t, obs_y),
            likelihood=Gaussian(variance=jnp.asarray(0.04, dtype)),
            prior_initial_state=GaussianState(
                mu=jnp.full((1,), 0.1 * j, dtype),
                cov=jnp.asarray([[0.8 + 0.1 * j]], dtype),
            ),
            prior_sde=sde,
            stabilize_ssm=True,
            clip_state_transitions=(-1.0, 1.0),
        )
        models.append(m.set_linearized_prior())
    return models


def _pad_obs(models):
    """Stack models with equal obs counts (they already are by design)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *models)


@pytest.mark.parametrize(
    "dtype,site_tol,elbo_tol",
    [
        (jnp.float32, 5e-3, 2e-4),
        (jnp.float64, 1e-8, 1e-10),
    ],
)
def test_batched_packed_matches_generic(dtype, site_tol, elbo_tol):
    n_steps = 3
    lr = 0.3
    models = _build_models(dtype=dtype)
    stacked = _pad_obs(models)

    # generic path, per trajectory
    elbos_generic = []
    generics = list(models)
    for _ in range(n_steps):
        step_elbos = []
        for j, g in enumerate(generics):
            g = g.update_data_sites(lr).update_girsanov_sites(lr)
            generics[j] = g
            step_elbos.append(float(g.classic_elbo()))
        elbos_generic.append(step_elbos)

    # batched packed path
    state = jax.jit(pack_state_batched)(stacked)
    rep = models[0]
    step = jax.jit(packed_natgrad_step_batched)
    elbos_packed = []
    for _ in range(n_steps):
        state, elbo = step(rep, state, lr)
        elbos_packed.append(np.asarray(elbo).tolist())

    np.testing.assert_allclose(elbos_packed, elbos_generic, rtol=elbo_tol, atol=elbo_tol)

    restored = unpack_state_batched(stacked, state)
    final_stacked = _pad_obs(generics)
    for packed_v, generic_v in [
        (restored.girsanov_sites.nat1, final_stacked.girsanov_sites.nat1),
        (restored.girsanov_sites.nat2_diag, final_stacked.girsanov_sites.nat2_diag),
        (restored.girsanov_sites.nat2_sub, final_stacked.girsanov_sites.nat2_sub),
        (restored.data_sites.nat1, final_stacked.data_sites.nat1),
        (restored.data_sites.nat2, final_stacked.data_sites.nat2),
        (restored.fx_mus, final_stacked.fx_mus),
        (restored.fx_covs, final_stacked.fx_covs),
    ]:
        np.testing.assert_allclose(packed_v, generic_v, rtol=site_tol, atol=site_tol)


def test_batched_pack_unpack_roundtrip():
    models = _build_models(batch=2, t_points=64)
    stacked = _pad_obs(models)
    state = pack_state_batched(stacked)
    restored = unpack_state_batched(stacked, state)
    np.testing.assert_array_equal(
        restored.girsanov_sites.nat1, stacked.girsanov_sites.nat1
    )
    np.testing.assert_array_equal(restored.fx_covs, stacked.fx_covs)
    np.testing.assert_array_equal(restored.data_sites.nat2, stacked.data_sites.nat2)
