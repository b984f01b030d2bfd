"""CVISitesTrainer's packed inner loop ≡ the generic inner loop.

The trainer dispatches the site iteration onto the structure-of-scalars
packed state (d=1) or channel state (d=2/3); the control flow (lr decay,
tolerance stopping, relinearization) must land in the same place.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
from vi_diffusion_processes_tpu.optim.trainers import CVISitesTrainer
from vi_diffusion_processes_tpu.sde.utils import euler_maruyama, Gaussian as GaussianState
from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE, VanderPolOscillatorSDE


def _dw_model(key):
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]], jnp.float32))
    grid = jnp.linspace(0.0, 3.0, 151, dtype=jnp.float32)
    path = euler_maruyama(sde, jnp.asarray([1.0], jnp.float32), grid, key)
    obs_idx = np.arange(5, 149, 7)
    obs_y = jnp.asarray(
        np.asarray(path)[obs_idx]
        + 0.2 * np.random.default_rng(0).normal(size=(len(obs_idx), 1)),
        jnp.float32,
    )
    return CVISitesSDE.initialize_sde(
        prior_sde=sde,
        time_grid=grid,
        input_data=(grid[obs_idx], obs_y),
        likelihood=Gaussian(variance=jnp.asarray(0.04, jnp.float32)),
        prior_initial_state=GaussianState(
            mu=jnp.asarray([1.0], jnp.float32), cov=jnp.asarray([[0.8]], jnp.float32)
        ),
    )


def test_trainer_packed_matches_generic_d1(key):
    model = _dw_model(key)
    t_packed = CVISitesTrainer(model=model, sites_lr=0.3, max_inner_iters=8,
                               max_outer_iters=2, use_packed=True)
    t_generic = CVISitesTrainer(model=model, sites_lr=0.3, max_inner_iters=8,
                                max_outer_iters=2, use_packed=False)
    assert t_packed._packed is not None
    assert t_generic._packed is None
    e_p = t_packed.optimize()
    e_g = t_generic.optimize()
    np.testing.assert_allclose(e_p, e_g, rtol=1e-3, atol=1e-3)


def test_trainer_packed_d2_converges(key):
    sde = VanderPolOscillatorSDE(
        a=jnp.asarray(1.0, jnp.float32),
        tau=jnp.asarray(1.0, jnp.float32),
        q_mat=0.5 * jnp.eye(2, dtype=jnp.float32),
    )
    grid = jnp.linspace(0.0, 2.0, 101, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    obs_idx = np.arange(4, 99, 9)
    obs_y = jnp.asarray(
        np.stack(
            [np.sin(np.asarray(grid[obs_idx])), np.cos(np.asarray(grid[obs_idx]))], -1
        )
        + 0.2 * rng.normal(size=(len(obs_idx), 2)),
        jnp.float32,
    )
    model = CVISitesSDE.initialize_sde(
        prior_sde=sde,
        time_grid=grid,
        input_data=(grid[obs_idx], obs_y),
        likelihood=Gaussian(variance=jnp.asarray(0.04, jnp.float32)),
        prior_initial_state=GaussianState(
            mu=jnp.zeros((2,), jnp.float32), cov=0.5 * jnp.eye(2, dtype=jnp.float32)
        ),
    )
    trainer = CVISitesTrainer(model=model, sites_lr=0.2, max_inner_iters=6,
                              max_outer_iters=2)
    assert trainer._packed is not None
    elbos = trainer.optimize()
    assert np.isfinite(elbos).all()
    assert elbos[-1] > elbos[0] - 1e-6
