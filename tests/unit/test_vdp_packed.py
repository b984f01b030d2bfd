"""Packed (structure-of-scalars) VDP ≡ generic VariationalMarkovGP step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.vdp import VariationalMarkovGP
from vi_diffusion_processes_tpu.models.vdp_packed import (
    pack_vdp,
    packed_inference_step,
    packed_vdp_elbo,
    unpack_vdp,
)
from vi_diffusion_processes_tpu.sde.utils import Gaussian as GaussianState
from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE


def _make_model(stabilize=False, n=512):
    rng = np.random.default_rng(3)
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]]))
    grid = jnp.linspace(0.0, 5.0, n)
    obs_idx = np.arange(20, n - 1, 37)
    obs_y = jnp.asarray(
        np.sign(np.sin(1.3 * np.asarray(grid[obs_idx])))[:, None]
        + 0.2 * rng.normal(size=(len(obs_idx), 1))
    )
    model = VariationalMarkovGP.initialize(
        (grid[obs_idx], obs_y),
        sde,
        grid,
        Gaussian(variance=jnp.asarray(0.04)),
        prior_initial_state=GaussianState(
            mu=jnp.asarray([0.1]), cov=jnp.asarray([[0.6]])
        ),
        stabilize=stabilize,
    )
    # start from a non-trivial (A, b) so every term is exercised
    model = model.replace(
        A=jnp.asarray(rng.uniform(0.1, 0.8, size=model.A.shape)),
        b=jnp.asarray(rng.normal(0.0, 0.3, size=model.b.shape)),
    )
    return model


@pytest.mark.parametrize("stabilize", [False, True])
def test_packed_step_matches_generic(stabilize):
    model = _make_model(stabilize=stabilize)
    state = pack_vdp(model)

    gen_step = jax.jit(lambda m: m.inference_step(0.05, x0_lr=0.02))
    pk_step = jax.jit(lambda s: packed_inference_step(model, s, 0.05, x0_lr=0.02))

    gen = model
    for _ in range(3):
        gen = gen_step(gen)
        state = pk_step(state)

    np.testing.assert_allclose(state.a, gen.A[..., 0, 0], rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(state.b, gen.b[..., 0], rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        state.lam, gen.lambda_lagrange[..., 0], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        state.psi, gen.psi_lagrange[..., 0, 0], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(state.q0_mean, gen.q_initial_mean[0], rtol=1e-9)
    np.testing.assert_allclose(state.q0_var, gen.q_initial_cov[0, 0], rtol=1e-9)

    # ELBO of the final state agrees
    e_gen = float(gen.elbo())
    e_pk = float(packed_vdp_elbo(model, state))
    np.testing.assert_allclose(e_pk, e_gen, rtol=1e-9)

    # unpacking restores an API-shaped model whose elbo matches too
    restored = unpack_vdp(model, state)
    np.testing.assert_allclose(float(restored.elbo()), e_gen, rtol=1e-9)


def test_packed_vdp_improves_elbo():
    model = _make_model()
    state = pack_vdp(model)
    step = jax.jit(lambda s, lr: packed_inference_step(model, s, lr))
    for _ in range(20):
        state = step(state, 1e-6)
    e0 = float(packed_vdp_elbo(model, state))
    for _ in range(40):
        state = step(state, 0.02)
    e1 = float(packed_vdp_elbo(model, state))
    assert np.isfinite(e0) and np.isfinite(e1)
    assert e1 > e0
