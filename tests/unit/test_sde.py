"""SDE package tests (mirrors the reference's tests/unit/test_sde.py):
Euler–Maruyama determinism/shapes, linearize_sde vs closed-form OU,
Girsanov-style KL vs the closed-form SSM KL."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.sde.base import SDE
from vi_diffusion_processes_tpu.sde.drift import LinearDrift, linear_drift_from_ssm, linear_drift_to_ssm
from vi_diffusion_processes_tpu.sde.utils import (
    Gaussian,
    euler_maruyama,
    linearize_sde,
    ssm_kl_along_gaussian_path,
    ssm_kl_with_grads_wrt_exp_params,
    transform_girsanov_sites,
    ssm_to_btd_nat,
)
from vi_diffusion_processes_tpu.sde.zoo import (
    BenesSDE,
    DoubleWellSDE,
    MLPDrift,
    OrnsteinUhlenbeckSDE,
    SineDiffusionSDE,
    SqrtDiffusionSDE,
    VanderPolOscillatorSDE,
)
from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel
from vi_diffusion_processes_tpu.ssm.transforms import naturals_to_ssm

from ..tools.oracles import random_ssm_params


def make_zoo(key):
    q1 = jnp.asarray([[0.7]])
    return [
        OrnsteinUhlenbeckSDE(decay=jnp.asarray(1.1), q_mat=q1),
        DoubleWellSDE(q_mat=q1),
        BenesSDE(theta=jnp.asarray(0.8), q_mat=q1),
        SineDiffusionSDE(theta=jnp.asarray(0.3), q_mat=q1),
        SqrtDiffusionSDE(theta=jnp.asarray(1.2), q_mat=q1),
        MLPDrift.initialize(key, q1),
    ]


def test_zoo_shapes_and_jacobians(key):
    for sde in make_zoo(key):
        x = jnp.asarray([[0.5], [-1.0], [2.0]])
        f = sde.drift(x)
        assert f.shape == x.shape
        jac = sde.gradient_drift(x)
        assert jac.shape == (3, 1, 1)
        # Jacobian matches finite differences
        eps = 1e-6
        fd = (sde.drift(x + eps) - sde.drift(x - eps)) / (2 * eps)
        np.testing.assert_allclose(jac[..., 0], fd, rtol=1e-4, atol=1e-6)


def test_vanderpol_jacobian(key):
    sde = VanderPolOscillatorSDE(a=jnp.asarray(1.3), tau=jnp.asarray(0.9), q_mat=jnp.eye(2))
    x = jax.random.normal(key, (5, 2))
    jac = sde.gradient_drift(x)
    assert jac.shape == (5, 2, 2)
    want = jax.vmap(jax.jacrev(lambda z: sde.drift(z)))(x)
    np.testing.assert_allclose(jac, want, rtol=1e-10)


def test_euler_maruyama_shapes_and_determinism(key):
    sde = OrnsteinUhlenbeckSDE(decay=jnp.asarray(1.0), q_mat=jnp.asarray([[1e-20]]))
    grid = jnp.linspace(0.0, 1.0, 51)
    x0 = jnp.asarray([[1.0], [2.0], [-1.0]])  # 3 trajectories
    vals = euler_maruyama(sde, x0, grid, key)
    assert vals.shape == (3, 51, 1)
    np.testing.assert_allclose(vals[:, 0], x0, rtol=1e-12)
    # zero-noise limit: deterministic exponential decay x_{k+1} = x_k(1-λdt)
    want = x0[:, 0] * (1 - 0.02) ** 50
    np.testing.assert_allclose(vals[:, -1, 0], want, rtol=1e-8)


def test_linearize_sde_ou_closed_form(key):
    """For a linear (OU) SDE the statistical linearization is exact:
    A* = −λ·dt + 1, b* = 0 (mirrors reference test_sde.py:66-106)."""
    decay = 1.3
    sde = OrnsteinUhlenbeckSDE(decay=jnp.asarray(decay), q_mat=jnp.asarray([[0.5]]))
    t = jnp.linspace(0.0, 1.0, 21)
    n = 20
    m = jax.random.normal(key, (n, 1))
    s = jnp.ones((n, 1, 1)) * 0.3
    lin = linearize_sde(
        sde, t, Gaussian(mu=m, cov=s), Gaussian(mu=jnp.zeros((1,)), cov=jnp.eye(1))
    )
    dt = 0.05
    np.testing.assert_allclose(lin.state_transitions, (1 - decay * dt) * np.ones((n, 1, 1)), rtol=1e-9)
    np.testing.assert_allclose(lin.state_offsets, 0.0, atol=1e-12)
    np.testing.assert_allclose(
        lin.chol_process_covariances, np.sqrt(0.5 * dt) * np.ones((n, 1, 1)), rtol=1e-9
    )


def test_ssm_kl_quadrature_matches_closed_form(rng):
    """The 1D-reduced quadrature KL between two linear SSMs must equal the
    closed-form Gauss–Markov KL (mirrors test_sde.py:149-197)."""
    p1 = random_ssm_params(rng, (), 12, 1)
    p2 = random_ssm_params(rng, (), 12, 1)
    # q and p must share the initial state for the path-KL comparison,
    # and transitions should be contractive for quadrature accuracy
    p2["initial_mean"] = p1["initial_mean"]
    p2["chol_initial_covariance"] = p1["chol_initial_covariance"]
    ssm_q = StateSpaceModel(**{k: jnp.asarray(v) for k, v in p1.items()})
    ssm_p = StateSpaceModel(**{k: jnp.asarray(v) for k, v in p2.items()})

    kl_val, grads = ssm_kl_with_grads_wrt_exp_params(ssm_q, ssm_p)
    want = ssm_q.kl_divergence(ssm_p)
    np.testing.assert_allclose(kl_val, want, rtol=1e-6)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_linear_drift_roundtrip(rng):
    """set_from_ssm ∘ to_ssm round trip (test_sde.py:200-226)."""
    params = random_ssm_params(rng, (), 10, 1)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    dt = 0.1
    drift = linear_drift_from_ssm(ssm, dt)
    t = jnp.linspace(0.0, 1.0, 11)
    back = linear_drift_to_ssm(
        drift,
        q=ssm.process_covariances / dt,
        transition_times=t,
        initial_mean=ssm.initial_mean,
        initial_chol_covariance=ssm.chol_initial_covariance,
    )
    np.testing.assert_allclose(back.state_transitions, ssm.state_transitions, rtol=1e-9)
    np.testing.assert_allclose(back.state_offsets, ssm.state_offsets, rtol=1e-9)


def test_girsanov_site_transform_preserves_posterior(rng):
    """Re-basing sites between priors must leave the summed naturals (and
    hence q) unchanged (sde_utils.py:550-568 semantics)."""
    p_old = random_ssm_params(rng, (), 8, 1)
    p_new = random_ssm_params(rng, (), 8, 1)
    ssm_old = StateSpaceModel(**{k: jnp.asarray(v) for k, v in p_old.items()})
    ssm_new = StateSpaceModel(**{k: jnp.asarray(v) for k, v in p_new.items()})

    from vi_diffusion_processes_tpu.sde.utils import BTDNaturals

    sites = BTDNaturals(
        nat1=jnp.asarray(rng.normal(size=(9, 1))),
        nat2_diag=jnp.asarray(-(rng.random((9, 1, 1)) + 0.5)),
        nat2_sub=jnp.asarray(0.1 * rng.normal(size=(8, 1, 1))),
    )
    new_sites = transform_girsanov_sites(sites, ssm_old, ssm_new)
    old_nats = ssm_to_btd_nat(ssm_old)
    new_nats = ssm_to_btd_nat(ssm_new)
    np.testing.assert_allclose(
        new_sites.nat1 + new_nats.nat1, sites.nat1 + old_nats.nat1, rtol=1e-9
    )
    np.testing.assert_allclose(
        new_sites.nat2_diag + new_nats.nat2_diag,
        sites.nat2_diag + old_nats.nat2_diag,
        rtol=1e-9,
    )
