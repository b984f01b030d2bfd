"""VDP and CVI-DP end-to-end tests — the fork's core contribution, which the
reference leaves untested (SURVEY.md §4 "What is NOT tested").

Key parity checks (BASELINE configs #2/#3):
* OU (linear SDE) prior: VDP and CVI-DP posteriors must match the exact
  Kalman smoother on the same Euler-discretized prior.
* Double-well: ELBO improves; posterior tracks the simulated path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
from vi_diffusion_processes_tpu.models.vdp import VariationalMarkovGP
from vi_diffusion_processes_tpu.parallel.pskf import filter_smoother_with_sites
from vi_diffusion_processes_tpu.sde.drift import LinearDrift, linear_drift_to_ssm
from vi_diffusion_processes_tpu.sde.utils import euler_maruyama
from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE, OrnsteinUhlenbeckSDE

NOISE = 0.09
T = 101


@pytest.fixture
def ou_case(key):
    sde = OrnsteinUhlenbeckSDE(decay=jnp.asarray(1.0), q_mat=jnp.asarray([[1.0]]))
    grid = jnp.linspace(0.0, 2.0, T)
    path = euler_maruyama(sde, jnp.asarray([1.0]), grid, key)
    obs_idx = np.arange(5, T - 1, 5)
    obs_t = grid[obs_idx]
    obs_y = path[obs_idx] + 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (len(obs_idx), 1))
    return sde, grid, obs_idx, obs_t, obs_y


def exact_posterior_euler_ou(sde, grid, obs_idx, obs_y):
    """Exact smoother for the Euler-discretized OU prior + Gaussian sites."""
    n = grid.shape[0] - 1
    dt = grid[1] - grid[0]
    a = jnp.full((n, 1, 1), 1.0 - float(sde.decay) * dt)
    drift = LinearDrift(A=(a - 1.0) / dt, b=jnp.zeros((n, 1)))
    prior = linear_drift_to_ssm(
        drift, sde.q, grid, jnp.zeros((1,)), jnp.linalg.cholesky(sde.q)
    )
    nat1 = jnp.zeros((grid.shape[0], 1)).at[obs_idx].set(obs_y / NOISE)
    nat2 = jnp.zeros((grid.shape[0], 1, 1)).at[obs_idx].set(
        jnp.broadcast_to(jnp.eye(1) / NOISE, (len(obs_idx), 1, 1))
    )
    _, smooth = filter_smoother_with_sites(prior, nat1, nat2)
    return smooth


def test_vdp_ou_matches_exact_smoother(ou_case):
    """BASELINE config #2: VDP on a linear SDE converges to the exact
    posterior of the same (Euler-discretized) prior."""
    sde, grid, obs_idx, obs_t, obs_y = ou_case
    vdp = VariationalMarkovGP.initialize(
        (obs_t, obs_y), sde, grid, Gaussian(variance=jnp.asarray(NOISE))
    )
    step = jax.jit(lambda m, lr: m.inference_step(lr, x0_lr=lr))
    for _ in range(1500):
        vdp = step(vdp, 0.02)
    m_vdp, s_vdp = vdp.forward_pass()
    smooth = exact_posterior_euler_ou(sde, grid, obs_idx, obs_y)
    # O(dt) boundary mismatch at x0 (VDP's q(x0) update uses the first
    # transition's multipliers); interior matches much tighter
    np.testing.assert_allclose(m_vdp, smooth.means, atol=1.5e-2)
    np.testing.assert_allclose(s_vdp, smooth.covs, atol=1.5e-2)
    np.testing.assert_allclose(m_vdp[10:], smooth.means[10:], atol=3e-3)


def test_cvi_dp_ou_matches_exact_smoother(ou_case):
    """CVI-DP on a linear SDE: sites converge so that q equals the exact
    posterior of the Euler-discretized prior."""
    sde, grid, obs_idx, obs_t, obs_y = ou_case
    model = CVISitesSDE.initialize_sde(
        sde, grid, (obs_t, obs_y), Gaussian(variance=jnp.asarray(NOISE)),
        stabilize_ssm=False,
    )
    inner = jax.jit(lambda m, lr: m.update_data_sites(lr).update_girsanov_sites(lr))
    for outer in range(4):
        for _ in range(8):
            model = inner(model, 0.8)
        model = model.relinearize()
    smooth = exact_posterior_euler_ou(sde, grid, obs_idx, obs_y)
    m_q, s_q = model.dist_q.marginals()
    np.testing.assert_allclose(m_q, smooth.means, atol=2e-2)
    np.testing.assert_allclose(s_q, smooth.covs, atol=2e-2)


from flax import struct

from vi_diffusion_processes_tpu.sde.zoo import _ConstantDiffusionSDE


@struct.dataclass
class RotatingOU2D(_ConstantDiffusionSDE):
    """2-D linear SDE ``dx = −Γ x dt + dB`` with Γ = [[γ, −ω], [ω, γ]]
    (a damped harmonic/rotating OU) — linear, so CVI-DP must converge to
    the exact Kalman smoother of the Euler-discretized prior.  Defined
    here (not the zoo) — it exists purely as the d=2 analytic anchor."""

    gamma: jnp.ndarray
    omega: jnp.ndarray
    q_mat: jnp.ndarray  # [2, 2]

    @property
    def state_dim(self) -> int:
        return 2

    def drift(self, x, t=None):
        dx1 = -self.gamma * x[..., 0] + self.omega * x[..., 1]
        dx2 = -self.omega * x[..., 0] - self.gamma * x[..., 1]
        return jnp.stack([dx1, dx2], axis=-1)

    def drift_ch(self, xs, t=None):
        x1, x2 = xs
        return (
            -self.gamma * x1 + self.omega * x2,
            -self.omega * x1 - self.gamma * x2,
        )


@pytest.mark.parametrize("channelized", [False, True], ids=["generic", "channelized"])
def test_cvi_dp_2d_linear_sde_matches_exact_smoother(key, monkeypatch, channelized):
    """d=2 analytic anchor: CVI-DP on a rotating-OU (linear) 2-D SDE equals
    the exact Kalman smoother of the same Euler-discretized prior — an
    independent exact anchor for the d≥2 engine (the channelized variant
    forces the structure-of-scalars filter/smoother path)."""
    if channelized:
        import vi_diffusion_processes_tpu.parallel.pskf as pskf

        monkeypatch.setattr(pskf, "CH_THRESHOLD", 16)

    gamma, omega = 0.8, 2.0
    q = 0.6 * jnp.eye(2) + 0.1
    sde = RotatingOU2D(
        gamma=jnp.asarray(gamma), omega=jnp.asarray(omega), q_mat=q
    )
    grid = jnp.linspace(0.0, 2.0, T)
    path = euler_maruyama(sde, jnp.asarray([1.0, -0.5]), grid, key)
    obs_idx = np.arange(5, T - 1, 5)
    obs_t = grid[obs_idx]
    obs_y = path[obs_idx] + 0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), (len(obs_idx), 2)
    )

    model = CVISitesSDE.initialize_sde(
        sde, grid, (obs_t, obs_y), Gaussian(variance=jnp.asarray(NOISE)),
        stabilize_ssm=False,
    )
    inner = jax.jit(lambda m, lr: m.update_data_sites(lr).update_girsanov_sites(lr))
    for _outer in range(4):
        for _ in range(8):
            model = inner(model, 0.8)
        model = model.relinearize()

    # exact smoother of the Euler-discretized prior + Gaussian sites
    n = grid.shape[0] - 1
    dt = grid[1] - grid[0]
    big_gamma = jnp.asarray([[gamma, -omega], [omega, gamma]])
    drift = LinearDrift(
        A=jnp.broadcast_to(-big_gamma, (n, 2, 2)), b=jnp.zeros((n, 2))
    )
    prior = linear_drift_to_ssm(
        drift, q, grid, jnp.zeros((2,)), jnp.linalg.cholesky(q)
    )
    nat1 = jnp.zeros((grid.shape[0], 2)).at[obs_idx].set(obs_y / NOISE)
    nat2 = jnp.zeros((grid.shape[0], 2, 2)).at[obs_idx].set(
        jnp.broadcast_to(jnp.eye(2) / NOISE, (len(obs_idx), 2, 2))
    )
    _, smooth = filter_smoother_with_sites(prior, nat1, nat2)

    m_q, s_q = model.dist_q.marginals()
    np.testing.assert_allclose(m_q, smooth.means, atol=2e-2)
    np.testing.assert_allclose(s_q, smooth.covs, atol=2e-2)


def test_cvi_dp_double_well(key):
    """BASELINE config #3: double-well CVI-DP — ELBO rises, posterior mean
    tracks the simulated path."""
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]]))
    grid = jnp.linspace(0.0, 2.0, 201)
    path = euler_maruyama(sde, jnp.asarray([1.0]), grid, key)
    obs_idx = np.arange(10, 200, 10)
    obs_t = grid[obs_idx]
    obs_y = path[obs_idx] + 0.1 * jax.random.normal(jax.random.fold_in(key, 7), (len(obs_idx), 1))
    model = CVISitesSDE.initialize_sde(
        sde, grid, (obs_t, obs_y), Gaussian(variance=jnp.asarray(0.01))
    )
    inner = jax.jit(lambda m, lr: m.update_data_sites(lr).update_girsanov_sites(lr))
    e0 = float(model.classic_elbo())
    for outer in range(3):
        for _ in range(5):
            model = inner(model, 0.5)
        model = model.relinearize()
    e1 = float(model.classic_elbo())
    assert e1 > e0
    rmse = float(jnp.sqrt(jnp.mean((model.fx_mus[:, 0] - path[:, 0]) ** 2)))
    assert rmse < 0.35


def test_vdp_elbo_improves_double_well(key):
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]]))
    grid = jnp.linspace(0.0, 2.0, 201)
    path = euler_maruyama(sde, jnp.asarray([1.0]), grid, key)
    obs_idx = np.arange(10, 200, 10)
    obs_t = grid[obs_idx]
    obs_y = path[obs_idx] + 0.3 * jax.random.normal(jax.random.fold_in(key, 7), (len(obs_idx), 1))
    vdp = VariationalMarkovGP.initialize(
        (obs_t, obs_y), sde, grid, Gaussian(variance=jnp.asarray(0.09))
    )
    step = jax.jit(lambda m, lr: m.inference_step(lr, x0_lr=lr))
    e0 = float(vdp.elbo())
    for _ in range(20):
        vdp = step(vdp, 1e-6)  # warmup (vi_markov_gp_trainer.py:100-104)
    for _ in range(150):
        vdp = step(vdp, 0.02)
    e1 = float(vdp.elbo())
    assert e1 > e0


def test_vdp_grad_prior_params_nonzero(ou_case):
    """Drift learning: ∂E_sde/∂θ_p flows."""
    sde, grid, obs_idx, obs_t, obs_y = ou_case
    vdp = VariationalMarkovGP.initialize(
        (obs_t, obs_y), sde, grid, Gaussian(variance=jnp.asarray(NOISE))
    )
    step = jax.jit(lambda m, lr: m.inference_step(lr, x0_lr=lr))
    for _ in range(50):
        vdp = step(vdp, 0.02)
    grads = vdp.grad_prior_sde_params()
    assert np.isfinite(float(grads.decay))
    assert abs(float(grads.decay)) > 0.0


def test_cvi_dp_prior_grads(ou_case):
    sde, grid, obs_idx, obs_t, obs_y = ou_case
    model = CVISitesSDE.initialize_sde(
        sde, grid, (obs_t, obs_y), Gaussian(variance=jnp.asarray(NOISE))
    )
    inner = jax.jit(lambda m, lr: m.update_data_sites(lr).update_girsanov_sites(lr))
    for _ in range(5):
        model = inner(model, 0.5)
    g_kl = model.grad_kl_wrt_prior_params()
    g_ve = model.grad_ve_wrt_prior_params()
    assert np.isfinite(float(g_kl.decay))
    assert np.isfinite(float(g_ve.decay))


def test_cvi_dp_vanderpol_2d(key):
    """d=2 state: the general (non-scalar) UDU'/BTD path end-to-end
    (configs/prior_sde/vanderpol.yaml is a shipped reference experiment)."""
    from vi_diffusion_processes_tpu.sde.zoo import VanderPolOscillatorSDE

    sde = VanderPolOscillatorSDE(a=jnp.asarray(0.5), tau=jnp.asarray(1.0), q_mat=0.5 * jnp.eye(2))
    grid = jnp.linspace(0.0, 3.0, 201)
    x0 = jnp.asarray([1.0, 0.0])
    path = euler_maruyama(sde, x0, grid, key)
    rng = np.random.default_rng(4)
    idx = np.sort(rng.choice(np.arange(1, 200), 25, replace=False))
    obs_t = grid[idx]
    obs_y = path[idx] + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (25, 2))

    model = CVISitesSDE.initialize_sde(
        sde, grid, (obs_t, obs_y), Gaussian(variance=jnp.asarray(0.01))
    )
    e0 = float(model.classic_elbo())
    step = jax.jit(lambda m: m.update_data_sites(0.3).update_girsanov_sites(0.3))
    for i in range(12):
        model = step(model)
        if i % 3 == 2:
            model = model.relinearize()
    e1 = float(model.classic_elbo())
    assert e1 > e0 + 100.0
    means, _ = model.dist_q.marginals()
    rmse = float(jnp.sqrt(jnp.mean((means - path) ** 2)))
    assert rmse < 0.5


def test_cvi_dp_mlp_drift(key):
    """Neural-network drift prior: inference + finite drift-parameter grads
    (configs/prior_sde/mlpdrift.yaml)."""
    from vi_diffusion_processes_tpu.sde.zoo import MLPDrift

    true_sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]]))
    grid = jnp.linspace(0.0, 3.0, 301)
    path = euler_maruyama(true_sde, jnp.asarray([1.0]), grid, key)
    rng = np.random.default_rng(5)
    idx = np.sort(rng.choice(np.arange(1, 300), 30, replace=False))
    obs_t = grid[idx]
    obs_y = path[idx] + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (30, 1))

    mlp = MLPDrift.initialize(jax.random.fold_in(key, 2), q_mat=jnp.asarray([[0.8]]))
    model = CVISitesSDE.initialize_sde(
        mlp, grid, (obs_t, obs_y), Gaussian(variance=jnp.asarray(0.01))
    )
    e0 = float(model.classic_elbo())
    step = jax.jit(lambda m: m.update_data_sites(0.2).update_girsanov_sites(0.2))
    for i in range(10):
        model = step(model)
        if i % 2 == 1:
            model = model.relinearize()
    assert float(model.classic_elbo()) > e0
    g_kl = model.grad_kl_wrt_prior_params()
    leaves = jax.tree_util.tree_leaves(g_kl)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_vdp_lagrange_parallel_matches_sequential(key):
    """The parallel affine-scan Lagrange backward pass (vdp.py
    update_lagrange) must equal the reference's sequential recursion
    (vi_sde.py:337-347) exactly (f64)."""
    from jax import lax

    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]]))
    grid = jnp.linspace(0.0, 2.0, 97)
    path = euler_maruyama(sde, jnp.asarray([0.5]), grid, key)
    obs_idx = np.arange(4, 95, 7)
    obs_y = path[obs_idx] + 0.2 * jax.random.normal(
        jax.random.fold_in(key, 3), (len(obs_idx), 1)
    )
    vdp = VariationalMarkovGP.initialize(
        (grid[obs_idx], obs_y), sde, grid, Gaussian(variance=jnp.asarray(NOISE))
    )
    # put the model in a non-trivial state
    vdp = vdp.inference_step(1e-3)
    m, s = vdp.forward_pass()
    out = vdp.update_lagrange(m, s)

    # sequential oracle (exact transliteration of the reference loop)
    d_e_dm, d_e_ds = vdp._grad_e_sde(m, s)
    d_obs_m, d_obs_s = vdp._jump_conditions(m, s)
    d_e_dm, d_e_ds = vdp._stab(d_e_dm), vdp._stab(d_e_ds)
    d_obs_m, d_obs_s = vdp._stab(d_obs_m), vdp._stab(d_obs_s)
    dt = vdp.dt
    d = vdp.state_dim
    n_tr = vdp.A.shape[0]
    psi_last = 1e-10 * jnp.eye(d, dtype=vdp.b.dtype)
    lam_last = jnp.zeros((d,), vdp.b.dtype)

    def step(carry, inputs):
        psi_t, lam_t = carry
        a_t, de_ds_t, de_dm_t, dobs_s_t, dobs_m_t = inputs
        psi_prev = psi_t - dt * (2.0 * psi_t @ a_t - de_ds_t) - dobs_s_t
        lam_prev = lam_t - dt * (jnp.einsum("ij,j->i", a_t, lam_t) - de_dm_t) - dobs_m_t
        return (psi_prev, lam_prev), (psi_prev, lam_prev)

    _, (psi_rest, lam_rest) = lax.scan(
        step,
        (psi_last, lam_last),
        (vdp.A[1:], d_e_ds[1:], d_e_dm[1:], d_obs_s[1:n_tr], d_obs_m[1:n_tr]),
        reverse=True,
    )
    ref_psi = jnp.concatenate([psi_rest, psi_last[None]], axis=0)
    ref_lam = jnp.concatenate([lam_rest, lam_last[None]], axis=0)

    np.testing.assert_allclose(out.psi_lagrange, ref_psi, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(out.lambda_lagrange, ref_lam, rtol=1e-9, atol=1e-11)
