"""All three Kalman classes vs the sequential NumPy oracle over the
state_dim × output_dim grid.

Mirrors the reference's oracle strategy (tests/tools/numpy_kalman_filter.py
+ tests/integration/test_kalman_filter.py:60-150): filtered/smoothed
moments and per-step log-likelihoods from a hand-written sequential filter,
compared against the parallel-scan engine behind
``KalmanFilter`` / ``KalmanFilterWithSites`` / ``KalmanFilterWithSparseSites``.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.parallel.kalman import (
    KalmanFilter,
    KalmanFilterWithSites,
    KalmanFilterWithSparseSites,
)
from vi_diffusion_processes_tpu.parallel.sites import GaussianSites
from vi_diffusion_processes_tpu.ssm.emission import EmissionModel
from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel

from ..tools.oracles import (
    kalman_filter_rts,
    kf_forward_filter,
    kf_sparse_forward_filter,
    random_spd,
    random_ssm_params,
    rts_backward_pass,
)

N = 11  # transitions; n+1 chain states


def _setup(rng, d, out):
    params = random_ssm_params(rng, (), N, d)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    h = rng.normal(size=(N + 1, out, d))
    r = random_spd(rng, (), out) / out
    y = rng.normal(size=(N + 1, out))
    return params, ssm, h, r, y


GRID = [(d, out) for d in (1, 2, 3) for out in (1, 2)]


@pytest.mark.parametrize("d,out", GRID, ids=[f"d{d}-out{o}" for d, o in GRID])
def test_kalman_filter_matches_numpy_oracle(rng, d, out):
    params, ssm, h, r, y = _setup(rng, d, out)
    kf = KalmanFilter(
        state_space_model=ssm,
        emission_model=EmissionModel(jnp.asarray(h)),
        observations=jnp.asarray(y),
        chol_obs_covariance=jnp.asarray(np.linalg.cholesky(r)),
    )
    log_liks, fm, fc, _, _ = kf_forward_filter(params, h, r, y)
    np.testing.assert_allclose(kf.log_likelihood(), log_liks.sum(), rtol=1e-9)

    sm, sc = rts_backward_pass(params, fm, fc)
    means, covs = kf.posterior_state_space_model().marginals()
    np.testing.assert_allclose(means, sm, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(covs, sc, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("d,out", GRID, ids=[f"d{d}-out{o}" for d, o in GRID])
def test_kalman_sites_matches_numpy_oracle(rng, d, out):
    """Per-step site covariances/means ≡ a time-varying-R oracle filter
    (numpy_kalman_filter.py:386-422)."""
    params, ssm, h, _, _ = _setup(rng, d, out)
    r_t = random_spd(rng, (N + 1,), out) / out
    y_t = rng.normal(size=(N + 1, out))
    r_inv = np.linalg.inv(r_t)
    sites = GaussianSites(
        nat1=jnp.asarray(np.einsum("nij,nj->ni", r_inv, y_t)),
        nat2=jnp.asarray(-0.5 * r_inv),
    )
    kf = KalmanFilterWithSites(
        state_space_model=ssm, emission_model=EmissionModel(jnp.asarray(h)), sites=sites
    )
    log_liks, fm, fc, _, _ = kf_forward_filter(params, h, r_t, y_t)
    np.testing.assert_allclose(kf.log_likelihood(), log_liks.sum(), rtol=1e-9)

    sm, sc = rts_backward_pass(params, fm, fc)
    means, covs = kf.posterior_state_space_model().marginals()
    np.testing.assert_allclose(means, sm, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(covs, sc, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("d,out", GRID, ids=[f"d{d}-out{o}" for d, o in GRID])
def test_sparse_sites_log_lik_matches_specialized_form(rng, d, out):
    """The sparse-sites log-likelihood (kalman_filter.py:591-639) ≡ the
    information-form oracle with Λ = 0 at unobserved grid points, shifted by
    the per-observation Gaussian normalization constants."""
    params, ssm, h, r, _ = _setup(rng, d, out)
    obs_idx = np.asarray([1, 3, 4, 8, 10])
    y_obs = rng.normal(size=(len(obs_idx), out))
    r_inv = np.linalg.inv(r)
    sites = GaussianSites(
        nat1=jnp.asarray(y_obs @ r_inv.T),
        nat2=jnp.broadcast_to(jnp.asarray(-0.5 * r_inv), (len(obs_idx), out, out)),
    )
    kf = KalmanFilterWithSparseSites(
        state_space_model=ssm,
        emission_model=EmissionModel(jnp.asarray(h)),
        sites=sites,
        obs_indices=jnp.asarray(obs_idx),
    )

    # oracle: back-project to state space, zero naturals off the support
    nat1 = np.zeros((N + 1, d))
    nat2 = np.zeros((N + 1, d, d))
    for i, k in enumerate(obs_idx):
        nat1[k] = h[k].T @ r_inv @ y_obs[i]
        nat2[k] = h[k].T @ r_inv @ h[k]
    fm, fc, sm, sc, _, log_z = kalman_filter_rts(params, nat1, nat2)
    consts = sum(
        -0.5 * (y_obs[i] @ r_inv @ y_obs[i])
        - 0.5 * np.linalg.slogdet(2 * np.pi * r)[1]
        for i in range(len(obs_idx))
    )
    np.testing.assert_allclose(kf.log_likelihood(), log_z + consts, rtol=1e-9)

    means, covs = kf.posterior_state_space_model().marginals()
    np.testing.assert_allclose(means, sm, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(covs, sc, rtol=1e-7, atol=1e-9)

    # cross-check against the observation-space sparse filter oracle
    # (numpy_kalman_filter.py:384-466): identical total log p(y)
    h_obs = np.take(h, obs_idx, axis=0)
    log_liks, _, _ = kf_sparse_forward_filter(params, h_obs, r, y_obs, obs_idx)
    np.testing.assert_allclose(kf.log_likelihood(), log_liks.sum(), rtol=1e-9)


# ---------------------------------------------------------------------------
# channelized engine at d = 4..8 vs the NumPy oracle (independent anchor —
# the structure-of-scalars pskf paths were previously only equivalence-
# tested against the generic [T,d,d] path at these dims)
# ---------------------------------------------------------------------------

D_CH = (4, 6, 8)


@pytest.fixture
def force_channelized(monkeypatch):
    import vi_diffusion_processes_tpu.parallel.pskf as pskf

    monkeypatch.setattr(pskf, "CH_THRESHOLD", 4)


@pytest.mark.parametrize("d", D_CH, ids=[f"d{d}" for d in D_CH])
def test_channelized_filter_matches_numpy_oracle(rng, force_channelized, d):
    """Channelized (packed [d,d,nb] array-algebra) filter + smoother +
    log-normalizer vs the dense sequential oracle at d = 4..8."""
    out = 2
    params, ssm, h, r, y = _setup(rng, d, out)
    kf = KalmanFilter(
        state_space_model=ssm,
        emission_model=EmissionModel(jnp.asarray(h)),
        observations=jnp.asarray(y),
        chol_obs_covariance=jnp.asarray(np.linalg.cholesky(r)),
    )
    log_liks, fm, fc, _, _ = kf_forward_filter(params, h, r, y)
    np.testing.assert_allclose(kf.log_likelihood(), log_liks.sum(), rtol=1e-8)

    sm, sc = rts_backward_pass(params, fm, fc)
    means, covs = kf.posterior_state_space_model().marginals()
    np.testing.assert_allclose(means, sm, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(covs, sc, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("d", D_CH, ids=[f"d{d}" for d in D_CH])
def test_channelized_sparse_sites_matches_numpy_oracle(rng, force_channelized, d):
    """Sparse-sites log p(y) and posterior at d = 4..8 on the channelized
    engine vs the sparse observation-space oracle."""
    out = 1
    params, ssm, h, r, _ = _setup(rng, d, out)
    obs_idx = np.asarray([0, 2, 5, 9])
    y_obs = rng.normal(size=(len(obs_idx), out))
    r_inv = np.linalg.inv(r)
    sites = GaussianSites(
        nat1=jnp.asarray(y_obs @ r_inv.T),
        nat2=jnp.broadcast_to(jnp.asarray(-0.5 * r_inv), (len(obs_idx), out, out)),
    )
    kf = KalmanFilterWithSparseSites(
        state_space_model=ssm,
        emission_model=EmissionModel(jnp.asarray(h)),
        sites=sites,
        obs_indices=jnp.asarray(obs_idx),
    )
    h_obs = np.take(h, obs_idx, axis=0)
    log_liks, fm, fc = kf_sparse_forward_filter(params, h_obs, r, y_obs, obs_idx)
    np.testing.assert_allclose(kf.log_likelihood(), log_liks.sum(), rtol=1e-8)

    sm, sc = rts_backward_pass(params, fm, fc)
    means, covs = kf.posterior_state_space_model().marginals()
    np.testing.assert_allclose(means, sm, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(covs, sc, rtol=1e-6, atol=1e-8)
