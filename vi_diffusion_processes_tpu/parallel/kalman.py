"""Kalman-filter API parity layer.

The reference exposes three filter classes (markovflow/kalman_filter.py):
``KalmanFilter`` :275 (constant Gaussian observation covariance),
``KalmanFilterWithSites`` :440 (time-varying natural-parameter sites) and
``KalmanFilterWithSparseSites`` :504 (sites on an observed subset of a dense
grid).  All three are thin views over the same parallel-scan engine
(:mod:`.pskf`) — "Kalman filter" here means the posterior of the
site-augmented Gauss–Markov model, exactly like the reference's banded
information-form smoother.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .sites import (
    GaussianSites,
    back_project_nats,
    gaussian_observation_sites,
    sites_log_likelihood,
)

from ..ssm.emission import EmissionModel
from ..ssm.state_space_model import StateSpaceModel
from ..utils.linalg import chol_psd, solve_small
from .pskf import (
    filter_smoother_with_sites,
    parallel_filter,
    posterior_ssm_from_smoothed,
    site_log_normalizer,
)

__all__ = ["KalmanFilter", "KalmanFilterWithSites", "KalmanFilterWithSparseSites"]


@struct.dataclass
class KalmanFilter:
    """Exact filtering/smoothing with constant Gaussian observation noise
    (kalman_filter.py:275-353)."""

    state_space_model: StateSpaceModel
    emission_model: EmissionModel
    observations: jnp.ndarray
    chol_obs_covariance: jnp.ndarray

    def _sites(self):
        return gaussian_observation_sites(
            self.emission_model.emission_matrix, self.chol_obs_covariance, self.observations
        )

    def log_likelihood(self) -> jnp.ndarray:
        """``log p(y)`` (kalman_filter.py:184-255)."""
        nat1, nat2, constants = self._sites()
        filt = parallel_filter(self.state_space_model, nat1, nat2)
        return site_log_normalizer(filt, nat1, nat2) + jnp.sum(constants, axis=-1)

    def posterior_state_space_model(self) -> StateSpaceModel:
        """(kalman_filter.py:109-182)."""
        nat1, nat2, _ = self._sites()
        _, smooth = filter_smoother_with_sites(self.state_space_model, nat1, nat2)
        return posterior_ssm_from_smoothed(self.state_space_model, smooth)


@struct.dataclass
class KalmanFilterWithSites:
    """Filtering against time-varying Gaussian sites in f-space
    (kalman_filter.py:440-500)."""

    state_space_model: StateSpaceModel
    emission_model: EmissionModel
    sites: GaussianSites

    def _state_sites(self):
        return back_project_nats(self.sites, self.emission_model.emission_matrix)

    def log_likelihood(self) -> jnp.ndarray:
        return sites_log_likelihood(self.state_space_model, self.sites, self.emission_model)

    def posterior_state_space_model(self) -> StateSpaceModel:
        nat1, prec = self._state_sites()
        _, smooth = filter_smoother_with_sites(self.state_space_model, nat1, prec)
        return posterior_ssm_from_smoothed(self.state_space_model, smooth)


@struct.dataclass
class KalmanFilterWithSparseSites:
    """Sites on an observed subset of a dense grid
    (kalman_filter.py:504-639): the canonical 100k-grid / few-observations
    configuration.  Unobserved grid points carry exactly-zero site
    precision — the parallel scan handles them natively, no scatter/gather
    band surgery needed (vs. sparse_to_dense :573 / dense_to_sparse :579).
    """

    state_space_model: StateSpaceModel
    emission_model: EmissionModel
    sites: GaussianSites  # at the observed points only
    obs_indices: jnp.ndarray  # [n_obs] grid indices

    def _dense_sites(self):
        t = self.state_space_model.num_transitions + 1
        h = jnp.take(self.emission_model.emission_matrix, self.obs_indices, axis=-3)
        nat1_f, prec_f = back_project_nats(self.sites, h)
        d = self.state_space_model.state_dim
        nat1 = jnp.zeros((t, d), nat1_f.dtype).at[self.obs_indices].add(nat1_f)
        nat2 = jnp.zeros((t, d, d), prec_f.dtype).at[self.obs_indices].add(prec_f)
        return nat1, nat2

    def log_likelihood(self) -> jnp.ndarray:
        """Specialized sparse log-likelihood (kalman_filter.py:591-639)."""
        nat1, nat2 = self._dense_sites()
        filt = parallel_filter(self.state_space_model, nat1, nat2)
        log_z = site_log_normalizer(filt, nat1, nat2)
        m = self.sites.nat2.shape[-1]
        site_prec_f = -2.0 * self.sites.nat2
        chol = chol_psd(site_prec_f)
        alpha = solve_small(site_prec_f, self.sites.nat1[..., None])[..., 0]
        quad = jnp.einsum("...i,...i->...", self.sites.nat1, alpha)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(chol, axis1=-2, axis2=-1))), axis=-1
        )
        constants = -0.5 * quad + 0.5 * logdet - 0.5 * m * jnp.log(2.0 * jnp.pi)
        return log_z + jnp.sum(constants, axis=-1)

    def posterior_state_space_model(self) -> StateSpaceModel:
        nat1, nat2 = self._dense_sites()
        _, smooth = filter_smoother_with_sites(self.state_space_model, nat1, nat2)
        return posterior_ssm_from_smoothed(self.state_space_model, smooth)
