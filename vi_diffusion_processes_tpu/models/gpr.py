"""Exact Gaussian process regression via the parallel Kalman path.

Equivalent of markovflow/models/gaussian_process_regression.py:30 — exact
conjugate inference: ``loss = −log p(y)``; the posterior over states comes
from the parallel filter/smoother instead of banded UDU' factorizations
(kalman_filter.py:109-182).  The whole loss is one jitted XLA program.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..parallel.sites import gaussian_observation_sites  # noqa: F401
from ..parallel.pskf import (
    filter_smoother_with_sites,
    parallel_filter,
    posterior_ssm_from_smoothed,
    site_log_normalizer,
)
from ..ssm.mean_functions import MeanFunction
from .posterior import AnalyticPosteriorProcess

__all__ = ["GaussianProcessRegression", "gaussian_observation_sites"]

_LOG2PI = float(jnp.log(2.0 * jnp.pi))


@struct.dataclass
class GaussianProcessRegression:
    """Exact GPR on a time grid (gaussian_process_regression.py:30-160).

    Fields are pytree leaves → directly trainable with optax/jax.grad.
    ``time_points: [..., N]``, ``observations: [..., N, m]``,
    ``chol_obs_covariance: [m, m]``.
    """

    kernel: object
    time_points: jnp.ndarray
    observations: jnp.ndarray
    chol_obs_covariance: jnp.ndarray
    mean_function: Optional[MeanFunction] = None

    def _sites(self):
        emission = self.kernel.generate_emission_model(self.time_points)
        y = self.observations
        if self.mean_function is not None:
            y = y - self.mean_function(self.time_points)
        return emission, gaussian_observation_sites(
            emission.emission_matrix, self.chol_obs_covariance, y
        )

    def log_likelihood(self) -> jnp.ndarray:
        """``log p(y)`` — parallel filter + site normalizer."""
        ssm = self.kernel.state_space_model(self.time_points)
        _, (nat1, nat2, constants) = self._sites()
        filt = parallel_filter(ssm, nat1, nat2)
        return site_log_normalizer(filt, nat1, nat2) + jnp.sum(constants, axis=-1)

    def loss(self) -> jnp.ndarray:
        return -self.log_likelihood()

    def posterior_state_space_model(self):
        from ..config import default_jitter

        ssm = self.kernel.state_space_model(self.time_points)
        _, (nat1, nat2, _) = self._sites()
        _, smooth = filter_smoother_with_sites(ssm, nat1, nat2)
        # jitter: deterministic kernel components (Q = 0) need a PSD floor
        # for sampling; the GPR posterior is only used to predict/sample, so
        # the KL-sensitivity argument in pskf.py does not apply here.
        return posterior_ssm_from_smoothed(ssm, smooth, jitter=default_jitter())

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        from ..likelihoods.gaussian import MultivariateGaussian

        return AnalyticPosteriorProcess(
            dist=self.posterior_state_space_model(),
            kernel=self.kernel,
            conditioning_time_points=self.time_points,
            mean_function=self.mean_function,
            likelihood=MultivariateGaussian(chol_covariance=self.chol_obs_covariance),
        )
