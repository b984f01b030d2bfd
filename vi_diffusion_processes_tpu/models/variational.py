"""Variational GP with a free-form Gauss–Markov posterior.

Equivalent of markovflow/models/variational.py:29 — the variational
distribution ``dist_q`` is a trainable StateSpaceModel initialized at the
prior; the ELBO is ``Σ VE − KL(q‖p)``, both closed-form/parallel here.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..ssm.mean_functions import MeanFunction
from ..ssm.state_space_model import StateSpaceModel
from .posterior import AnalyticPosteriorProcess

__all__ = ["VariationalGaussianProcess"]


@struct.dataclass
class VariationalGaussianProcess:
    """VGP over a time grid (variational.py:29-222).

    ``dist_q`` is the trainable variational SSM (initialize with
    :meth:`initialize`); everything else is hyperparameters/data.
    """

    kernel: object
    likelihood: object
    time_points: jnp.ndarray
    observations: jnp.ndarray
    dist_q: StateSpaceModel
    mean_function: Optional[MeanFunction] = None

    @classmethod
    def initialize(
        cls, kernel, likelihood, time_points, observations, mean_function=None
    ) -> "VariationalGaussianProcess":
        """Start q at the prior (variational.py:112-119)."""
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            time_points=time_points,
            observations=observations,
            dist_q=kernel.state_space_model(time_points),
            mean_function=mean_function,
        )

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.time_points)

    def variational_expectations(self, dist_q: Optional[StateSpaceModel] = None) -> jnp.ndarray:
        dist_q = self.dist_q if dist_q is None else dist_q
        means, covs = dist_q.marginals()
        emission = self.kernel.generate_emission_model(self.time_points)
        f_means, f_vars = emission.project_state_marginals_to_f(means, covs)
        y = self.observations
        if self.mean_function is not None:
            y = y - self.mean_function(self.time_points)
        return jnp.sum(self.likelihood.variational_expectations(f_means, f_vars, y), axis=-1)

    def elbo(self, dist_q: Optional[StateSpaceModel] = None) -> jnp.ndarray:
        """``ELBO = Σ VE − KL(q‖p)`` (variational.py:129-152)."""
        dist_q = self.dist_q if dist_q is None else dist_q
        return self.variational_expectations(dist_q) - dist_q.kl_divergence(self.dist_p)

    def loss(self, dist_q: Optional[StateSpaceModel] = None) -> jnp.ndarray:
        return -self.elbo(dist_q)

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.time_points,
            mean_function=self.mean_function,
            likelihood=self.likelihood,
        )
