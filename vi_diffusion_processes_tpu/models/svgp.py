"""Sparse variational GP with inducing time points ("Doubly Sparse VGP").

Equivalent of markovflow/models/sparse_variational.py:31 (Adam et al. 2020):
the variational Gauss–Markov distribution lives on M inducing points; data
terms use the O(1)-per-point Markov conditional prediction; minibatching
rescales the VE term (sparse_variational.py:149-192).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from ..ssm.mean_functions import MeanFunction
from ..ssm.state_space_model import StateSpaceModel
from .posterior import AnalyticPosteriorProcess

__all__ = ["SparseVariationalGaussianProcess"]


@struct.dataclass
class SparseVariationalGaussianProcess:
    """SVGP state: kernel/likelihood hyperparams + inducing points +
    trainable variational SSM ``dist_q`` on the inducing grid.

    The inducing points must stay sorted; the reference enforces this with
    an ``ordered()`` bijector (sparse_variational.py:129) — here they are
    fixed by default (trainable via a sorted reparameterization upstream).
    """

    kernel: object
    likelihood: object
    inducing_points: jnp.ndarray
    dist_q: StateSpaceModel
    mean_function: Optional[MeanFunction] = None
    num_data: Optional[int] = struct.field(pytree_node=False, default=None)

    @classmethod
    def initialize(
        cls, kernel, likelihood, inducing_points, mean_function=None, num_data=None
    ) -> "SparseVariationalGaussianProcess":
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            inducing_points=inducing_points,
            dist_q=kernel.state_space_model(inducing_points),
            mean_function=mean_function,
            num_data=num_data,
        )

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_points)

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.inducing_points,
            mean_function=self.mean_function,
            likelihood=self.likelihood,
        )

    def elbo(self, input_data: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
        """``Σᵢ VE(q(f(xᵢ)), yᵢ)·scale − KL[q(s(z))‖p(s(z))]``
        (sparse_variational.py:149-192)."""
        x, y = input_data
        f_means, f_vars = self.posterior.predict_f(x)
        ve = jnp.sum(self.likelihood.variational_expectations(f_means, f_vars, y))
        kl = jnp.sum(self.dist_q.kl_divergence(self.dist_p))
        if self.num_data is not None:
            scale = self.num_data / x.shape[-1]
        else:
            scale = 1.0
        return ve * scale - kl

    def loss(self, input_data) -> jnp.ndarray:
        return -self.elbo(input_data)

    def predict_log_density(self, input_data) -> jnp.ndarray:
        x, y = input_data
        f_means, f_vars = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_means, f_vars, y)
