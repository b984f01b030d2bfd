"""Sparse CVI: Gaussian sites on consecutive pairs of inducing states.

Equivalent of markovflow/models/sparse_variational_cvi.py:38
(``SparseCVIGaussianProcess``): each datum contributes a natural-gradient
site on the pair ``v_m = [u_m, u_{m+1}]`` of inducing states bracketing it,
projected through the Markov conditional ``E[f|v] = (HP) v`` and
segment-summed per interval.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ssm.conditionals import conditional_statistics
from ..ssm.mean_functions import MeanFunction
from ..ssm.state_space_model import StateSpaceModel
from ..ssm.transforms import naturals_to_ssm
from .posterior import AnalyticPosteriorProcess

__all__ = ["SparseCVIGaussianProcess"]


@struct.dataclass
class SparseCVIGaussianProcess:
    """Sparse CVI state: pair-site naturals ``nat1 [M+1, 2d]``,
    ``nat2 [M+1, 2d, 2d]`` (site m covers data in the m-th interval of the
    inducing grid, prior-extended at both ends)."""

    kernel: object
    likelihood: object
    inducing_points: jnp.ndarray
    nat1: jnp.ndarray
    nat2: jnp.ndarray
    mean_function: Optional[MeanFunction] = None
    learning_rate: float = struct.field(pytree_node=False, default=0.1)

    @classmethod
    def initialize(
        cls, kernel, likelihood, inducing_points, mean_function=None, learning_rate=0.1
    ) -> "SparseCVIGaussianProcess":
        m = inducing_points.shape[0]
        d = kernel.state_dim
        dtype = inducing_points.dtype
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            inducing_points=inducing_points,
            nat1=jnp.zeros((m + 1, 2 * d), dtype),
            nat2=jnp.zeros((m + 1, 2 * d, 2 * d), dtype),
            mean_function=mean_function,
            learning_rate=learning_rate,
        )

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_points)

    @property
    def dist_q(self) -> StateSpaceModel:
        """Posterior SSM on the inducing states: prior naturals + summed
        overlapping pair-site blocks (sparse_variational_cvi.py:140-174)."""
        d = self.kernel.state_dim
        prec = self.dist_p.precision()
        # state m collects site m+1's u₋ half and site m's u₊ half
        nat1_diag = self.nat1[1:, :d] + self.nat1[:-1, d:]
        nat2_diag = self.nat2[1:, :d, :d] + self.nat2[:-1, d:, d:]
        nat2_sub = self.nat2[1:-1, d:, :d]
        theta_diag = -0.5 * prec.diag + nat2_diag
        theta_sub = -prec.sub + 2.0 * nat2_sub
        return naturals_to_ssm(nat1_diag, theta_diag, theta_sub)

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.inducing_points,
            mean_function=self.mean_function,
            likelihood=self.likelihood,
        )

    def local_objective_and_gradients(self, f_mu, f_var, y):
        """VE + grads wrt ``η = [μ, σ²+μ²]``
        (sparse_variational_cvi.py:223-246)."""
        def ve_of_eta(eta1, eta2):
            return jnp.sum(
                self.likelihood.variational_expectations(eta1, eta2 - eta1**2, y)
            )

        eta1, eta2 = f_mu, f_var + f_mu**2
        return jax.value_and_grad(ve_of_eta, argnums=(0, 1))(eta1, eta2)

    def update_sites(self, input_data: Tuple[jnp.ndarray, jnp.ndarray]) -> "SparseCVIGaussianProcess":
        """One joint site update (sparse_variational_cvi.py:176-221):
        per-datum η-gradients of the VE back-projected through ``HP`` onto
        the bracketing pair, segment-summed per interval."""
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        if self.mean_function is not None:
            y = y - self.mean_function(x)
        _, (g1, g2) = self.local_objective_and_gradients(f_mu, f_var, y)

        h = self.kernel.generate_emission_model(x).emission_matrix  # [n, 1, d]
        p, _, indices = conditional_statistics(x, self.inducing_points, self.kernel)
        hp = h @ p  # [n, 1, 2d]

        # back-project scalar-f site naturals onto the pair: θ₁ = (HP)ᵀ g1,
        # θ₂ = (HP)ᵀ g2 (HP)
        theta1 = jnp.einsum("nij,ni->nj", hp, g1)  # [n, 2d]
        theta2 = jnp.einsum("ni,nij,nik->njk", g2, hp, hp)  # [n, 2d, 2d]

        m = self.inducing_points.shape[0]
        summed1 = jax.ops.segment_sum(theta1, indices, num_segments=m + 1)
        summed2 = jax.ops.segment_sum(theta2, indices, num_segments=m + 1)

        lr = self.learning_rate
        return self.replace(
            nat1=(1.0 - lr) * self.nat1 + lr * summed1,
            nat2=(1.0 - lr) * self.nat2 + lr * summed2,
        )

    def classic_elbo(self, input_data) -> jnp.ndarray:
        """``Σ VE − KL[q(u)‖p(u)]`` (sparse_variational_cvi.py:262-290)."""
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        if self.mean_function is not None:
            y = y - self.mean_function(x)
        ve = jnp.sum(self.likelihood.variational_expectations(f_mu, f_var, y))
        return ve - jnp.sum(self.dist_q.kl_divergence(self.dist_p))

    def elbo(self, input_data) -> jnp.ndarray:
        return self.classic_elbo(input_data)

    def loss(self, input_data) -> jnp.ndarray:
        return -self.classic_elbo(input_data)

    def predict_log_density(self, input_data) -> jnp.ndarray:
        x, y = input_data
        f_mu, f_var = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)
