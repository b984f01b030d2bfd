"""Posterior processes: predict states / f / y at arbitrary time points.

Equivalent of markovflow/posterior.py (PosteriorProcess :37,
ConditionalProcess :166, AnalyticPosteriorProcess :414).  A posterior
process bundles a Gauss–Markov distribution over states at conditioning
points with the kernel; prediction at new points goes through pairwise
marginals + the Markov two-sided conditional (all batched gathers + small
matmuls — O(M) work for M new points).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ssm.conditionals import conditional_predict, pairwise_marginals
from ..ssm.mean_functions import MeanFunction
from ..ssm.state_space_model import StateSpaceModel

__all__ = ["ConditionalProcess", "AnalyticPosteriorProcess"]


@struct.dataclass
class ConditionalProcess:
    """Posterior over the process conditioned on states at
    ``conditioning_time_points`` (posterior.py:166)."""

    dist: StateSpaceModel
    kernel: object
    conditioning_time_points: jnp.ndarray
    mean_function: Optional[MeanFunction] = None

    def predict_state(self, new_time_points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Marginal state means/covs at new points (posterior.py:207-229)."""
        batch_shape = self.conditioning_time_points.shape[:-1]
        pw_means, pw_covs = pairwise_marginals(
            self.dist,
            self.kernel.initial_mean(batch_shape).astype(new_time_points.dtype),
            self.kernel.initial_covariance(self.conditioning_time_points[..., :1]),
        )
        return conditional_predict(
            new_time_points, self.conditioning_time_points, self.kernel, pw_means, pw_covs
        )

    def predict_f(
        self, new_time_points: jnp.ndarray, full_output_cov: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Marginal f means/covs at new points (posterior.py:231-258)."""
        means, covs = self.predict_state(new_time_points)
        emission = self.kernel.generate_emission_model(new_time_points)
        f_means, f_covs = emission.project_state_marginals_to_f(means, covs, full_output_cov)
        if self.mean_function is not None:
            f_means = f_means + self.mean_function(new_time_points)
        return f_means, f_covs

    def sample_state_trajectories(
        self, new_time_points: jnp.ndarray, key: jax.Array, sample_shape: Tuple[int, ...] = ()
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Joint posterior samples via Matheron delta correction
        (posterior.py:260-377):

        1. sample conditioning states ``u* ~ q(u)`` (parallel joint scan),
        2. sample a *prior* trajectory over the union grid → ``(s̃, ũ)``,
        3. correct: ``s* = s̃ + P·(u*_pair − ũ_pair)`` where P are the Markov
           two-sided conditional projections — exact because
           ``E[s|u]`` depends only on the neighbouring pair.

        Returns ``(samples_s [*S, M, d], samples_u [*S, N+1, d])``.
        Unbatched conditioning grids only (like the reference).
        """
        from ..ssm.conditionals import conditional_statistics

        k1, k2 = jax.random.split(key)
        u_post = self.dist.sample(k1, sample_shape)  # [*S, N+1, d]

        cond_tp = self.conditioning_time_points
        m_new = new_time_points.shape[-1]
        union = jnp.concatenate([cond_tp, new_time_points])
        order = jnp.argsort(union)
        inv_order = jnp.argsort(order)
        prior_union = self.kernel.state_space_model(union[order])
        prior_samples_sorted = prior_union.sample(k2, sample_shape)
        prior_samples = jnp.take(prior_samples_sorted, inv_order, axis=-2)
        u_prior = prior_samples[..., : cond_tp.shape[-1], :]
        s_prior = prior_samples[..., cond_tp.shape[-1] :, :]

        p, _, indices = conditional_statistics(new_time_points, cond_tp, self.kernel)

        def pairs_of(u):
            zeros = jnp.zeros_like(u[..., :1, :])
            ext = jnp.concatenate([zeros, u, zeros], axis=-2)
            pr = jnp.concatenate([ext[..., :-1, :], ext[..., 1:, :]], axis=-1)
            return jnp.take(pr, indices, axis=-2)

        delta = pairs_of(u_post) - pairs_of(u_prior)
        s_post = s_prior + jnp.einsum("...ij,...j->...i", p, delta)
        return s_post, u_post

    def sample_state(
        self, new_time_points: jnp.ndarray, key: jax.Array, sample_shape: Tuple[int, ...] = ()
    ) -> jnp.ndarray:
        return self.sample_state_trajectories(new_time_points, key, sample_shape)[0]

    def sample_f(self, new_time_points, key, sample_shape=()):
        states = self.sample_state(new_time_points, key, sample_shape)
        emission = self.kernel.generate_emission_model(new_time_points)
        f = emission.project_state_to_f(states)
        if self.mean_function is not None:
            f = f + self.mean_function(new_time_points)
        return f


@struct.dataclass
class AnalyticPosteriorProcess(ConditionalProcess):
    """Posterior with an attached likelihood → also predicts observations
    (posterior.py:414-469)."""

    likelihood: object = None

    def predict_y(self, new_time_points: jnp.ndarray):
        f_means, f_covs = self.predict_f(new_time_points)
        return self.likelihood.predict_mean_and_var(f_means, f_covs)
