"""Importance-weighted variational inference over inducing states.

Equivalent of markovflow/models/iwvi.py:29 (``ImportanceWeightedVI``) and
the ``ImportanceWeightedPosteriorProcess`` (posterior.py:471-787): a
K-sample IW-ELBO with the DREGS low-variance gradient estimator, built on
the Matheron joint trajectory sampler of :class:`~.posterior.ConditionalProcess`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax
from jax.scipy.special import logsumexp

from ..ssm.mean_functions import MeanFunction
from ..ssm.state_space_model import StateSpaceModel
from .posterior import ConditionalProcess

__all__ = ["ImportanceWeightedVI"]


@struct.dataclass
class ImportanceWeightedVI:
    """IWVI state (iwvi.py:29-107): proposal q(u) on inducing points, with
    ``q(s|u) = p(s|u)`` so weights reduce to ``p(y|s)p(u)/q(u)``."""

    kernel: object
    likelihood: object
    inducing_points: jnp.ndarray
    dist_q: StateSpaceModel
    mean_function: Optional[MeanFunction] = None
    num_importance_samples: int = struct.field(pytree_node=False, default=10)

    @classmethod
    def initialize(
        cls, kernel, likelihood, inducing_points, num_importance_samples=10, mean_function=None
    ) -> "ImportanceWeightedVI":
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            inducing_points=inducing_points,
            dist_q=kernel.state_space_model(inducing_points),
            mean_function=mean_function,
            num_importance_samples=num_importance_samples,
        )

    @property
    def proposal_process(self) -> ConditionalProcess:
        return ConditionalProcess(
            dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.inducing_points,
            mean_function=self.mean_function,
        )

    def log_importance_weights(
        self,
        samples_s: jnp.ndarray,
        samples_u: jnp.ndarray,
        input_data: Tuple[jnp.ndarray, jnp.ndarray],
        stop_gradient_qu: bool = False,
    ) -> jnp.ndarray:
        """``log w = log p(y|s) + log p(u) − log q(u)``
        (posterior.py:522-581)."""
        x, y = input_data
        dist_p = self.kernel.state_space_model(self.inducing_points)
        log_pu = dist_p.log_pdf(samples_u)
        dist_q = self.dist_q
        if stop_gradient_qu:
            dist_q = lax.stop_gradient(dist_q)
        log_qu = dist_q.log_pdf(samples_u)

        emission = self.kernel.generate_emission_model(x)
        samples_f = emission.project_state_to_f(samples_s)
        if self.mean_function is not None:
            samples_f = samples_f + self.mean_function(x)
        log_lik = jnp.sum(self.likelihood.log_probability_density(samples_f, y), axis=-1)
        return log_lik + log_pu - log_qu

    def _sample_and_weigh(self, input_data, key, stop_gradient_qu=False):
        x, _ = input_data
        samples_s, samples_u = self.proposal_process.sample_state_trajectories(
            x, key, (self.num_importance_samples,)
        )
        return self.log_importance_weights(samples_s, samples_u, input_data, stop_gradient_qu)

    def elbo(self, input_data, key: jax.Array) -> jnp.ndarray:
        """``log (1/K) Σₖ wₖ`` in log-space (iwvi.py:109-141)."""
        log_weights = self._sample_and_weigh(input_data, key)
        k = jnp.asarray(self.num_importance_samples, log_weights.dtype)
        return logsumexp(log_weights) - jnp.log(k)

    def dregs_objective(self, input_data, key: jax.Array) -> jnp.ndarray:
        """DREGS variance-controlled surrogate (iwvi.py:143-173):
        ``Σₖ sg(w̄ₖ)² · log wₖ`` with q(u)-params stop-gradiented inside w."""
        log_weights = self._sample_and_weigh(input_data, key, stop_gradient_qu=True)
        normalized = lax.stop_gradient(jax.nn.softmax(log_weights))
        return jnp.sum(normalized**2 * log_weights)

    def predict_f_samples(self, new_time_points, input_data, key, num_samples=None):
        """Self-normalized IW posterior samples at new points
        (posterior.py:623-706): sample (s_new, s_data, u) jointly, weight by
        the data, resample by the normalized weights."""
        k1, k2 = jax.random.split(key)
        n = num_samples or self.num_importance_samples
        x, _ = input_data
        all_tp = jnp.concatenate([x, new_time_points])
        samples_s, samples_u = self.proposal_process.sample_state_trajectories(
            all_tp, k1, (n,)
        )
        m_new = new_time_points.shape[-1]
        s_new = samples_s[..., -m_new:, :]
        s_data = samples_s[..., :-m_new, :]
        log_w = self.log_importance_weights(s_data, samples_u, input_data)
        idx = jax.random.categorical(k2, log_w, shape=(n,))
        resampled = jnp.take(s_new, idx, axis=0)
        emission = self.kernel.generate_emission_model(new_time_points)
        f = emission.project_state_to_f(resampled)
        if self.mean_function is not None:
            f = f + self.mean_function(new_time_points)
        return f

    def expected_value(self, new_time_points, input_data, key, func=lambda x: x):
        """Self-normalized importance estimate of ``E_post[func(f)]``
        (posterior.py:708-787)."""
        k1, _ = jax.random.split(key)
        x, _ = input_data
        all_tp = jnp.concatenate([x, new_time_points])
        samples_s, samples_u = self.proposal_process.sample_state_trajectories(
            all_tp, k1, (self.num_importance_samples,)
        )
        m_new = new_time_points.shape[-1]
        s_new = samples_s[..., -m_new:, :]
        s_data = samples_s[..., :-m_new, :]
        log_w = self.log_importance_weights(s_data, samples_u, input_data)
        w = jax.nn.softmax(log_w)
        emission = self.kernel.generate_emission_model(new_time_points)
        f = emission.project_state_to_f(s_new)
        if self.mean_function is not None:
            f = f + self.mean_function(new_time_points)
        vals = func(f)
        return jnp.tensordot(w, vals, axes=(0, 0))
