"""Non-conjugate likelihoods: Poisson and Bernoulli.

The reference relies on gpflow's likelihood zoo for these (accepted anywhere
a ``Likelihood`` is, posterior.py:33); CVI on 100k-step series with
Poisson/Bernoulli observations is benchmark config #4 (BASELINE.md).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct
from jax.scipy.special import gammaln

from .base import Likelihood

__all__ = ["Poisson", "Bernoulli"]


@struct.dataclass
class Poisson(Likelihood):
    """``p(y|f) = Poisson(y; exp(f)·binsize)`` with log link."""

    binsize: float = struct.field(pytree_node=False, default=1.0)

    def _elementwise_log_prob(self, f, y):
        rate_log = f + jnp.log(jnp.asarray(self.binsize, f.dtype))
        return y * rate_log - jnp.exp(rate_log) - gammaln(y + 1.0)

    def log_probability_density(self, f, y):
        return jnp.sum(self._elementwise_log_prob(f, y), axis=-1)

    def variational_expectations(self, f_means, f_vars, y):
        """Closed form under the exp link:
        ``y(μ+log b) − b·e^{μ+S/2} − log y!``."""
        log_b = jnp.log(jnp.asarray(self.binsize, f_means.dtype))
        per_dim = (
            y * (f_means + log_b)
            - jnp.exp(f_means + 0.5 * f_vars + log_b)
            - gammaln(y + 1.0)
        )
        return jnp.sum(per_dim, axis=-1)

    def conditional_mean(self, f):
        return jnp.exp(f) * self.binsize

    def conditional_variance(self, f):
        return jnp.exp(f) * self.binsize


@struct.dataclass
class Bernoulli(Likelihood):
    """``p(y=1|f) = sigmoid(f)``, y ∈ {0, 1}; VE via quadrature."""

    def _elementwise_log_prob(self, f, y):
        # numerically stable log sigmoid
        return y * f - jnp.logaddexp(0.0, f)

    def log_probability_density(self, f, y):
        return jnp.sum(self._elementwise_log_prob(f, y), axis=-1)

    def conditional_mean(self, f):
        return jnp.reciprocal(1.0 + jnp.exp(-f))

    def conditional_variance(self, f):
        p = self.conditional_mean(f)
        return p * (1.0 - p)
