"""Multi-stage likelihood for intermittent demand forecasting.

Equivalent of markovflow/likelihoods/mutlistage_likelihood.py:25
(Seeger et al. 2016): three latent functions drive a Bernoulli /
Bernoulli / shifted-Poisson decision tree:

    ``log p(y|F) = δ(y=0)·log σ(F₀)
                 + δ(y=1)·(log(1−σ(F₀)) + log σ(F₁))
                 + δ(y≥2)·(log(1−σ(F₀)) + log(1−σ(F₁)) + log Pois(y−2|e^{F₂}))``

Bernoulli parts use the logistic link; VE of the Bernoulli factors via 1-D
quadrature, Poisson factor closed form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import gammaln

from .base import Likelihood, quad_expectation

__all__ = ["MultiStageLikelihood"]


def _log_sigmoid(f):
    return -jnp.logaddexp(0.0, -f)


@struct.dataclass
class MultiStageLikelihood(Likelihood):
    """Scalar observations, ``latent_dim = 3``."""

    @property
    def latent_dim(self) -> int:
        return 3

    def log_probability_density(self, f, y):
        """``f: [..., 3]``, ``y: [..., 1]`` → ``[...]``."""
        f0, f1, f2 = f[..., 0], f[..., 1], f[..., 2]
        yy = y[..., 0]
        lp0 = _log_sigmoid(f0)
        lpn0 = _log_sigmoid(-f0)
        lp1 = _log_sigmoid(f1)
        lpn1 = _log_sigmoid(-f1)
        y2 = jnp.maximum(yy - 2.0, 0.0)
        lp2 = y2 * f2 - jnp.exp(f2) - gammaln(y2 + 1.0)
        return jnp.where(
            yy == 0,
            lp0,
            jnp.where(yy == 1, lpn0 + lp1, lpn0 + lpn1 + lp2),
        )

    def variational_expectations(self, f_means, f_vars, y):
        """Factored VE (mutlistage_likelihood.py:68-142): per-branch
        expectations combined by the observed branch indicator."""
        m0, m1, m2 = f_means[..., 0], f_means[..., 1], f_means[..., 2]
        v0, v1, v2 = f_vars[..., 0], f_vars[..., 1], f_vars[..., 2]
        yy = y[..., 0]
        ve0 = quad_expectation(_log_sigmoid, m0, v0)
        ven0 = quad_expectation(lambda f: _log_sigmoid(-f), m0, v0)
        ve1 = quad_expectation(_log_sigmoid, m1, v1)
        ven1 = quad_expectation(lambda f: _log_sigmoid(-f), m1, v1)
        y2 = jnp.maximum(yy - 2.0, 0.0)
        ve2 = y2 * m2 - jnp.exp(m2 + 0.5 * v2) - gammaln(y2 + 1.0)
        return jnp.where(
            yy == 0,
            ve0,
            jnp.where(yy == 1, ven0 + ve1, ven0 + ven1 + ve2),
        )

    def sample_y(self, f, key):
        """Forward sampling through the decision tree
        (mutlistage_likelihood.py:150-179)."""
        k0, k1, k2 = jax.random.split(key, 3)
        p0 = jax.nn.sigmoid(f[..., 0])
        p1 = jax.nn.sigmoid(f[..., 1])
        rate = jnp.exp(f[..., 2])
        is_zero = jax.random.bernoulli(k0, p0)
        is_one = jax.random.bernoulli(k1, p1)
        pois = jax.random.poisson(k2, rate).astype(f.dtype)
        y = jnp.where(is_zero, 0.0, jnp.where(is_one, 1.0, pois + 2.0))
        return y[..., None]
