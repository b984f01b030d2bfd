"""Power-EP likelihood wrappers.

Equivalents of markovflow/likelihoods/likelihoods.py:149 (``PEPScalarLikelihood``)
and :223 (``PEPGaussian``): the α-power log expected density
``I = log ∫ p(y|f)^α N(f; μ, v) df`` and its first/second derivatives wrt μ,
computed by log-space Gauss–Hermite quadrature (closed form for Gaussian).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.scipy.special import logsumexp

from .base import DEFAULT_NUM_GAUSS_HERMITE, Likelihood

__all__ = ["PEPScalarLikelihood", "PEPGaussian", "gradient_correction"]


def gradient_correction(inputs, grads):
    """Map (∇I, ∇∇I) wrt μ into site natural-parameter updates
    (markovflow/models/pep.py:250-261):

        ``L2 = ½ (v + 1/∇∇I)⁻¹``, ``L1 = 2 L2 (∇I/∇∇I − μ)``.
    """
    f_mu, f_var = inputs
    g1, g2 = grads
    l2 = 0.5 / (f_var + 1.0 / g2)
    l1 = 2.0 * l2 * (g1 / g2 - f_mu)
    return l1, l2


@struct.dataclass
class PEPScalarLikelihood:
    """Wrap a scalar likelihood with α-power quadrature machinery."""

    base: Likelihood

    def log_expected_density(self, f_mu, f_var, y, alpha: float = 1.0):
        """``log ∫ p(y|f)^α N(f; μ, v) df`` per datum, elementwise over the
        output dim, via log-space Gauss–Hermite."""
        n = DEFAULT_NUM_GAUSS_HERMITE
        z, w = np.polynomial.hermite.hermgauss(n)
        z = jnp.asarray(z, f_mu.dtype)
        logw = jnp.log(jnp.asarray(w / np.sqrt(np.pi), f_mu.dtype))
        f = f_mu[..., None] + jnp.sqrt(2.0 * jnp.maximum(f_var, 1e-300))[..., None] * z
        lp = alpha * self.base._elementwise_log_prob(f, y[..., None])
        return jnp.sum(logsumexp(lp + logw, axis=-1), axis=-1)

    def grad_log_expected_density(self, f_mu, f_var, y, alpha: float = 1.0):
        """``I, (∇_μ I, ∇²_μ I)`` elementwise (likelihoods.py:196-212)."""
        def led_sum(mu):
            return jnp.sum(self.log_expected_density(mu, f_var, y, alpha))

        led = self.log_expected_density(f_mu, f_var, y, alpha)
        g1 = jax.grad(led_sum)(f_mu)
        # diagonal of the Hessian via grad-of-grad with a unit tangent
        g2 = jax.grad(lambda mu: jnp.sum(jax.grad(led_sum)(mu)))(f_mu)
        return led, (g1, g2)

    def variational_expectations(self, f_means, f_vars, y):
        return self.base.variational_expectations(f_means, f_vars, y)

    def predict_density(self, f_means, f_vars, y):
        return self.base.predict_density(f_means, f_vars, y)

    def predict_mean_and_var(self, f_means, f_vars):
        return self.base.predict_mean_and_var(f_means, f_vars)

    def log_probability_density(self, f, y):
        return self.base.log_probability_density(f, y)


@struct.dataclass
class PEPGaussian(PEPScalarLikelihood):
    """Closed-form α-power expected density for Gaussian observations
    (likelihoods.py:223-265):

        ``log ∫ N(y; f, σ²)^α N(f; μ, v) df``
        ``= α log N(y; μ, σ² + v) + c(α, σ²)``

    The reference drops the α-dependent constant (its :262 uses
    ``α·log N(y; μ, σ²+v)``); we match that behavior.
    """

    def log_expected_density(self, f_mu, f_var, y, alpha: float = 1.0):
        var = self.base.variance + f_var
        per_dim = -0.5 * (jnp.log(2.0 * jnp.pi * var) + (y - f_mu) ** 2 / var)
        return alpha * jnp.sum(per_dim, axis=-1)
