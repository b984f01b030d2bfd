"""Likelihood interface with Gauss–Hermite defaults.

Equivalent of markovflow/likelihoods/likelihoods.py:28 (the reference's
``Likelihood`` ABC; gpflow likelihoods are also accepted by its models).
All methods are batched over arbitrary leading dims; the observation axis is
handled by the caller.  Shapes follow the reference:

* ``f_means/f_vars: [..., n, m]`` (marginal means / variances of f)
* ``y: [..., n, m]``

Non-closed-form likelihoods fall back to per-dimension Gauss–Hermite
quadrature (the gpflow ``ndiagquad`` pattern).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

__all__ = ["Likelihood", "quad_expectation"]

DEFAULT_NUM_GAUSS_HERMITE = 20


def quad_expectation(
    func: Callable[[jnp.ndarray], jnp.ndarray],
    f_means: jnp.ndarray,
    f_vars: jnp.ndarray,
    n_points: int = DEFAULT_NUM_GAUSS_HERMITE,
) -> jnp.ndarray:
    """``E_{f ~ N(μ, σ²)}[func(f)]`` elementwise via 1D Gauss–Hermite.

    ``f_means, f_vars`` elementwise; func applied elementwise.
    """
    z, w = np.polynomial.hermite.hermgauss(n_points)
    z = jnp.asarray(z, f_means.dtype)
    w = jnp.asarray(w / np.sqrt(np.pi), f_means.dtype)
    f = f_means[..., None] + jnp.sqrt(2.0 * jnp.maximum(f_vars, 0.0))[..., None] * z
    return jnp.sum(func(f) * w, axis=-1)


class Likelihood:
    """Scalar-output likelihood interface (likelihoods.py:28-147)."""

    def log_probability_density(self, f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """``log p(y|f)`` summed over output dims: ``[..., n, m] → [..., n]``."""
        raise NotImplementedError

    def variational_expectations(
        self, f_means: jnp.ndarray, f_vars: jnp.ndarray, y: jnp.ndarray
    ) -> jnp.ndarray:
        """``∫ q(f) log p(y|f) df`` per datum → ``[..., n]``.

        Default: per-dimension Gauss–Hermite (likelihoods.py:68-96).
        """
        lp = quad_expectation(
            lambda f: self._elementwise_log_prob(f, y[..., None]), f_means, f_vars
        )
        return jnp.sum(lp, axis=-1)

    def predict_density(self, f_means, f_vars, y) -> jnp.ndarray:
        """``log ∫ q(f) p(y|f) df`` per datum (likelihoods.py:98-118)."""
        from jax.scipy.special import logsumexp

        n = DEFAULT_NUM_GAUSS_HERMITE
        z, w = np.polynomial.hermite.hermgauss(n)
        z = jnp.asarray(z, f_means.dtype)
        logw = jnp.log(jnp.asarray(w / np.sqrt(np.pi), f_means.dtype))
        f = f_means[..., None] + jnp.sqrt(2.0 * jnp.maximum(f_vars, 0.0))[..., None] * z
        lp = self._elementwise_log_prob(f, y[..., None])  # [..., n, m, P]
        per_dim = logsumexp(lp + logw, axis=-1)
        return jnp.sum(per_dim, axis=-1)

    def predict_mean_and_var(self, f_means, f_vars):
        """Predictive mean/variance of y (likelihoods.py:120-147)."""
        ey = quad_expectation(self.conditional_mean, f_means, f_vars)
        ey2 = quad_expectation(
            lambda f: self.conditional_variance(f) + self.conditional_mean(f) ** 2,
            f_means,
            f_vars,
        )
        return ey, ey2 - ey**2

    # --- hooks for the quadrature defaults -------------------------------
    def _elementwise_log_prob(self, f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """``log p(y|f)`` elementwise (no reduction)."""
        raise NotImplementedError

    def conditional_mean(self, f: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def conditional_variance(self, f: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError
