"""Gaussian likelihoods (closed-form).

``Gaussian``: scalar-variance i.i.d. observation noise (the gpflow
likelihood the reference's models default to).
``MultivariateGaussian``: full covariance via its Cholesky factor —
equivalent of markovflow/likelihoods/multivariate_gaussian.py:31.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..utils.linalg import chol_psd, mvn_logpdf, transpose_last, tri_solve
from .base import Likelihood

__all__ = ["Gaussian", "MultivariateGaussian"]

_LOG2PI = float(jnp.log(2.0 * jnp.pi))


from ..utils.validation import validated_dataclass


@validated_dataclass
class Gaussian(Likelihood):
    """``p(y|f) = N(y; f, σ²)`` with scalar variance σ² (trainable leaf)."""

    variance: jnp.ndarray

    def __post_init__(self):
        from ..utils.validation import check_positive

        check_positive(self.variance, "variance")

    def _elementwise_log_prob(self, f, y):
        return -0.5 * (_LOG2PI + jnp.log(self.variance) + (y - f) ** 2 / self.variance)

    def log_probability_density(self, f, y):
        return jnp.sum(self._elementwise_log_prob(f, y), axis=-1)

    def variational_expectations(self, f_means, f_vars, y):
        """Closed form: ``−½log(2πσ²) − ((y−μ)² + S)/(2σ²)`` summed over dims."""
        per_dim = -0.5 * (
            _LOG2PI + jnp.log(self.variance) + ((y - f_means) ** 2 + f_vars) / self.variance
        )
        return jnp.sum(per_dim, axis=-1)

    def predict_density(self, f_means, f_vars, y):
        var = f_vars + self.variance
        per_dim = -0.5 * (_LOG2PI + jnp.log(var) + (y - f_means) ** 2 / var)
        return jnp.sum(per_dim, axis=-1)

    def predict_mean_and_var(self, f_means, f_vars):
        return f_means, f_vars + self.variance

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.broadcast_to(self.variance, f.shape)


@struct.dataclass
class MultivariateGaussian(Likelihood):
    """``p(y|f) = N(y; f, LLᵀ)`` with full covariance
    (multivariate_gaussian.py:31-177).

    ``chol_covariance: [m, m]`` lower-triangular (trainable leaf).
    Variational expectations accept either marginal variances
    ``[..., n, m]`` or full output covariances ``[..., n, m, m]``.
    """

    chol_covariance: jnp.ndarray

    @property
    def output_dim(self) -> int:
        return self.chol_covariance.shape[-1]

    def log_probability_density(self, f, y):
        return mvn_logpdf(y, f, self.chol_covariance)

    def variational_expectations(self, f_means, f_covs, y):
        """``log N(y; μ, Σ) − ½ tr(Σ⁻¹ S)`` (multivariate_gaussian.py:80-115)."""
        lp = mvn_logpdf(y, f_means, self.chol_covariance)
        if f_covs.ndim == f_means.ndim:  # diagonal S
            s = f_covs[..., None] * jnp.eye(self.output_dim, dtype=f_covs.dtype)
        else:
            s = f_covs
        linv_s = tri_solve(self.chol_covariance, s)
        linv_s_linvt = tri_solve(self.chol_covariance, transpose_last(linv_s))
        trace = jnp.trace(linv_s_linvt, axis1=-2, axis2=-1)
        return lp - 0.5 * trace

    def predict_density(self, f_means, f_covs, y):
        if f_covs.ndim == f_means.ndim:
            s = f_covs[..., None] * jnp.eye(self.output_dim, dtype=f_covs.dtype)
        else:
            s = f_covs
        cov = self.chol_covariance @ transpose_last(self.chol_covariance) + s
        return mvn_logpdf(y, f_means, chol_psd(cov))

    def predict_mean_and_var(self, f_means, f_covs):
        cov = self.chol_covariance @ transpose_last(self.chol_covariance)
        if f_covs.ndim == f_means.ndim:
            return f_means, f_covs + jnp.diagonal(cov, axis1=-2, axis2=-1)
        return f_means, f_covs + cov
