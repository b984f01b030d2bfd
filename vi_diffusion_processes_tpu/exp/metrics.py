"""Evaluation metrics: NLPD and RMSE on held-out observations.

Equivalents of docs/diffusion_processes/exp_dp_utils.py:189 (``calculate_nlpd``)
and :209 (``calculate_rmse``): metrics at grid-matched test indices.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = ["nlpd", "nlpd_full", "rmse", "grid_indices", "calculate_nlpd", "calculate_rmse"]


def grid_indices(time_grid: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """Indices of ``times`` in the (uniform, sorted) grid
    (exp_dp_utils.py pattern of equality matching)."""
    return jnp.searchsorted(time_grid, times)


def nlpd(
    pred_means: jnp.ndarray,
    pred_vars: jnp.ndarray,
    observations: jnp.ndarray,
    noise_variance: float = 0.0,
) -> jnp.ndarray:
    """``−mean log N(y; m, S + σ²)`` (exp_dp_utils.py:189-206)."""
    var = pred_vars + noise_variance
    lpd = -0.5 * (jnp.log(2.0 * jnp.pi * var) + (observations - pred_means) ** 2 / var)
    return -jnp.mean(lpd)


def nlpd_full(
    pred_means: jnp.ndarray,
    pred_covs: jnp.ndarray,
    observations: jnp.ndarray,
    noise_variance: float = 0.0,
) -> jnp.ndarray:
    """Full-covariance NLPD: ``−mean log N(y; m, S + σ²I)`` with the
    Cholesky of the full predictive covariance — the reference semantics
    (exp_dp_utils.py:189-206 via sde_utils.py::gaussian_log_predictive_density),
    which the diagonal :func:`nlpd` approximates only for D = 1.

    ``pred_means [N, D]``, ``pred_covs [N, D, D]``, ``observations [N, D]``.
    Cholesky + triangular solve only (TPU f64 has no LU decomposition).
    """
    d = pred_means.shape[-1]
    cov = pred_covs + noise_variance * jnp.eye(d, dtype=pred_covs.dtype)
    chol = jnp.linalg.cholesky(cov)
    diff = (observations - pred_means)[..., None]
    alpha = solve_triangular(chol, diff, lower=True)[..., 0]
    maha = jnp.sum(alpha**2, axis=-1)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    lpd = -0.5 * (d * jnp.log(2.0 * jnp.pi) + logdet + maha)
    return -jnp.mean(lpd)


def rmse(pred_means: jnp.ndarray, observations: jnp.ndarray) -> jnp.ndarray:
    """``sqrt(mean (m − y)²)`` (exp_dp_utils.py:209-224)."""
    return jnp.sqrt(jnp.mean((pred_means - observations) ** 2))


def calculate_nlpd(m, s, time_grid, test_data, noise_variance: float = 0.0) -> float:
    """Reference-shaped entry point (exp_dp_utils.py:189-206): gather the
    grid indices matching ``test_data[0]`` and evaluate the full-covariance
    NLPD there.  ``s`` may be ``[N, D, D]`` (full) or ``[N, D]`` (diagonal)."""
    idx = grid_indices(time_grid, test_data[0])
    m_test = m[idx]
    y_test = test_data[1]
    if s.ndim == m.ndim + 1:
        return float(nlpd_full(m_test, s[idx], y_test, noise_variance))
    return float(nlpd(m_test, s[idx], y_test, noise_variance))


def calculate_rmse(m, time_grid, test_data) -> float:
    """Reference-shaped entry point (exp_dp_utils.py:209-224)."""
    idx = grid_indices(time_grid, test_data[0])
    return float(rmse(m[idx], test_data[1]))
