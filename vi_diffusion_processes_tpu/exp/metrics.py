"""Evaluation metrics: NLPD and RMSE on held-out observations.

Equivalents of docs/diffusion_processes/exp_dp_utils.py:189 (``calculate_nlpd``)
and :209 (``calculate_rmse``): metrics at grid-matched test indices.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["nlpd", "rmse", "grid_indices"]


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


def rmse(pred_means: jnp.ndarray, observations: jnp.ndarray) -> jnp.ndarray:
    """``sqrt(mean (m − y)²)`` (exp_dp_utils.py:209-224)."""
    return jnp.sqrt(jnp.mean((pred_means - observations) ** 2))
