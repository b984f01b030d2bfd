"""Gauss–Hermite quadrature against multivariate Gaussians.

JAX equivalent of ``gpflow.quadrature.mvnquad`` — the reference uses it for
all expected-drift / expected-gradient-drift / KL terms in the SDE package
(markovflow/sde/sde.py:92-131, sde_utils.py:228-249).  Node/weight
construction matches gpflow: physicists' Hermite nodes ``z``, transform
``x = μ + √2·L z``, weights ``Πwᵢ / π^{D/2}``.
"""
from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
import jax.numpy as jnp

from ..utils.linalg import cholesky_with_jitter


def gauss_hermite_grid(dim: int, n_points: int, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cartesian-product Gauss–Hermite grid: ``(z [Hᵈ, d], w [Hᵈ])``."""
    z, w = np.polynomial.hermite.hermgauss(n_points)
    zs = np.meshgrid(*([z] * dim), indexing="ij")
    ws = np.meshgrid(*([w] * dim), indexing="ij")
    grid = np.stack([g.reshape(-1) for g in zs], axis=-1)  # [H^d, d]
    weights = np.prod(np.stack([g.reshape(-1) for g in ws], axis=-1), axis=-1)
    weights = weights / np.pi ** (dim / 2.0)
    return jnp.asarray(grid, dtype=dtype), jnp.asarray(weights, dtype=dtype)


def mvnquad(
    func: Callable[[jnp.ndarray], jnp.ndarray],
    means: jnp.ndarray,
    covs: jnp.ndarray,
    n_points: int = 10,
) -> jnp.ndarray:
    """``E_{x ~ N(means, covs)}[func(x)]`` via Gauss–Hermite quadrature.

    ``means: [..., d]``, ``covs: [..., d, d]``.  ``func`` must be vectorized:
    it maps ``[..., P, d]`` to ``[..., P, out...]`` where ``P = n_points**d``
    is the quadrature-grid axis inserted just before the state axis.  Returns
    ``[..., out...]``.  Matches gpflow's ``mvnquad`` (H per dimension).
    """
    d = means.shape[-1]
    grid, weights = gauss_hermite_grid(d, n_points, means.dtype)  # [P, d], [P]
    chol = cholesky_with_jitter(covs)
    x = means[..., None, :] + jnp.sqrt(jnp.asarray(2.0, means.dtype)) * jnp.einsum(
        "...ij,pj->...pi", chol, grid
    )  # [..., P, d]
    fx = jnp.asarray(func(x))  # [..., P, out...]
    p_axis = means.ndim - 1  # position of the P axis in fx
    shape = [1] * fx.ndim
    shape[p_axis] = weights.shape[0]
    return jnp.sum(fx * weights.reshape(shape), axis=p_axis)
