"""Gaussian sites in f-space + back-projection to state space.

Shared by the CVI/PEP models and the Kalman API layer (equivalents of
``GaussianSitesNat``, kalman_filter.py:382, and ``back_project_nats``,
variational_cvi.py:423).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ssm.state_space_model import StateSpaceModel
from ..utils.linalg import chol_psd, cho_solve, transpose_last
from .pskf import parallel_filter, site_log_normalizer

__all__ = ["GaussianSites", "back_project_nats", "sites_log_likelihood", "gaussian_observation_sites"]

_LOG2PI = float(jnp.log(2.0 * jnp.pi))


class GaussianSites(NamedTuple):
    """f-space sites in natural form (kalman_filter.py:382-437 equivalent).

    ``nat1: [..., N, m]``, ``nat2: [..., N, m, m]`` (≤ 0 definite).
    """

    nat1: jnp.ndarray
    nat2: jnp.ndarray

    @classmethod
    def zeros_like_observations(cls, observations: jnp.ndarray) -> "GaussianSites":
        m = observations.shape[-1]
        eye = jnp.eye(m, dtype=observations.dtype)
        nat2 = jnp.broadcast_to(-1e-10 * eye, observations.shape + (m,))
        return cls(nat1=jnp.zeros_like(observations), nat2=nat2)


def back_project_nats(sites: GaussianSites, emission_matrix: jnp.ndarray):
    """f-space site naturals → state-space information sites
    (variational_cvi.py:423-446): ``θ = Hᵀθ₁``, ``Λ = Hᵀ(−2θ₂)H``."""
    h = emission_matrix
    nat1 = jnp.einsum("...ji,...j->...i", h, sites.nat1)
    prec = transpose_last(h) @ (-2.0 * sites.nat2) @ h
    return nat1, prec


def sites_log_likelihood(dist_p: StateSpaceModel, sites: GaussianSites, emission) -> jnp.ndarray:
    """``log p(ỹ)`` of the site-augmented conjugate model — matches the
    reference's ``KalmanFilterWithSites.log_likelihood``
    (kalman_filter.py:440-500): sites are pseudo Gaussian observations
    ``ỹ = R̃θ₁`` with ``R̃ = (−2θ₂)⁻¹``, so the generic site normalizer is
    shifted by the per-site Gaussian normalization constants."""
    nat1, prec = back_project_nats(sites, emission.emission_matrix)
    filt = parallel_filter(dist_p, nat1, prec)
    log_z = site_log_normalizer(filt, nat1, prec)

    m = sites.nat2.shape[-1]
    site_prec_f = -2.0 * sites.nat2  # [..., N, m, m], PD
    chol = chol_psd(site_prec_f)
    alpha = jax.scipy.linalg.cho_solve((chol, True), sites.nat1[..., None])[..., 0]
    quad = jnp.einsum("...i,...i->...", sites.nat1, alpha)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol, axis1=-2, axis2=-1))), axis=-1
    )
    constants = -0.5 * quad + 0.5 * logdet - 0.5 * m * jnp.log(2.0 * jnp.pi)
    return log_z + jnp.sum(constants, axis=-1)


def gaussian_observation_sites(
    emission_matrix: jnp.ndarray, chol_obs_covariance: jnp.ndarray, observations: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convert Gaussian observations into information-form state sites.

    ``Λ_k = H_kᵀ R⁻¹ H_k``, ``θ_k = H_kᵀ R⁻¹ y_k``, plus the per-datum
    constants ``−½ y_kᵀR⁻¹y_k − ½ log|2πR|`` that turn the generic site
    normalizer into ``log p(y)`` (kalman_filter.py:184-255 equivalence).
    """
    h = emission_matrix
    m = h.shape[-2]
    rinv_h = cho_solve(chol_obs_covariance, h)
    nat2 = transpose_last(h) @ rinv_h
    rinv_y = cho_solve(chol_obs_covariance, observations[..., None])[..., 0]
    nat1 = jnp.einsum("...ji,...j->...i", h, rinv_y)
    log_det_r = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_obs_covariance, axis1=-2, axis2=-1))), axis=-1
    )
    constants = -0.5 * (
        jnp.einsum("...i,...i->...", observations, rinv_y) + m * _LOG2PI + log_det_r
    )
    return nat1, nat2, constants
