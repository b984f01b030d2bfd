"""Parameterization transforms: SSM ↔ expectation ↔ natural parameters.

Equivalent of markovflow/ssm_gaussian_transformations.py (ssm_to_expectations
:32, expectations_to_ssm_params :93, ssm_to_naturals :182,
ssm_to_naturals_no_smoothing :257, naturals_to_ssm_params :333,
naturals_to_ssm_params_no_smoothing :515).

The reference's ``naturals_to_ssm_params`` is "C++-heavy" (banded Cholesky +
``inverse_from_cholesky_band`` + ``solve_triang_band``); here the same map is
one UDU' factorization of the block-tridiagonal precision
(:func:`~..ops.btd.btd_udu`) — the SpInGP identity ``K = U D Uᵀ`` with
``U = A⁻ᵀ`` directly exposes the transition matrices and noise precisions —
plus two bidiagonal solves for the means.  Everything is differentiable by
construction (JAX traces through the scans), replacing the reference's
hand-registered C++ gradients.

Parameter conventions (matching the reference exactly):

* expectations: ``η = E[x]`` per state; ``Η`` = in-band blocks of ``E[xxᵀ]``
  (diag ``Σ_k + μ_kμ_kᵀ``; sub ``A_kΣ_k + μ_{k+1}μ_kᵀ`` at (k+1,k)),
* naturals: density ``∝ exp(θᵀx + vec-free Θ·xxᵀ)`` so the precision is
  ``K = −2Θ_diag`` on the diagonal and ``−Θ_sub`` on the sub-diagonal and
  the mean solves ``K μ = θ``.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops.btd import BTD, btd_udu
from ..utils.linalg import cho_solve, chol_psd, transpose_last, tri_solve
from .state_space_model import StateSpaceModel

__all__ = [
    "ssm_to_expectations",
    "expectations_to_ssm_params",
    "ssm_to_naturals",
    "ssm_to_naturals_no_smoothing",
    "naturals_to_ssm_params",
    "naturals_to_ssm_params_no_smoothing",
    "naturals_to_ssm",
    "expectations_to_ssm",
]


def ssm_to_expectations(ssm: StateSpaceModel) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SSM → expectation parameters ``(η [..,N+1,D], Η_diag, Η_sub)``
    (ssm_gaussian_transformations.py:32-90)."""
    means, covs = ssm.marginals()
    a_s = ssm.state_transitions
    eta_linear = means
    eta_diag = covs + means[..., :, None] * means[..., None, :]
    eta_sub = a_s @ covs[..., :-1, :, :] + means[..., 1:, :, None] * means[..., :-1, None, :]
    return eta_linear, eta_diag, eta_sub


def expectations_to_ssm_params(eta_linear, eta_diag, eta_sub):
    """Expectation parameters → SSM params (tuple ordered as the reference:
    As, offsets, chol_P0, chol_Qs, initial_mean)
    (ssm_gaussian_transformations.py:93-178)."""
    mu = eta_linear
    covs = eta_diag - mu[..., :, None] * mu[..., None, :]
    # Σ_{k,k+1} = Σ_k A_{k+1}ᵀ  (upper cross-block)
    covs_upper = transpose_last(eta_sub) - mu[..., :-1, :, None] * mu[..., 1:, None, :]
    chols = chol_psd(covs)
    a_s = transpose_last(cho_solve(chols[..., :-1, :, :], covs_upper))
    initial_mean = mu[..., 0, :]
    chol_p0 = chols[..., 0, :, :]
    offsets = mu[..., 1:, :] - jnp.einsum("...ij,...j->...i", a_s, mu[..., :-1, :])
    cond_covs = covs[..., 1:, :, :] - a_s @ covs[..., :-1, :, :] @ transpose_last(a_s)
    chol_qs = chol_psd(cond_covs)
    return a_s, offsets, chol_p0, chol_qs, initial_mean


def expectations_to_ssm(eta_linear, eta_diag, eta_sub) -> StateSpaceModel:
    a_s, offsets, chol_p0, chol_qs, mu0 = expectations_to_ssm_params(
        eta_linear, eta_diag, eta_sub
    )
    return StateSpaceModel(mu0, chol_p0, a_s, offsets, chol_qs)


def _precisions(ssm: StateSpaceModel) -> jnp.ndarray:
    """``[P₀⁻¹, Q₁⁻¹, …, Q_N⁻¹]``: ``[..., N+1, d, d]``."""
    chols = ssm.concatenated_cholesky_process_covariance
    eye = jnp.eye(ssm.state_dim, dtype=chols.dtype)
    return cho_solve(chols, jnp.broadcast_to(eye, chols.shape))


def ssm_to_naturals(ssm: StateSpaceModel):
    """SSM → natural parameters with smoothing information
    (ssm_gaussian_transformations.py:182-253):

        ``θ_k = Q_k⁻¹b_k − A_{k+1}ᵀQ_{k+1}⁻¹b_{k+1}`` (θ_N = Q_N⁻¹b_N),
        ``Θ_diag = −½(Q_k⁻¹ + A_{k+1}ᵀQ_{k+1}⁻¹A_{k+1})``,
        ``Θ_sub = Q_{k+1}⁻¹A_{k+1}``.
    """
    a_s = ssm.state_transitions
    offsets = ssm.concatenated_state_offsets
    chols = ssm.concatenated_cholesky_process_covariance

    linv_a = tri_solve(chols[..., 1:, :, :], a_s)
    theta_sub = tri_solve(chols[..., 1:, :, :], linv_a, transpose=True)  # Q⁻¹A

    qinv_b = cho_solve(chols, offsets[..., None])[..., 0]
    theta_linear = jnp.concatenate(
        [
            qinv_b[..., :-1, :]
            - jnp.einsum("...ji,...j->...i", a_s, qinv_b[..., 1:, :]),
            qinv_b[..., -1:, :],
        ],
        axis=-2,
    )

    at_qinv_a = transpose_last(linv_a) @ linv_a
    at_qinv_a = jnp.concatenate([at_qinv_a, jnp.zeros_like(at_qinv_a[..., :1, :, :])], axis=-3)
    precisions = _precisions(ssm)
    theta_diag = -0.5 * (precisions + at_qinv_a)
    return theta_linear, theta_diag, theta_sub


def ssm_to_naturals_no_smoothing(ssm: StateSpaceModel):
    """Lin et al. (2019) variant: no smoothing info in θ
    (ssm_gaussian_transformations.py:257-330)."""
    offsets = ssm.concatenated_state_offsets
    chols = ssm.concatenated_cholesky_process_covariance
    theta_sub = cho_solve(chols[..., 1:, :, :], ssm.state_transitions)
    theta_linear = cho_solve(chols, offsets[..., None])[..., 0]
    theta_diag = -0.5 * _precisions(ssm)
    return theta_linear, theta_diag, theta_sub


def naturals_to_ssm_params(theta_linear, theta_diag, theta_sub):
    """Natural parameters → SSM params — the hot transform of CVI
    (ssm_gaussian_transformations.py:333-512).

    The precision is ``K = (−2Θ_diag, −Θ_sub)``; factor ``K = U D Uᵀ``
    (unit upper block-bidiagonal U) so that by SpInGP

        ``A_k = −U[k,k+1]ᵀ``, ``Q_{k+1} = D_{k+1}⁻¹``, ``P₀ = D₀⁻¹``,

    then the means solve ``K μ = θ`` (two bidiagonal substitutions through
    the same factor) and ``b_k = μ_{k+1} − A_k μ_k``.
    """
    from ..ops.btd import (
        affine_scan,
        btd_udu_parallel_1d,
        btd_udu_parallel_ch,
        btd_udu_parallel_dense,
    )

    prec = BTD(diag=-2.0 * theta_diag, sub=-theta_sub)
    d = theta_linear.shape[-1]
    from ..parallel.pskf import ch_max_dim

    if d == 1:
        # O(log N)-depth Möbius-scan fast path for the CVI hot loop
        d_blocks, u_super = btd_udu_parallel_1d(prec)
    elif (
        2 <= d <= ch_max_dim()
        and theta_diag.ndim == 3
        and theta_diag.dtype == jnp.float64
        and theta_diag.shape[0] >= 4096
    ):
        # 2 ≤ d ≤ ch_max_dim() long grids: channelized Schur-segment scan
        # (all pivots PD; d ≥ 4 inverses are PD-Cholesky-routed on packed
        # [d,d,nb] arrays inside udu_channels — covers kernel-sum and
        # reference-scale spatio-temporal state dims).  On TPU, d > 8 runs
        # the 3-instantiation blocked variant (blocked_assoc_scan_packed
        # with cross_seq=True) to keep the MLIR under the remote compiler's
        # OOM threshold; this IS the shipping d=14 route.
        d_blocks, u_super = btd_udu_parallel_ch(prec)
    elif (
        d >= 2
        and theta_diag.ndim == 3
        and theta_diag.dtype == jnp.float64
        and theta_diag.shape[0] >= 4096
    ):
        # f64 long unbatched grids past the channelized ceiling (d > 16):
        # dense Schur-segment associative scan — one batched Cholesky/solve
        # custom call per level instead of one tiny call per grid point
        # (the sequential fallback was 8.6 s of an 11 s d=14 spatio step).
        # f64-gated like the channelized branch: its ainv_pd/achol pivots
        # are untested under f32 association noise, so f32 keeps the exact
        # sequential btd_udu below.
        d_blocks, u_super = btd_udu_parallel_dense(prec)
    else:
        d_blocks, u_super = btd_udu(prec)
    a_s = -transpose_last(u_super)

    chols_dinv = chol_psd(d_blocks)  # chol of D_k (precisions)
    eye = jnp.eye(d, dtype=theta_linear.dtype)
    covs = cho_solve(chols_dinv, jnp.broadcast_to(eye, chols_dinv.shape))
    chol_covs = chol_psd(covs)
    chol_p0 = chol_covs[..., 0, :, :]
    chol_qs = chol_covs[..., 1:, :, :]

    # μ = K⁻¹θ via U z = θ (backward), w = D⁻¹ z, Uᵀ μ = w (forward) —
    # both bidiagonal substitutions are affine recursions → parallel scans
    z_rest = affine_scan(-u_super, theta_linear[..., :-1, :], theta_linear[..., -1, :], reverse=True)
    z = jnp.concatenate([z_rest, theta_linear[..., -1:, :]], axis=-2)
    w = jnp.einsum("...ij,...j->...i", covs, z)
    mu_rest = affine_scan(-transpose_last(u_super), w[..., 1:, :], w[..., 0, :])
    mu = jnp.concatenate([w[..., :1, :], mu_rest], axis=-2)

    offsets = mu[..., 1:, :] - jnp.einsum("...ij,...j->...i", a_s, mu[..., :-1, :])
    return a_s, offsets, chol_p0, chol_qs, mu[..., 0, :]


def naturals_to_ssm(theta_linear, theta_diag, theta_sub) -> StateSpaceModel:
    a_s, offsets, chol_p0, chol_qs, mu0 = naturals_to_ssm_params(
        theta_linear, theta_diag, theta_sub
    )
    return StateSpaceModel(mu0, chol_p0, a_s, offsets, chol_qs)


def naturals_to_ssm_params_no_smoothing(theta_linear, theta_diag, theta_sub):
    """Inverse of :func:`ssm_to_naturals_no_smoothing` — pure blockwise
    (ssm_gaussian_transformations.py:515-593):

        ``Q_k = (−2Θ_diag,k)⁻¹``, ``A_k = Q_k Θ_sub,k``, ``b_k = Q_k θ_k``.
    """
    precisions = -2.0 * theta_diag
    chol_prec = chol_psd(precisions)
    eye = jnp.eye(theta_linear.shape[-1], dtype=theta_linear.dtype)
    covs = cho_solve(chol_prec, jnp.broadcast_to(eye, chol_prec.shape))
    chol_covs = chol_psd(covs)
    a_s = covs[..., 1:, :, :] @ theta_sub
    bs = jnp.einsum("...ij,...j->...i", covs, theta_linear)
    return (
        a_s,
        bs[..., 1:, :],
        chol_covs[..., 0, :, :],
        chol_covs[..., 1:, :, :],
        bs[..., 0, :],
    )
