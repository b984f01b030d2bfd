"""Conditional prediction at arbitrary new time points.

Equivalent of markovflow/conditionals.py (conditional_predict :29,
conditional_statistics :87, _conditional_statistics_from_transitions :122,
pairwise_marginals :424, base_conditional_predict :380).

Given a posterior (or prior) over states at conditioning points, the state at
a new time ``t ∈ (t₋, t₊)`` depends only on the pair ``(x₋, x₊)`` (Markov
property), so prediction is O(1) per new point: gather the pairwise joint,
apply the closed-form two-sided conditional.  Out-of-range points use the
reference's APPROX_INF padding (base.py:46): a pseudo conditioning point
infinitely far away, whose transition ``A → 0`` for stationary kernels makes
the conditional collapse to the one-sided formula.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import APPROX_INF
from ..utils.linalg import chol_psd, matmul_small, matvec_small, transpose_last, tri_solve
from .state_space_model import StateSpaceModel

__all__ = [
    "conditional_statistics",
    "conditional_predict",
    "pairwise_marginals",
    "base_conditional_predict",
]


def _conditional_statistics_from_transitions(a_mt, q_mt, a_tp, q_tp):
    """Statistics of ``p(x_t | x₋, x₊) = N(D x₋ + E x₊, T)`` from the two
    transitions (conditionals.py:122-203):

        ``Q₋₊ = Q_tp + A_tp Q_mt A_tpᵀ``
        ``E = Q_mt A_tpᵀ Q₋₊⁻¹``
        ``D = A_mt − E A_tp A_mt``
        ``T = Q_mt − Q_mt A_tpᵀ Q₋₊⁻¹ A_tp Q_mt``
    """
    from ..config import default_jitter

    a_tp_q_mt = matmul_small(a_tp, q_mt)
    q_mp = q_tp + matmul_small(a_tp_q_mt, transpose_last(a_tp))
    # jitter: deterministic state components (Q = 0, e.g. Constant/Harmonic
    # kernels) make Q₋₊ singular
    eye = jnp.eye(q_mp.shape[-1], dtype=q_mp.dtype)
    chol = chol_psd(q_mp + default_jitter() * eye)
    linv_atp_qmt = tri_solve(chol, a_tp_q_mt)
    e = transpose_last(tri_solve(chol, linv_atp_qmt, transpose=True))
    d = a_mt - matmul_small(matmul_small(e, a_tp), a_mt)
    t = q_mt - matmul_small(transpose_last(linv_atp_qmt), linv_atp_qmt)
    return d, e, t


def _conditional_precision_from_transitions(a_mt, q_mt, a_tp, q_tp):
    """``(D, E, T⁻¹)`` with the conditional *precision*
    ``T⁻¹ = Q₋ₜ⁻¹ + Aₜ₊ᵀQₜ₊⁻¹Aₜ₊`` (conditionals.py:169-193,
    return_precision=True branch)."""
    from ..utils.linalg import cho_solve

    d, e, _ = _conditional_statistics_from_transitions(a_mt, q_mt, a_tp, q_tp)
    eye = jnp.eye(a_mt.shape[-1], dtype=a_mt.dtype)
    q_mt_inv = cho_solve(chol_psd(q_mt), jnp.broadcast_to(eye, q_mt.shape))
    l_tp_inv_a = tri_solve(chol_psd(q_tp), a_tp)
    t_inv = q_mt_inv + matmul_small(transpose_last(l_tp_inv_a), l_tp_inv_a)
    return d, e, t_inv


def cyclic_reduction_conditional_statistics(
    explained_time_points: jnp.ndarray, conditioning_time_points: jnp.ndarray, kernel
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cyclic-reduction conditioning factors ``(F, G, L)``
    (conditionals.py:258-377): for interleaved explained/conditioning grids,
    ``p(xᵉₜ|xᶜₜ₋₁, xᶜₜ₊₁) = N(Fₜxᶜₜ₋₁ + Gₜxᶜₜ₊₁, (LLᵀ)⁻¹)`` — the natural
    seed of a fully parallel-in-time conditioning scheme (SURVEY.md §5)."""
    dtype = explained_time_points.dtype
    n_exp = explained_time_points.shape[-1]
    n_cond = conditioning_time_points.shape[-1]
    inf = jnp.asarray([APPROX_INF], dtype)
    augmented = jnp.concatenate([-inf, conditioning_time_points, inf])
    left = augmented[:n_exp]
    right = augmented[1 : n_exp + 1]
    a_mt, q_mt = kernel.transition_statistics(left, explained_time_points - left)
    a_tp, q_tp = kernel.transition_statistics(
        explained_time_points, right - explained_time_points
    )
    d, e, t_inv = _conditional_precision_from_transitions(a_mt, q_mt, a_tp, q_tp)
    l = chol_psd(t_inv)
    f = matmul_small(-transpose_last(e), l)
    g = matmul_small(-transpose_last(d), l)
    return f[..., 1:, :, :], g[..., :n_cond, :, :], l


def conditional_statistics(
    new_time_points: jnp.ndarray, training_time_points: jnp.ndarray, kernel
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``(P [M, d, 2d], T [M, d, d], indices [M])`` for sorted 1-D grids
    (conditionals.py:207-254)."""
    dtype = new_time_points.dtype
    indices = jnp.searchsorted(training_time_points, new_time_points)
    inf = jnp.asarray([APPROX_INF], dtype)
    augmented = jnp.concatenate([-inf, training_time_points, inf])
    t_minus = augmented[indices]
    t_plus = augmented[indices + 1]
    a_mt, q_mt = kernel.transition_statistics(t_minus, new_time_points - t_minus)
    a_tp, q_tp = kernel.transition_statistics(new_time_points, t_plus - new_time_points)
    d, e, t = _conditional_statistics_from_transitions(a_mt, q_mt, a_tp, q_tp)
    return jnp.concatenate([d, e], axis=-1), t, indices


def base_conditional_predict(
    conditional_projections: jnp.ndarray,
    conditional_covariances: jnp.ndarray,
    adjacent_states: jnp.ndarray,
    pairwise_state_covariances: Optional[jnp.ndarray] = None,
):
    """``p(x_t) = N(P m, T + P S Pᵀ)`` (conditionals.py:380-421).

    The pairwise-joint operands are ``2d``-sized; for d ≤ 8 the unrolled
    scalar-channel form still beats XLA's padded stack-matmul lowering on
    TPU, so these call sites opt in to the doubled unroll ceiling (see
    ``utils.linalg.matmul_small``).
    """
    from ..utils.linalg import _UNROLL_MAX_DIM

    pairwise_unroll = 2 * _UNROLL_MAX_DIM
    means = matvec_small(
        conditional_projections, adjacent_states, max_unroll=pairwise_unroll
    )
    covs = conditional_covariances
    if pairwise_state_covariances is not None:
        covs = covs + matmul_small(
            matmul_small(
                conditional_projections,
                pairwise_state_covariances,
                max_unroll=pairwise_unroll,
            ),
            transpose_last(conditional_projections),
            max_unroll=pairwise_unroll,
        )
    return means, covs


def pairwise_marginals(
    dist: StateSpaceModel, initial_mean: jnp.ndarray, initial_covariance: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joint of consecutive states, prior-extended at both ends
    (conditionals.py:424-485).  Returns ``([.., N+2, 2d], [.., N+2, 2d, 2d])``.
    """
    means, covs = dist.marginals()
    sub_covs = dist.subsequent_covariances(covs)  # Cov(x_{k+1}, x_k) = A_k P_k

    im = initial_mean[..., None, :]
    ic = initial_covariance[..., None, :, :]
    zeros = jnp.zeros_like(ic)

    ext_means = jnp.concatenate([im, means, im], axis=-2)
    ext_covs = jnp.concatenate([ic, covs, ic], axis=-3)
    ext_sub = jnp.concatenate([zeros, sub_covs, zeros], axis=-3)

    joint_mean = jnp.concatenate([ext_means[..., :-1, :], ext_means[..., 1:, :]], axis=-1)
    top = jnp.concatenate([ext_covs[..., :-1, :, :], transpose_last(ext_sub)], axis=-1)
    bot = jnp.concatenate([ext_sub, ext_covs[..., 1:, :, :]], axis=-1)
    joint_cov = jnp.concatenate([top, bot], axis=-2)
    return joint_mean, joint_cov


def conditional_predict(
    new_time_points: jnp.ndarray,
    training_time_points: jnp.ndarray,
    kernel,
    training_pairwise_means: jnp.ndarray,
    training_pairwise_covariances: Optional[jnp.ndarray] = None,
):
    """Marginal predictions at new points (conditionals.py:29-84).

    ``training_pairwise_means`` has the prior-extended layout from
    :func:`pairwise_marginals` (length ``num_training + 1`` pairs).
    """
    p, t, indices = conditional_statistics(new_time_points, training_time_points, kernel)
    pw_means = jnp.take(training_pairwise_means, indices, axis=-2)
    pw_covs = (
        None
        if training_pairwise_covariances is None
        else jnp.take(training_pairwise_covariances, indices, axis=-3)
    )
    return base_conditional_predict(p, t, pw_means, pw_covs)
