"""Linear drift ↔ state-space model conversions (Euler discretization).

Equivalent of markovflow/sde/drift.py:24 (``LinearDrift``):

    ``f(x, t) = A_t x + b_t``  ⇔  ``A_ssm = I + A·dt``, ``b_ssm = b·dt``,
    ``Q_ssm = q·dt``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ssm.state_space_model import StateSpaceModel

__all__ = ["LinearDrift", "linear_drift_from_ssm", "linear_drift_to_ssm"]


class LinearDrift(NamedTuple):
    """``f(x, t) = A_t x + b_t`` with ``A: [..., N, d, d]``, ``b: [..., N, d]``."""

    A: jnp.ndarray
    b: jnp.ndarray


def linear_drift_from_ssm(ssm: StateSpaceModel, dt) -> LinearDrift:
    """First-order inversion of the Euler map (drift.py:39-62):
    ``A = (A_ssm − I)/dt``, ``b = b_ssm/dt``."""
    d = ssm.state_dim
    eye = jnp.eye(d, dtype=ssm.state_offsets.dtype)
    return LinearDrift(
        A=(ssm.state_transitions - eye) / dt,
        b=ssm.state_offsets / dt,
    )


def linear_drift_to_ssm(
    drift: LinearDrift,
    q: jnp.ndarray,
    transition_times: jnp.ndarray,
    initial_mean: jnp.ndarray,
    initial_chol_covariance: jnp.ndarray,
) -> StateSpaceModel:
    """Euler discretization of a linear-drift SDE (drift.py:64-116).

    ``q``: diffusion covariance, ``[d, d]`` or ``[..., N, d, d]``.
    """
    d = drift.b.shape[-1]
    eye = jnp.eye(d, dtype=drift.b.dtype)
    dts = (transition_times[..., 1:] - transition_times[..., :-1])
    a_ssm = drift.A * dts[..., None, None] + eye
    b_ssm = drift.b * dts[..., None]
    q_b = jnp.broadcast_to(q, drift.A.shape)
    chol_q = jnp.linalg.cholesky(q_b * dts[..., None, None])
    return StateSpaceModel(
        initial_mean=initial_mean,
        chol_initial_covariance=initial_chol_covariance,
        state_transitions=a_ssm,
        state_offsets=b_ssm,
        chol_process_covariances=chol_q,
    )
