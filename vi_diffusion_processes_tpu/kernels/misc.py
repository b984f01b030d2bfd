"""Constant, HarmonicOscillator (periodic) and LEG kernels.

Equivalents of markovflow/kernels/constant.py:28,
markovflow/kernels/periodic.py:27 and
markovflow/kernels/latent_exp_generated.py:29.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import expm

from ..utils.linalg import transpose_last
from ..utils.validation import check_positive, validated_dataclass
from .base import StationaryKernel

__all__ = ["Constant", "HarmonicOscillator", "LatentExponentiallyGenerated"]


@validated_dataclass
class Constant(StationaryKernel):
    """Constant GP: ``d=1``, ``A=1``, ``Q=0``, ``P∞ = σ²`` (constant.py:28)."""

    variance: jnp.ndarray
    state_mean: Optional[jnp.ndarray] = None

    def __post_init__(self):
        check_positive(self.variance, "variance")

    @property
    def state_dim(self) -> int:
        return 1

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        return jnp.zeros((1, 1))

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        return jnp.reshape(self.variance, (1, 1))

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        return jnp.ones(time_deltas.shape + (1, 1), dtype=time_deltas.dtype)

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(transition_times, time_deltas)
        return a_s, jnp.zeros_like(a_s)


@validated_dataclass
class HarmonicOscillator(StationaryKernel):
    """Deterministic periodic oscillation: ``d=2``, rotation transitions,
    ``Q=0``, ``P∞ = σ²I`` (periodic.py:27-174)."""

    variance: jnp.ndarray
    period: jnp.ndarray
    state_mean: Optional[jnp.ndarray] = None

    def __post_init__(self):
        check_positive(self.variance, "variance")
        check_positive(self.period, "period")

    @property
    def state_dim(self) -> int:
        return 2

    @property
    def _omega(self) -> jnp.ndarray:
        return 2.0 * jnp.pi / self.period

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        w = self._omega
        z = jnp.zeros_like(w)
        return jnp.stack([jnp.stack([z, -w], -1), jnp.stack([w, z], -1)], -2)

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        return self.variance * jnp.eye(2)

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        ang = (self._omega * time_deltas)[..., None, None]
        c, s = jnp.cos(ang), jnp.sin(ang)
        row0 = jnp.concatenate([c, -s], axis=-1)
        row1 = jnp.concatenate([s, c], axis=-1)
        return jnp.concatenate([row0, row1], axis=-2)

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(transition_times, time_deltas)
        return a_s, jnp.zeros_like(a_s)


@struct.dataclass
class LatentExponentiallyGenerated(StationaryKernel):
    """LEG-GP kernel (Loper et al. 2020; latent_exp_generated.py:29):
    ``F = −½(NNᵀ + R − Rᵀ)``, ``P∞ = I``, ``A = expm(FΔt)``.

    The only kernel requiring a true matrix exponential — computed batched
    over the grid with ``jax.scipy.linalg.expm``.
    """

    N: jnp.ndarray
    R: jnp.ndarray

    @property
    def state_dim(self) -> int:
        return self.N.shape[-1]

    @property
    def output_dim(self) -> int:
        return self.state_dim

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        return -0.5 * (self.N @ transpose_last(self.N) + self.R - transpose_last(self.R))

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        return jnp.eye(self.state_dim)

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        f = self.feedback_matrix.astype(time_deltas.dtype)
        return expm(time_deltas[..., None, None] * f)
