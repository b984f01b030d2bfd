"""Matern-family kernels with closed-form state transitions.

Equivalent of markovflow/kernels/matern.py (Matern12 :27,
OrnsteinUhlenbeck :130, Matern32 :237, Matern52 :376).  Instead of the
reference's hand-expanded matrix exponentials we exploit that for a Matern
companion feedback matrix ``F`` with ``λ``-fold eigenvalue,
``M = F + λI`` is nilpotent, so

    ``A(Δt) = e^{FΔt} = e^{−λΔt} Σ_{j<d} (Δt M)^j / j!``

is exact and cheap — a handful of batched adds/matmuls per grid, all fused
by XLA.  Steady-state covariances use the standard closed forms.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct  # noqa: F401  (kept for subclasses without guards)

from ..utils.validation import check_positive, validated_dataclass
from .base import StationaryKernel

__all__ = ["Matern12", "Matern32", "Matern52", "OrnsteinUhlenbeck"]


def _check_lengthscale_and_variance(kernel) -> None:
    """Constructor guard (matern.py:521-526): non-positive concrete
    hyperparameters raise; tracers are skipped (see utils/validation.py)."""
    check_positive(kernel.lengthscale, "lengthscale")
    check_positive(kernel.variance, "variance")


@validated_dataclass
class Matern12(StationaryKernel):
    """Matern 1/2 (exponential) kernel: ``d=1``, ``A = e^{−Δt/ℓ}``
    (matern.py:27-128)."""

    lengthscale: jnp.ndarray
    variance: jnp.ndarray
    state_mean: Optional[jnp.ndarray] = None

    def __post_init__(self):
        _check_lengthscale_and_variance(self)

    @property
    def state_dim(self) -> int:
        return 1

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        return jnp.reshape(-1.0 / self.lengthscale, (1, 1))

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        return jnp.reshape(self.variance, (1, 1))

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        return jnp.exp(-time_deltas / self.lengthscale)[..., None, None]


@validated_dataclass
class OrnsteinUhlenbeck(StationaryKernel):
    """OU kernel in decay/diffusion parameterization (matern.py:130-234):
    ``dx = −λx dt + √q dW``, ``P∞ = q / 2λ``."""

    decay: jnp.ndarray
    diffusion: jnp.ndarray
    state_mean: Optional[jnp.ndarray] = None

    def __post_init__(self):
        check_positive(self.decay, "decay")
        check_positive(self.diffusion, "diffusion")

    @property
    def state_dim(self) -> int:
        return 1

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        return jnp.reshape(-self.decay, (1, 1))

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        return jnp.reshape(self.diffusion / (2.0 * self.decay), (1, 1))

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        return jnp.exp(-self.decay * time_deltas)[..., None, None]


@validated_dataclass
class Matern32(StationaryKernel):
    """Matern 3/2: ``d=2``, ``λ = √3/ℓ`` (matern.py:237-374)."""

    lengthscale: jnp.ndarray
    variance: jnp.ndarray
    state_mean: Optional[jnp.ndarray] = None

    def __post_init__(self):
        _check_lengthscale_and_variance(self)

    @property
    def state_dim(self) -> int:
        return 2

    @property
    def _lambda(self) -> jnp.ndarray:
        return jnp.sqrt(3.0) / self.lengthscale

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        lam = self._lambda
        z = jnp.zeros_like(lam)
        o = jnp.ones_like(lam)
        return jnp.stack(
            [jnp.stack([z, o], -1), jnp.stack([-lam**2, -2.0 * lam], -1)], -2
        )

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        lam = self._lambda
        z = jnp.zeros_like(lam)
        return self.variance * jnp.stack(
            [jnp.stack([jnp.ones_like(lam), z], -1), jnp.stack([z, lam**2], -1)], -2
        )

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        lam = self._lambda
        dt = time_deltas[..., None, None]
        eye = jnp.eye(2, dtype=time_deltas.dtype)
        m = self.feedback_matrix + lam * eye  # nilpotent: M² = 0
        return jnp.exp(-lam * dt) * (eye + dt * m)


@validated_dataclass
class Matern52(StationaryKernel):
    """Matern 5/2: ``d=3``, ``λ = √5/ℓ`` (matern.py:376-518)."""

    lengthscale: jnp.ndarray
    variance: jnp.ndarray
    state_mean: Optional[jnp.ndarray] = None

    def __post_init__(self):
        _check_lengthscale_and_variance(self)

    @property
    def state_dim(self) -> int:
        return 3

    @property
    def _lambda(self) -> jnp.ndarray:
        return jnp.sqrt(5.0) / self.lengthscale

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        lam = self._lambda
        z = jnp.zeros_like(lam)
        o = jnp.ones_like(lam)
        return jnp.stack(
            [
                jnp.stack([z, o, z], -1),
                jnp.stack([z, z, o], -1),
                jnp.stack([-lam**3, -3.0 * lam**2, -3.0 * lam], -1),
            ],
            -2,
        )

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        lam = self._lambda
        kappa = lam**2 / 3.0
        z = jnp.zeros_like(lam)
        o = jnp.ones_like(lam)
        return self.variance * jnp.stack(
            [
                jnp.stack([o, z, -kappa], -1),
                jnp.stack([z, kappa, z], -1),
                jnp.stack([-kappa, z, lam**4], -1),
            ],
            -2,
        )

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        lam = self._lambda
        dt = time_deltas[..., None, None]
        eye = jnp.eye(3, dtype=time_deltas.dtype)
        m = self.feedback_matrix + lam * eye  # nilpotent: M³ = 0
        return jnp.exp(-lam * dt) * (eye + dt * m + 0.5 * dt**2 * (m @ m))
