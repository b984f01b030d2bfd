"""The SDE zoo: seven concrete diffusion priors.

Equivalents of markovflow/sde/sde.py — OrnsteinUhlenbeckSDE :134,
DoubleWellSDE :179, BenesSDE :227, SineDiffusionSDE :271,
SqrtDiffusionSDE :315, MLPDrift :359, VanderPolOscillatorSDE :432.
Each is a flax pytree whose array fields (decay/scale/θ/q/MLP weights) are
trainable hyperparameters — drift learning is plain ``jax.grad``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import SDE

__all__ = [
    "OrnsteinUhlenbeckSDE",
    "DoubleWellSDE",
    "BenesSDE",
    "SineDiffusionSDE",
    "SqrtDiffusionSDE",
    "MLPDrift",
    "VanderPolOscillatorSDE",
]


class _ScalarDriftMixin:
    """d = 1 SDEs with elementwise drift formulas: the channelized drift is
    the same formula applied to the single channel."""

    def drift_ch(self, xs, t=None):
        return (self.drift(xs[0], t),)


class _ConstantDiffusionSDE(SDE):
    """Shared diffusion plumbing: constant covariance field ``q_diag``."""

    @property
    def q(self) -> jnp.ndarray:
        return self.q_mat

    def diffusion(self, x, t=None):
        chol = jnp.linalg.cholesky(self.q_mat)
        return jnp.broadcast_to(chol, x.shape + (x.shape[-1],))


@struct.dataclass
class OrnsteinUhlenbeckSDE(_ScalarDriftMixin, _ConstantDiffusionSDE):
    """``dx = −λ x dt + dB``, ``Σ = q`` (sde.py:134)."""

    decay: jnp.ndarray
    q_mat: jnp.ndarray  # [1, 1]

    def drift(self, x, t=None):
        return -self.decay * x


@struct.dataclass
class DoubleWellSDE(_ScalarDriftMixin, _ConstantDiffusionSDE):
    """``f(x) = scale·x·(c − x²)`` (sde.py:179)."""

    q_mat: jnp.ndarray
    scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(4.0))
    c: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))

    def drift(self, x, t=None):
        return self.scale * x * (self.c - jnp.square(x))


@struct.dataclass
class BenesSDE(_ScalarDriftMixin, _ConstantDiffusionSDE):
    """``f(x) = θ·tanh(x)`` (sde.py:227)."""

    theta: jnp.ndarray
    q_mat: jnp.ndarray

    def drift(self, x, t=None):
        return self.theta * jnp.tanh(x)


@struct.dataclass
class SineDiffusionSDE(_ScalarDriftMixin, _ConstantDiffusionSDE):
    """``f(x) = sin(x − θ)`` (sde.py:271)."""

    theta: jnp.ndarray
    q_mat: jnp.ndarray

    def drift(self, x, t=None):
        return jnp.sin(x - self.theta)


@struct.dataclass
class SqrtDiffusionSDE(_ScalarDriftMixin, _ConstantDiffusionSDE):
    """``f(x) = √(θ|x|)`` (sde.py:315)."""

    theta: jnp.ndarray
    q_mat: jnp.ndarray

    def drift(self, x, t=None):
        return jnp.sqrt(self.theta * jnp.abs(x))


@struct.dataclass
class MLPDrift(_ConstantDiffusionSDE):
    """Two-layer MLP drift ``1 → 3 (relu) → 1`` (sde.py:359-429).

    The reference wraps a Keras model with internal host-side batching
    (:380-416); here the weights are plain pytree leaves and the forward is
    one fused einsum chain — no batching needed.
    """

    w1: jnp.ndarray  # [1, H]
    b1: jnp.ndarray  # [H]
    w2: jnp.ndarray  # [H, 1]
    b2: jnp.ndarray  # [1]
    q_mat: jnp.ndarray

    @classmethod
    def initialize(cls, key: jax.Array, q_mat: jnp.ndarray, hidden: int = 3, stddev: float = 1.0):
        k1, k2 = jax.random.split(key)
        dtype = q_mat.dtype
        return cls(
            w1=stddev * jax.random.normal(k1, (1, hidden), dtype),
            b1=jnp.zeros((hidden,), dtype),
            w2=stddev * jax.random.normal(k2, (hidden, 1), dtype),
            b2=jnp.zeros((1,), dtype),
            q_mat=q_mat,
        )

    def drift(self, x, t=None):
        h = jax.nn.relu(x @ self.w1 + self.b1)
        return h @ self.w2 + self.b2


@struct.dataclass
class VanderPolOscillatorSDE(_ConstantDiffusionSDE):
    """2-D Van der Pol oscillator (sde.py:432-518):
    ``dx₁ = τ a (x₁ − x₁³/3 − x₂)``, ``dx₂ = (τ/a) x₁``."""

    a: jnp.ndarray
    tau: jnp.ndarray
    q_mat: jnp.ndarray  # [2, 2]

    @property
    def state_dim(self) -> int:
        return 2

    def drift(self, x, t=None):
        dx1 = self.a * (x[..., 0] - x[..., 0] ** 3 / 3.0 - x[..., 1])
        dx2 = x[..., 0] / self.a
        return self.tau * jnp.stack([dx1, dx2], axis=-1)

    def drift_ch(self, xs, t=None):
        x1, x2 = xs
        return (
            self.tau * self.a * (x1 - x1**3 / 3.0 - x2),
            self.tau * x1 / self.a,
        )
