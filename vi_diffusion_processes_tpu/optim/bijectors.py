"""Parameter constraints for unconstrained optimization.

Equivalents of the reference's gpflow ``positive()`` transform and the
``ordered()`` bijector that keeps inducing points sorted
(markovflow/base.py:27-38).  Models store *constrained* values; trainers
that want unconstrained optimization map through these pairs.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["positive", "positive_inverse", "ordered", "ordered_inverse"]

_SHIFT = 1e-6


def positive(unconstrained: jnp.ndarray) -> jnp.ndarray:
    """softplus + shift (gpflow's default positive transform)."""
    return jnp.logaddexp(unconstrained, 0.0) + _SHIFT


def positive_inverse(value: jnp.ndarray) -> jnp.ndarray:
    x = jnp.maximum(value - _SHIFT, 1e-300)
    return x + jnp.log(-jnp.expm1(-x))


def ordered(unconstrained: jnp.ndarray) -> jnp.ndarray:
    """First element free, increments softplus-positive → strictly sorted
    output (markovflow/base.py:27 ``ordered()``)."""
    first = unconstrained[..., :1]
    increments = jnp.logaddexp(unconstrained[..., 1:], 0.0) + _SHIFT
    return jnp.concatenate([first, first + jnp.cumsum(increments, axis=-1)], axis=-1)


def ordered_inverse(value: jnp.ndarray) -> jnp.ndarray:
    first = value[..., :1]
    increments = jnp.diff(value, axis=-1)
    return jnp.concatenate([first, positive_inverse(increments)], axis=-1)
