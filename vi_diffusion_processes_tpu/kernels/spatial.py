"""Spatial (non-Markovian) kernels for the spatio-temporal models.

The reference uses gpflow kernels for the spatial factor
(spatio_temporal_variational.py:45); these are the in-library equivalents:
plain Gram-matrix kernels over ℝᴰ.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

__all__ = ["SpatialRBF", "SpatialMatern12", "SpatialMatern32"]


def _sq_dists(x1, x2, lengthscale):
    a = x1 / lengthscale
    b = x2 / lengthscale
    d2 = (
        jnp.sum(a**2, -1)[..., :, None]
        - 2.0 * a @ jnp.swapaxes(b, -1, -2)
        + jnp.sum(b**2, -1)[..., None, :]
    )
    return jnp.maximum(d2, 0.0)


class _SpatialKernel:
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray = None, full_cov: bool = True):
        if x2 is None and not full_cov:
            return jnp.broadcast_to(self.variance, x1.shape[:-1])
        x2 = x1 if x2 is None else x2
        return self._gram(x1, x2)


@struct.dataclass
class SpatialRBF(_SpatialKernel):
    """Squared-exponential: ``σ² exp(−‖x−x'‖²/2ℓ²)``."""

    variance: jnp.ndarray
    lengthscale: jnp.ndarray

    def _gram(self, x1, x2):
        return self.variance * jnp.exp(-0.5 * _sq_dists(x1, x2, self.lengthscale))


@struct.dataclass
class SpatialMatern12(_SpatialKernel):
    variance: jnp.ndarray
    lengthscale: jnp.ndarray

    def _gram(self, x1, x2):
        r = jnp.sqrt(_sq_dists(x1, x2, self.lengthscale) + 1e-36)
        return self.variance * jnp.exp(-r)


@struct.dataclass
class SpatialMatern32(_SpatialKernel):
    variance: jnp.ndarray
    lengthscale: jnp.ndarray

    def _gram(self, x1, x2):
        r = jnp.sqrt(3.0 * _sq_dists(x1, x2, self.lengthscale) + 1e-36)
        return self.variance * (1.0 + r) * jnp.exp(-r)
