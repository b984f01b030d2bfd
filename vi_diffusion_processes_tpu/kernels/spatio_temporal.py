"""Spatio-temporal factor kernel: spatial Gram × Markovian temporal kernel.

Equivalent of ``SparseSpatioTemporalKernel``
(markovflow/models/spatio_temporal_variational.py:45): one independent
temporal chain per spatial inducing point, emission pre-multiplied by
``chol Kₛ(Zₛ, Zₛ)``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..ssm.emission import EmissionModel
from ..utils.linalg import tri_solve
from .base import IndependentMultiOutput

__all__ = ["SparseSpatioTemporalKernel"]


@struct.dataclass
class SparseSpatioTemporalKernel(IndependentMultiOutput):
    """``f(Zₛ, t) = chol(Kₛ(Zₛ,Zₛ)) [H s₁(t), …, H s_M(t)]``."""

    kernel_space: object = None
    inducing_space: jnp.ndarray = None

    @classmethod
    def build(cls, kernel_space, kernel_time, inducing_space):
        m = inducing_space.shape[-2]
        return cls(
            kernels=tuple(kernel_time for _ in range(m)),
            kernel_space=kernel_space,
            inducing_space=inducing_space,
        )

    @property
    def kernel_time(self):
        return self.kernels[0]

    def generate_emission_model(self, time_points) -> EmissionModel:
        """``chol(Kₛ) @ blockdiag(H…H)``
        (spatio_temporal_variational.py:72-85)."""
        h = super().generate_emission_model(time_points).emission_matrix
        l = jnp.linalg.cholesky(self.kernel_space(self.inducing_space))
        return EmissionModel(emission_matrix=l @ h)

    def state_to_space_conditional_projection(self, inputs) -> jnp.ndarray:
        """``E[f(x,t)|s(t)] = Kₛ(x,Zₛ) chol(Kₛ)⁻ᵀ [H…H] s(t)``
        (spatio_temporal_variational.py:87-106)."""
        space_points, time_points = inputs[..., :-1], inputs[..., -1]
        h = super().generate_emission_model(time_points).emission_matrix  # [n, Ms, d]
        chol_kmm = jnp.linalg.cholesky(self.kernel_space(self.inducing_space))
        c = tri_solve(chol_kmm, h, transpose=True)  # [n, Ms, d]
        knm = self.kernel_space(space_points, self.inducing_space)  # [n, Ms]
        return jnp.sum(knm[..., None] * c, axis=-2, keepdims=True)  # [n, 1, d]
