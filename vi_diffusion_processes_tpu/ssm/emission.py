"""Emission models: project latent states to observed function values.

Equivalent of markovflow/emission_model.py (EmissionModel :25,
ComposedPairEmissionModel :157, StackEmissionModel :270) — plain batched
einsums over a stacked emission matrix, vmap/jit friendly.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from ..utils.linalg import matmul_small, matvec_small, transpose_last

__all__ = ["EmissionModel", "ComposedPairEmissionModel", "StackEmissionModel"]


@struct.dataclass
class EmissionModel:
    """``f_k = H_k x_k`` with ``emission_matrix: [..., N+1, m, d]``."""

    emission_matrix: jnp.ndarray

    @property
    def output_dim(self) -> int:
        return self.emission_matrix.shape[-2]

    @property
    def state_dim(self) -> int:
        return self.emission_matrix.shape[-1]

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.emission_matrix.shape[:-3]

    def project_state_to_f(self, state: jnp.ndarray) -> jnp.ndarray:
        """``[..., N+1, d] → [..., N+1, m]``."""
        return matvec_small(self.emission_matrix, state)

    def project_state_covariance_to_f(self, covariance: jnp.ndarray, full_output_cov: bool = False):
        """``[..., N+1, d, d] → [..., N+1, m]`` (marginal variances) or
        ``[..., N+1, m, m]`` when ``full_output_cov``."""
        h = self.emission_matrix
        full = matmul_small(matmul_small(h, covariance), transpose_last(h))
        if full_output_cov:
            return full
        return jnp.diagonal(full, axis1=-2, axis2=-1)

    def project_state_marginals_to_f(self, means, covariances, full_output_cov: bool = False):
        return (
            self.project_state_to_f(means),
            self.project_state_covariance_to_f(covariances, full_output_cov),
        )


@struct.dataclass
class ComposedPairEmissionModel(EmissionModel):
    """``H = H_outer · H_inner`` (emission_model.py:157) — used by
    FactorAnalysisKernel to compose time-varying weights with a loading
    matrix.  ``emission_matrix`` holds the composed product; the inner matrix
    is kept for inner-state projections."""

    inner_emission_matrix: jnp.ndarray = None

    def project_state_to_inner(self, state: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ij,...j->...i", self.inner_emission_matrix, state)


@struct.dataclass
class StackEmissionModel(EmissionModel):
    """Stacked independent-output emission (emission_model.py:270).

    ``emission_matrix: [..., S, N+1, 1, d]`` where the leading stack axis S
    enumerates outputs; projection moves the stack axis into the output dim:
    ``[..., S, N+1, d] states → [..., N+1, S] f``.
    """

    def project_state_to_f(self, state: jnp.ndarray) -> jnp.ndarray:
        f = jnp.einsum("...ij,...j->...i", self.emission_matrix, state)  # [..., S, N+1, 1]
        return jnp.moveaxis(f[..., 0], -2, -1)

    def project_state_covariance_to_f(self, covariance: jnp.ndarray, full_output_cov: bool = False):
        h = self.emission_matrix
        full = matmul_small(matmul_small(h, covariance), transpose_last(h))  # [..., S, N+1, 1, 1]
        var = full[..., 0, 0]  # [..., S, N+1]
        var = jnp.moveaxis(var, -2, -1)  # [..., N+1, S]
        if full_output_cov:
            return var[..., None] * jnp.eye(var.shape[-1], dtype=var.dtype)
        return var
