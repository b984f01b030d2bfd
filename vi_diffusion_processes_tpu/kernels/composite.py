"""Piecewise-stationary, factor-analysis and stacked kernels.

Equivalents of markovflow/kernels/piecewise_stationary.py:29
(``PiecewiseKernel``), markovflow/kernels/sde_kernel.py:881
(``FactorAnalysisKernel``), :945 (``StackKernel``) and :1205
(``IndependentMultiOutputStack``).

TPU-native deviations:

* ``PiecewiseKernel`` replaces the reference's ``tf.dynamic_partition``
  dispatch (data-dependent shapes, piecewise_stationary.py:145-160) with a
  compute-all-then-select gather — static shapes, fully parallel, O(K·N)
  for K regimes (K is small).
* ``StackKernel`` realizes the stack as a leading *batch* axis of the SSM
  (vmap semantics), zero-padding child states to a common dimension with
  ``augment_square_matrix`` (sde_kernel.py:979-1201).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
from flax import struct

from ..ssm.emission import ComposedPairEmissionModel, EmissionModel, StackEmissionModel
from ..utils.shapes import augment_matrix, augment_square_matrix
from .base import ConcatKernel, IndependentMultiOutput, NonStationaryKernel, SDEKernel, StationaryKernel

__all__ = [
    "PiecewiseKernel",
    "FactorAnalysisKernel",
    "StackKernel",
    "IndependentMultiOutputStack",
]


@struct.dataclass
class PiecewiseKernel(NonStationaryKernel):
    """Different stationary dynamics on the K+1 intervals between K sorted
    change points (piecewise_stationary.py:29).  All children must share
    state/output dims (and, like the reference, should be of one family)."""

    kernels: Tuple[StationaryKernel, ...]
    change_points: jnp.ndarray  # [K]

    @property
    def state_dim(self) -> int:
        return self.kernels[0].state_dim

    @property
    def output_dim(self) -> int:
        return self.kernels[0].output_dim

    def split_time_indices(self, time_points: jnp.ndarray) -> jnp.ndarray:
        """Interval index per time point (piecewise_stationary.py:126)."""
        return jnp.searchsorted(self.change_points, time_points, side="right")

    def transition_statistics(self, transition_times, time_deltas):
        """Per-transition (A, Q) from the active regime — compute under all
        regimes, select (piecewise_stationary.py:180-228)."""
        idx = self.split_time_indices(transition_times)
        stats = [k.transition_statistics(transition_times, time_deltas) for k in self.kernels]
        a_all = jnp.stack([s[0] for s in stats])  # [K+1, ..., N, d, d]
        q_all = jnp.stack([s[1] for s in stats])
        return _gather_leading(a_all, idx), _gather_leading(q_all, idx)

    def state_transitions(self, transition_times, time_deltas):
        return self.transition_statistics(transition_times, time_deltas)[0]

    def state_offsets(self, transition_times, time_deltas):
        idx = self.split_time_indices(transition_times)
        b_all = jnp.stack(
            [k.state_offsets(transition_times, time_deltas) for k in self.kernels]
        )
        return _gather_leading(b_all, idx, vector=True)

    def steady_state_covariances(self, time_points):
        idx = self.split_time_indices(time_points)
        p_all = jnp.stack(
            [
                jnp.broadcast_to(
                    k.steady_state_covariance,
                    time_points.shape + (self.state_dim, self.state_dim),
                )
                for k in self.kernels
            ]
        )
        return _gather_leading(p_all, idx)

    def initial_mean(self, batch_shape=()):
        return self.kernels[0].initial_mean(batch_shape)

    def initial_covariance(self, initial_time_point):
        return self.steady_state_covariances(initial_time_point)[..., 0, :, :]

    def state_means(self, time_points):
        """Active regime's state mean per point (piecewise_stationary.py:273)."""
        idx = self.split_time_indices(time_points)
        m_all = jnp.stack(
            [
                jnp.broadcast_to(k._state_mean, time_points.shape + (self.state_dim,))
                for k in self.kernels
            ]
        )
        return _gather_leading(m_all, idx, vector=True)

    def generate_emission_model(self, time_points):
        idx = self.split_time_indices(time_points)
        h_all = jnp.stack(
            [k.generate_emission_model(time_points).emission_matrix for k in self.kernels]
        )
        return EmissionModel(_gather_leading(h_all, idx))


def _gather_leading(stacked: jnp.ndarray, idx: jnp.ndarray, vector: bool = False) -> jnp.ndarray:
    """``stacked: [K, ..., N, (d[, d])]``, ``idx: [..., N]`` → select kernel
    per time point."""
    moved = jnp.moveaxis(stacked, 0, -1)  # [..., N, d(, d), K]
    extra = moved.ndim - idx.ndim - 1
    sel = idx.reshape(idx.shape + (1,) * extra)
    sel = jnp.broadcast_to(sel, moved.shape[:-1])[..., None]
    return jnp.take_along_axis(moved, sel, axis=-1)[..., 0]


@struct.dataclass
class FactorAnalysisKernel(ConcatKernel):
    """``fᵢ(t) = Σⱼₖ Aᵢⱼ(t) Bⱼₖ gₖ(t)`` (sde_kernel.py:881-941): independent
    latent GPs mixed by a time-varying weight function and a trainable
    loading matrix."""

    loading_matrix: jnp.ndarray = None  # B [m, m]
    weight_function: Callable = struct.field(pytree_node=False, default=None)
    _output_dim: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, weight_function, kernels, output_dim, dtype=jnp.float64):
        latent_dim = sum(k.output_dim for k in kernels)
        return cls(
            kernels=tuple(kernels),
            loading_matrix=jnp.eye(latent_dim, dtype=dtype),
            weight_function=weight_function,
            _output_dim=output_dim,
        )

    @property
    def output_dim(self) -> int:
        return self._output_dim

    def generate_emission_model(self, time_points):
        latent = IndependentMultiOutput(kernels=self.kernels)
        inner = latent.generate_emission_model(time_points).emission_matrix
        w = self.weight_function(time_points) @ self.loading_matrix
        return ComposedPairEmissionModel(
            emission_matrix=w @ inner, inner_emission_matrix=inner
        )


@struct.dataclass
class StackKernel(StationaryKernel):
    """Stack child kernels along a leading batch axis with zero-padded
    states (sde_kernel.py:945-1201).  The generated SSM has batch shape
    ``[..., S]`` (one independent chain per output)."""

    kernels: Tuple[SDEKernel, ...]

    @property
    def num_kernels(self) -> int:
        return len(self.kernels)

    @property
    def state_dim(self) -> int:
        return max(k.state_dim for k in self.kernels)

    @property
    def output_dim(self) -> int:
        return len(self.kernels)

    def _pad(self, mat, k):
        return augment_square_matrix(mat, self.state_dim - k.state_dim)

    def _pad_zero(self, mat, k):
        return augment_square_matrix(mat, self.state_dim - k.state_dim, fill_zeros=True)

    def _expand_times(self, time_points):
        """The stack introduces a batch axis just before the time axis
        (sde_kernel.py:979-1040)."""
        return time_points[..., None, :]

    def initial_mean(self, batch_shape=()):
        means = [
            jnp.pad(k.initial_mean(batch_shape), [(0, 0)] * len(batch_shape) + [(0, self.state_dim - k.state_dim)])
            for k in self.kernels
        ]
        return jnp.stack(means, axis=-2)  # batch_shape + [S, d]

    def initial_covariance(self, initial_time_point):
        covs = [
            self._pad(k.initial_covariance(initial_time_point), k) for k in self.kernels
        ]
        return jnp.stack(covs, axis=-3)

    @property
    def steady_state_covariance(self):
        return jnp.stack(
            [self._pad(k.steady_state_covariance, k) for k in self.kernels], axis=-3
        )

    @property
    def feedback_matrix(self):
        return jnp.stack(
            [self._pad_zero(k.feedback_matrix, k) for k in self.kernels], axis=-3
        )

    def state_transitions(self, transition_times, time_deltas):
        # time args are shared across the stack
        return jnp.stack(
            [self._pad(k.state_transitions(transition_times, time_deltas), k) for k in self.kernels],
            axis=-4,
        )

    def transition_statistics(self, transition_times, time_deltas):
        stats = [k.transition_statistics(transition_times, time_deltas) for k in self.kernels]
        a_s = jnp.stack([self._pad(a, k) for (a, _), k in zip(stats, self.kernels)], axis=-4)
        q_s = jnp.stack([self._pad_zero(q, k) for (_, q), k in zip(stats, self.kernels)], axis=-4)
        return a_s, q_s

    def state_offsets(self, transition_times, time_deltas):
        offs = [
            augment_matrix(k.state_offsets(transition_times, time_deltas), self.state_dim - k.state_dim)
            for k in self.kernels
        ]
        return jnp.stack(offs, axis=-3)

    def state_space_model(self, time_points):
        """Stack axis becomes an SSM batch dim (children share the grid)."""
        from ..config import default_jitter
        from ..ssm.state_space_model import ssm_from_covariances
        from ..utils.shapes import to_delta_time

        dts = to_delta_time(time_points)
        a_s, q_s = self.transition_statistics(time_points[..., :-1], dts)
        batch_shape = time_points.shape[:-1]
        return ssm_from_covariances(
            initial_mean=self.initial_mean(batch_shape).astype(time_points.dtype),
            initial_covariance=self.initial_covariance(time_points[..., 0:1]),
            state_transitions=a_s,
            state_offsets=self.state_offsets(time_points[..., :-1], dts),
            process_covariances=q_s,
            jitter=default_jitter(),
        )

    def generate_emission_model(self, time_points):
        hs = []
        for k in self.kernels:
            h = k.generate_emission_model(time_points).emission_matrix  # [..., N, 1, dk]
            hs.append(augment_matrix(h, self.state_dim - k.state_dim))
        return StackEmissionModel(jnp.stack(hs, axis=-4))  # [..., S, N, 1, d]


@struct.dataclass
class IndependentMultiOutputStack(StackKernel):
    """Stacked independent multi-output kernel (sde_kernel.py:1205-1276):
    elementwise ``+``/``*`` combine the children pairwise."""

    def __add__(self, other):
        assert isinstance(other, StackKernel) and other.num_kernels == self.num_kernels
        from .base import Sum

        return IndependentMultiOutputStack(
            kernels=tuple(Sum(kernels=(a, b)) for a, b in zip(self.kernels, other.kernels))
        )

    def __mul__(self, other):
        assert isinstance(other, StackKernel) and other.num_kernels == self.num_kernels
        from .base import Product

        return IndependentMultiOutputStack(
            kernels=tuple(Product(kernels=(a, b)) for a, b in zip(self.kernels, other.kernels))
        )
