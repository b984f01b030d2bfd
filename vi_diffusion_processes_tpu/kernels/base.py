"""Kernel framework: SDE priors in linear time-invariant state-space form.

Equivalent of markovflow/kernels/kernel.py:27 and
markovflow/kernels/sde_kernel.py (SDEKernel :43, StationaryKernel :353,
NonStationaryKernel :499, ConcatKernel :540, Sum :660, Product :691,
IndependentMultiOutput :826) — redesigned as JAX pytrees:

* every kernel is a ``flax.struct.dataclass`` whose array fields are the
  trainable hyperparameters (differentiable through every method),
* ``state_space_model(time_points)`` builds the prior
  :class:`~..ssm.state_space_model.StateSpaceModel` with batched einsums
  (no per-time-point python loops — everything vectorized over the grid),
* transition matrices use closed forms (nilpotent matrix exponentials for
  the Matern family) — no generic ``expm`` except where unavoidable (LEG).

Base classes carry only methods, so ``flax.struct.dataclass`` leaves stay
clean pytrees.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from ..config import default_jitter
from ..ssm.emission import EmissionModel
from ..ssm.state_space_model import StateSpaceModel, ssm_from_covariances
from ..utils.linalg import block_diag, kron, matmul_small, transpose_last
from ..utils.shapes import to_delta_time

__all__ = [
    "Kernel",
    "SDEKernel",
    "StationaryKernel",
    "NonStationaryKernel",
    "ConcatKernel",
    "Sum",
    "Product",
    "IndependentMultiOutput",
]


class Kernel:
    """Abstract base: builds a finite-dimensional distribution + emission
    (markovflow/kernels/kernel.py:27)."""

    @property
    def output_dim(self) -> int:
        return 1

    def build_finite_distribution(self, time_points: jnp.ndarray) -> StateSpaceModel:
        raise NotImplementedError

    def generate_emission_model(self, time_points: jnp.ndarray) -> EmissionModel:
        raise NotImplementedError


class SDEKernel(Kernel):
    """A kernel with an underlying SDE in LTI form (sde_kernel.py:43)."""

    # --- abstract -------------------------------------------------------
    @property
    def state_dim(self) -> int:
        raise NotImplementedError

    def transition_statistics(
        self, transition_times: jnp.ndarray, time_deltas: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``(A_k, Q_k)`` for each transition; shapes ``[..., N, d, d]``."""
        raise NotImplementedError

    def initial_mean(self, batch_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        raise NotImplementedError

    def initial_covariance(self, initial_time_point: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def state_offsets(
        self, transition_times: jnp.ndarray, time_deltas: jnp.ndarray
    ) -> jnp.ndarray:
        raise NotImplementedError

    # --- concrete -------------------------------------------------------
    @property
    def jitter(self) -> float:
        return 0.0

    def jitter_matrix(self, dtype) -> jnp.ndarray:
        return (self.jitter + default_jitter()) * jnp.eye(self.state_dim, dtype=dtype)

    def state_transitions(self, transition_times, time_deltas):
        return self.transition_statistics(transition_times, time_deltas)[0]

    def process_covariances(self, transition_times, time_deltas):
        return self.transition_statistics(transition_times, time_deltas)[1]

    def transition_statistics_from_time_points(self, time_points: jnp.ndarray):
        return self.transition_statistics(time_points[..., :-1], to_delta_time(time_points))

    def state_space_model(self, time_points: jnp.ndarray) -> StateSpaceModel:
        """Build the prior SSM on a grid (sde_kernel.py:153-171).

        Non-zero process covariances get the kernel jitter on the diagonal
        (sde_kernel.py:122-131) — tiny Δt makes ``P∞ − A P∞ Aᵀ``
        numerically indefinite otherwise; exactly-zero blocks
        (deterministic kernels) stay zero.
        """
        from ..config import default_jitter

        batch_shape = time_points.shape[:-1]
        a_s, q_s = self.transition_statistics_from_time_points(time_points)
        d = self.state_dim
        init_cov = jnp.broadcast_to(
            self.initial_covariance(time_points[..., 0:1]), batch_shape + (d, d)
        )
        return ssm_from_covariances(
            initial_mean=self.initial_mean(batch_shape).astype(time_points.dtype),
            initial_covariance=init_cov,
            state_transitions=a_s,
            state_offsets=self.state_offsets(time_points[..., :-1], to_delta_time(time_points)),
            process_covariances=q_s,
            jitter=self.jitter + default_jitter(),
        )

    def build_finite_distribution(self, time_points: jnp.ndarray) -> StateSpaceModel:
        return self.state_space_model(time_points)

    def generate_emission_model(self, time_points: jnp.ndarray) -> EmissionModel:
        """Default emission ``H = [1, 0, …, 0]`` per output
        (sde_kernel.py:173-211)."""
        dtype = time_points.dtype
        h = jnp.zeros((self.output_dim, self.state_dim), dtype).at[:, 0].set(1.0)
        shape = time_points.shape + (self.output_dim, self.state_dim)
        return EmissionModel(jnp.broadcast_to(h, shape))

    def __add__(self, other: "SDEKernel") -> "Sum":
        return Sum(kernels=(self, other))

    def __mul__(self, other: "SDEKernel") -> "Product":
        return Product(kernels=(self, other))


class StationaryKernel(SDEKernel):
    """Kernels of stationary processes (sde_kernel.py:353).

    Concrete subclasses implement ``feedback_matrix``-driven
    ``state_transitions`` and ``steady_state_covariance``; this base supplies
    ``Q_k = P∞ − A_k P∞ A_kᵀ``, a (possibly trainable) ``state_mean``, and
    the matching offsets ``b_k = (I − A_k) m̄``.

    Subclasses may define a ``state_mean`` field; if absent the mean is zero.
    """

    @property
    def _state_mean(self) -> jnp.ndarray:
        sm = getattr(self, "state_mean", None)
        if sm is None:
            return jnp.zeros((self.state_dim,))
        return sm

    def initial_mean(self, batch_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        return jnp.broadcast_to(self._state_mean, batch_shape + (self.state_dim,))

    def initial_covariance(self, initial_time_point: jnp.ndarray) -> jnp.ndarray:
        p_inf = self.steady_state_covariance.astype(initial_time_point.dtype)
        return p_inf + self.jitter_matrix(initial_time_point.dtype)

    @property
    def steady_state_covariance(self) -> jnp.ndarray:
        raise NotImplementedError

    @property
    def feedback_matrix(self) -> jnp.ndarray:
        """``F`` in ``dx = F x dt + L dW`` (sde_kernel.py:448)."""
        raise NotImplementedError

    def state_transitions(self, transition_times, time_deltas) -> jnp.ndarray:
        raise NotImplementedError

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(transition_times, time_deltas)
        p_inf = self.steady_state_covariance.astype(a_s.dtype)
        q_s = p_inf - matmul_small(matmul_small(a_s, p_inf), transpose_last(a_s))
        return a_s, q_s

    def state_offsets(self, transition_times, time_deltas) -> jnp.ndarray:
        """``b_k = m̄ − A_k m̄`` keeps the marginal mean at ``m̄``
        (sde_kernel.py:460)."""
        a_s = self.state_transitions(transition_times, time_deltas)
        mean = jnp.broadcast_to(
            jnp.asarray(self._state_mean, a_s.dtype), a_s.shape[:-2] + (self.state_dim,)
        )
        return mean - jnp.einsum("...ij,...j->...i", a_s, mean)


class NonStationaryKernel(SDEKernel):
    """Kernels whose feedback matrix varies with time (sde_kernel.py:499)."""

    def feedback_matrices(self, time_points: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


# --------------------------------------------------------------- combinators
@struct.dataclass
class ConcatKernel(StationaryKernel):
    """Block-diagonal concatenation of child state spaces
    (sde_kernel.py:540-656).  Base for :class:`Sum` and
    :class:`IndependentMultiOutput`."""

    kernels: Tuple[SDEKernel, ...]

    @property
    def state_dim(self) -> int:
        return sum(k.state_dim for k in self.kernels)

    @property
    def output_dim(self) -> int:
        return self.kernels[0].output_dim

    def initial_mean(self, batch_shape=()):
        return jnp.concatenate([k.initial_mean(batch_shape) for k in self.kernels], axis=-1)

    def initial_covariance(self, initial_time_point):
        return block_diag([k.initial_covariance(initial_time_point) for k in self.kernels])

    @property
    def steady_state_covariance(self):
        return block_diag([k.steady_state_covariance for k in self.kernels])

    @property
    def feedback_matrix(self):
        return block_diag([k.feedback_matrix for k in self.kernels])

    def state_transitions(self, transition_times, time_deltas):
        return block_diag(
            [k.state_transitions(transition_times, time_deltas) for k in self.kernels]
        )

    def transition_statistics(self, transition_times, time_deltas):
        stats = [k.transition_statistics(transition_times, time_deltas) for k in self.kernels]
        return block_diag([s[0] for s in stats]), block_diag([s[1] for s in stats])

    def state_offsets(self, transition_times, time_deltas):
        return jnp.concatenate(
            [k.state_offsets(transition_times, time_deltas) for k in self.kernels], axis=-1
        )


@struct.dataclass
class Sum(ConcatKernel):
    """``k = Σᵢ kᵢ``: concatenated states, summed emission
    (sde_kernel.py:660-688)."""

    def generate_emission_model(self, time_points):
        hs = [k.generate_emission_model(time_points).emission_matrix for k in self.kernels]
        return EmissionModel(jnp.concatenate(hs, axis=-1))


@struct.dataclass
class IndependentMultiOutput(ConcatKernel):
    """One independent latent process per output (sde_kernel.py:826-877)."""

    @property
    def output_dim(self) -> int:
        return sum(k.output_dim for k in self.kernels)

    def generate_emission_model(self, time_points):
        hs = [k.generate_emission_model(time_points).emission_matrix for k in self.kernels]
        return EmissionModel(block_diag(hs))


@struct.dataclass
class Product(StationaryKernel):
    """``k = Πᵢ kᵢ`` via Kronecker-product state spaces
    (sde_kernel.py:691-822)."""

    kernels: Tuple[SDEKernel, ...]

    @property
    def state_dim(self) -> int:
        out = 1
        for k in self.kernels:
            out *= k.state_dim
        return out

    @property
    def output_dim(self) -> int:
        return self.kernels[0].output_dim

    def initial_mean(self, batch_shape=()):
        out = self.kernels[0].initial_mean(batch_shape)
        for k in self.kernels[1:]:
            out = (out[..., :, None] * k.initial_mean(batch_shape)[..., None, :]).reshape(
                batch_shape + (-1,)
            )
        return out

    @property
    def steady_state_covariance(self):
        out = self.kernels[0].steady_state_covariance
        for k in self.kernels[1:]:
            out = kron(out, k.steady_state_covariance)
        return out

    def initial_covariance(self, initial_time_point):
        out = self.kernels[0].initial_covariance(initial_time_point)
        for k in self.kernels[1:]:
            out = kron(out, k.initial_covariance(initial_time_point))
        return out

    def state_transitions(self, transition_times, time_deltas):
        out = self.kernels[0].state_transitions(transition_times, time_deltas)
        for k in self.kernels[1:]:
            out = kron(out, k.state_transitions(transition_times, time_deltas))
        return out

    def transition_statistics(self, transition_times, time_deltas):
        a_s = self.state_transitions(transition_times, time_deltas)
        p_inf = self.steady_state_covariance.astype(a_s.dtype)
        q_s = p_inf - matmul_small(matmul_small(a_s, p_inf), transpose_last(a_s))
        return a_s, q_s

    def state_offsets(self, transition_times, time_deltas):
        shape = time_deltas.shape + (self.state_dim,)
        return jnp.zeros(shape, dtype=time_deltas.dtype)

    def generate_emission_model(self, time_points):
        h = self.kernels[0].generate_emission_model(time_points).emission_matrix
        for k in self.kernels[1:]:
            h = kron(h, k.generate_emission_model(time_points).emission_matrix)
        return EmissionModel(h)
