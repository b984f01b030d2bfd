"""Mean functions (markovflow/mean_function.py equivalents).

``u(t)`` added to the latent dynamics results in an observation-space mean
``μ(t)`` that models subtract from observations and add back to predictions.
Zero (:28→:66) and Linear (:91) are closed-form; Impulse (:118) and
Step (:262) integrate state jumps through the kernel transitions.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct
from ..utils.linalg import inv_small

__all__ = ["MeanFunction", "ZeroMeanFunction", "LinearMeanFunction", "ImpulseMeanFunction", "StepMeanFunction"]


class MeanFunction:
    def __call__(self, time_points: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


@struct.dataclass
class ZeroMeanFunction(MeanFunction):
    obs_dim: int = struct.field(pytree_node=False, default=1)

    def __call__(self, time_points):
        return jnp.zeros(time_points.shape + (self.obs_dim,), dtype=time_points.dtype)


@struct.dataclass
class LinearMeanFunction(MeanFunction):
    """``m(t) = a·t`` (mean_function.py:91)."""

    coefficient: jnp.ndarray
    obs_dim: int = struct.field(pytree_node=False, default=1)

    def __call__(self, time_points):
        out = self.coefficient * time_points[..., None]
        return jnp.broadcast_to(out, time_points.shape + (self.obs_dim,))


@struct.dataclass
class ImpulseMeanFunction(MeanFunction):
    """State impulses ``u(t) = Σₖ uₖ δ(t − tₖ)`` propagated through the kernel
    dynamics (mean_function.py:118):  ``μ(t) = H Σ_{tₖ < t} A(t − tₖ) uₖ``.

    ``action_times: [K]``, ``state_perturbations: [K, d]``.
    """

    action_times: jnp.ndarray
    state_perturbations: jnp.ndarray
    kernel: object = struct.field(pytree_node=False, default=None)

    def __call__(self, time_points):
        dt = time_points[..., :, None] - self.action_times  # [..., n, K]
        active = (dt > 0).astype(time_points.dtype)
        a = self.kernel.state_transitions(
            jnp.broadcast_to(self.action_times, dt.shape), jnp.maximum(dt, 0.0)
        )  # [..., n, K, d, d]
        contrib = jnp.einsum("...kij,kj->...ki", a, self.state_perturbations)
        state_mean = jnp.sum(active[..., None] * contrib, axis=-2)  # [..., n, d]
        h = self.kernel.generate_emission_model(time_points).emission_matrix
        return jnp.einsum("...ij,...j->...i", h, state_mean)


@struct.dataclass
class StepMeanFunction(MeanFunction):
    """Piecewise-constant input ``u(t) = uₖ`` for ``t ∈ [tₖ, tₖ₊₁)``
    (mean_function.py:262).  Requires a kernel with an invertible feedback
    matrix F: between changes ``μ(t) = A(Δ)μ(tₖ) + (A(Δ) − I)F⁻¹uₖ``.

    ``action_times: [K]``, ``state_offsets: [K, d]``.
    """

    action_times: jnp.ndarray
    state_offsets: jnp.ndarray
    kernel: object = struct.field(pytree_node=False, default=None)

    def __call__(self, time_points):
        f = self.kernel.feedback_matrix
        f_inv = inv_small(f)
        d = f.shape[-1]
        k = self.action_times.shape[0]

        # state mean accumulated at each action time (sequential over K,
        # K is tiny — a python loop unrolled at trace time)
        mu_at_actions = [jnp.zeros((d,), dtype=time_points.dtype)]
        eye = jnp.eye(d, dtype=time_points.dtype)
        for i in range(1, k):
            dt = self.action_times[i] - self.action_times[i - 1]
            a = self.kernel.state_transitions(self.action_times[i - 1 : i], dt[None])[0]
            mu = a @ mu_at_actions[-1] + (a - eye) @ f_inv @ self.state_offsets[i - 1]
            mu_at_actions.append(mu)
        mu_at_actions = jnp.stack(mu_at_actions)  # [K, d]

        idx = jnp.clip(jnp.searchsorted(self.action_times, time_points, side="right") - 1, 0, k - 1)
        t_k = self.action_times[idx]
        dt = jnp.maximum(time_points - t_k, 0.0)
        a = self.kernel.state_transitions(t_k, dt)  # [..., n, d, d]
        mu0 = mu_at_actions[idx]
        u = self.state_offsets[idx]
        state_mean = jnp.einsum("...ij,...j->...i", a, mu0) + jnp.einsum(
            "...ij,...j->...i", a - eye, jnp.einsum("ij,...j->...i", f_inv, u)
        )
        before_first = (time_points < self.action_times[0])[..., None]
        state_mean = jnp.where(before_first, 0.0, state_mean)
        h = self.kernel.generate_emission_model(time_points).emission_matrix
        return jnp.einsum("...ij,...j->...i", h, state_mean)
