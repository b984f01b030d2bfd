"""SDE interface: nonlinear diffusion-process priors.

Equivalent of markovflow/sde/sde.py:24 — the ``SDE`` ABC with
autodiff drift Jacobians and Gauss–Hermite expectations.  Differences from
the reference, by design:

* ``gradient_drift`` returns the full Jacobian ``[..., d, d]`` via
  ``jax.jacrev`` + ``vmap`` (the reference special-cases d=1 tape gradients
  vs. a hand-written ``batch_jacobian`` for Van der Pol, sde.py:75-90,
  :484-518),
* expectations vectorize over arbitrary leading batch dims in one
  ``mvnquad`` call (the reference reshapes through a fixed (B, N, D)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quadrature import mvnquad

__all__ = ["SDE"]


class SDE:
    """``dx = f(x, t) dt + L(x, t) dW`` over states of dim ``d``.

    Subclasses implement :meth:`drift` and :meth:`diffusion` (the latter
    returning the Cholesky of the spectral density ``q``) and expose ``q``.
    """

    @property
    def state_dim(self) -> int:
        return 1

    def drift(self, x: jnp.ndarray, t=None) -> jnp.ndarray:
        """``f(x, t)``: ``[..., d] → [..., d]``."""
        raise NotImplementedError

    def drift_ch(self, xs, t=None):
        """Channelized drift: tuple of ``d`` arrays ``[...]`` → tuple.

        Used by the structure-of-scalars hot loops (models/cvi_dp_packed*)
        so drift evaluation fuses without materializing tile-padded
        ``[..., d]`` stacks.  Default falls back to stacking; elementwise
        SDEs override with their scalar formulas."""
        x = jnp.stack(xs, axis=-1)
        f = self.drift(x, t)
        return tuple(f[..., i] for i in range(len(xs)))

    def diffusion(self, x: jnp.ndarray, t=None) -> jnp.ndarray:
        """``L(x, t)`` (Cholesky of the diffusion covariance):
        ``[..., d] → [..., d, d]``."""
        raise NotImplementedError

    @property
    def q(self) -> jnp.ndarray:
        """Constant diffusion covariance ``[d, d]`` (all reference SDEs have
        state-independent diffusion)."""
        raise NotImplementedError

    # --- autodiff helpers -------------------------------------------------
    def gradient_drift(self, x: jnp.ndarray, t=None) -> jnp.ndarray:
        """Drift Jacobian ``∂f/∂x``: ``[..., d] → [..., d, d]``
        (sde.py:75-90)."""
        single = lambda xi: jax.jacrev(lambda z: self.drift(z, t))(xi)
        batch_shape = x.shape[:-1]
        flat = x.reshape((-1, x.shape[-1]))
        jac = jax.vmap(single)(flat)
        return jac.reshape(batch_shape + (x.shape[-1], x.shape[-1]))

    # --- Gauss–Hermite expectations (sde.py:92-131) -----------------------
    def expected_drift(self, q_mean: jnp.ndarray, q_covar: jnp.ndarray, n_points: int = 10):
        """``E_{N(m,S)}[f(x)]``: ``[..., d] → [..., d]``."""
        return mvnquad(lambda x: self.drift(x), q_mean, q_covar, n_points)

    def expected_gradient_drift(self, q_mean: jnp.ndarray, q_covar: jnp.ndarray, n_points: int = 10):
        """``E_{N(m,S)}[∂f/∂x]``: ``[..., d] → [..., d, d]``."""
        return mvnquad(lambda x: self.gradient_drift(x), q_mean, q_covar, n_points)
