"""Spatio-temporal sparse variational models (space × time factor kernels).

Equivalent of markovflow/models/spatio_temporal_variational.py
(``SpatioTemporalBase`` :109, ``SpatioTemporalSparseVariational`` :270,
``SpatioTemporalSparseCVI`` :360): ``k((s,t),(s',t')) = kₛ(s,s')·kₜ(t,t')``
with a Markovian temporal factor.  Inputs follow the reference convention:
``X: [n, space_dim + 1]`` with the time coordinate LAST.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..kernels.spatio_temporal import SparseSpatioTemporalKernel
from ..ssm.conditionals import conditional_statistics
from ..ssm.state_space_model import StateSpaceModel
from ..ssm.transforms import naturals_to_ssm
from ..utils.linalg import chol_psd, matmul_small, transpose_last, tri_solve
from .posterior import ConditionalProcess

__all__ = [
    "batch_base_conditional",
    "SpatioTemporalSparseVariational",
    "SpatioTemporalSparseCVI",
]


def batch_base_conditional(kmn, kmm, knn, f, q_sqrt=None):
    """Whitened GP conditional per datum (markovflow/utils.py:159-257).

    ``kmn: [M, N]``, ``kmm: [M, M]``, ``knn: [N]``, ``f: [M, N]``,
    ``q_sqrt: [N, M, M]`` (lower) → per-datum ``(mean [N], var [N])`` of
    ``q(g1_n) = ∫ q_n(g2) p(g1_n|g2) dg2``.
    """
    lm = chol_psd(kmm)
    a = tri_solve(lm, kmn)  # Lm⁻¹ Kmn, [M, N]
    var = knn - jnp.sum(a**2, axis=-2)
    # mean: aᵀ Lm⁻¹ f per column
    mean = jnp.sum(a * tri_solve(lm, f), axis=-2)
    if q_sqrt is not None:
        # var += ‖q_sqrt_nᵀ (Lm⁻ᵀ a_n)‖² per datum n
        b = tri_solve(lm, a, transpose=True)  # Kmm⁻¹ Kmn, [M, N]
        b_n = jnp.moveaxis(b, -1, 0)[..., None]  # [N, M, 1]
        sq = matmul_small(transpose_last(q_sqrt), b_n)  # [N, M, 1]
        var = var + jnp.sum(sq[..., 0] ** 2, axis=-1)
    return mean, var


class _SpatioTemporalMixin:
    """Shared prediction/ELBO machinery (SpatioTemporalBase :109)."""

    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.inducing_time)

    @property
    def posterior(self) -> ConditionalProcess:
        return ConditionalProcess(
            dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.inducing_time,
        )

    def space_time_predict_f(self, inputs):
        """Marginal f at space-time points
        (spatio_temporal_variational.py:149-180)."""
        x, t = inputs[..., :-1], inputs[..., -1]
        mean_u, cov_u = self.posterior.predict_f(t, full_output_cov=True)
        chol_cov_u = chol_psd(
            cov_u + 1e-10 * jnp.eye(cov_u.shape[-1], dtype=cov_u.dtype)
        )
        ks = self.kernel.kernel_space
        kmn = ks(self.kernel.inducing_space, x)  # [Ms, N]
        kmm = ks(self.kernel.inducing_space)
        knn = ks(x, full_cov=False)
        mean_f, var_f = batch_base_conditional(
            kmn, kmm, knn, jnp.swapaxes(mean_u, -1, -2), q_sqrt=chol_cov_u
        )
        mean_f, var_f = mean_f[..., None], var_f[..., None]
        if self.mean_function is not None:
            mean_f = mean_f + self.mean_function(t)
        return mean_f, var_f

    def elbo(self, input_data) -> jnp.ndarray:
        x, y = input_data
        f_mu, f_var = self.space_time_predict_f(x)
        ve = jnp.sum(self.likelihood.variational_expectations(f_mu, f_var, y))
        kl = jnp.sum(self.dist_q.kl_divergence(self.dist_p))
        scale = 1.0 if self.num_data is None else self.num_data / x.shape[0]
        return ve * scale - kl

    def loss(self, input_data) -> jnp.ndarray:
        return -self.elbo(input_data)

    def predict_log_density(self, input_data) -> jnp.ndarray:
        x, y = input_data
        f_mu, f_var = self.space_time_predict_f(x)
        return self.likelihood.predict_density(f_mu, f_var, y)


@struct.dataclass
class SpatioTemporalSparseVariational(_SpatioTemporalMixin):
    """Free-form trainable q over the stacked inducing-state chain
    (spatio_temporal_variational.py:270-357)."""

    kernel: SparseSpatioTemporalKernel
    likelihood: object
    inducing_time: jnp.ndarray
    dist_q: StateSpaceModel
    mean_function: Optional[object] = None
    num_data: Optional[int] = struct.field(pytree_node=False, default=None)

    @classmethod
    def initialize(
        cls, inducing_space, inducing_time, kernel_space, kernel_time, likelihood,
        mean_function=None, num_data=None,
    ):
        kernel = SparseSpatioTemporalKernel.build(kernel_space, kernel_time, inducing_space)
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            inducing_time=inducing_time,
            dist_q=kernel.state_space_model(inducing_time),
            mean_function=mean_function,
            num_data=num_data,
        )


@struct.dataclass
class SpatioTemporalSparseCVI(_SpatioTemporalMixin):
    """CVI parameterization: pair sites on consecutive stacked inducing
    states (spatio_temporal_variational.py:360-586)."""

    kernel: SparseSpatioTemporalKernel
    likelihood: object
    inducing_time: jnp.ndarray
    nat1: jnp.ndarray  # [Mt+1, 2d]
    nat2: jnp.ndarray  # [Mt+1, 2d, 2d]
    mean_function: Optional[object] = None
    num_data: Optional[int] = struct.field(pytree_node=False, default=None)
    learning_rate: float = struct.field(pytree_node=False, default=0.1)

    @classmethod
    def initialize(
        cls, inducing_space, inducing_time, kernel_space, kernel_time, likelihood,
        mean_function=None, num_data=None, learning_rate=0.1,
    ):
        kernel = SparseSpatioTemporalKernel.build(kernel_space, kernel_time, inducing_space)
        mt = inducing_time.shape[0]
        d = kernel.state_dim
        dtype = inducing_time.dtype
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            inducing_time=inducing_time,
            nat1=jnp.zeros((mt + 1, 2 * d), dtype),
            nat2=jnp.zeros((mt + 1, 2 * d, 2 * d), dtype),
            mean_function=mean_function,
            num_data=num_data,
            learning_rate=learning_rate,
        )

    @property
    def dist_q(self) -> StateSpaceModel:
        """(spatio_temporal_variational.py:447-476, SparseCVI algebra)."""
        d = self.kernel.state_dim
        prec = self.dist_p.precision()
        nat1_diag = self.nat1[1:, :d] + self.nat1[:-1, d:]
        nat2_diag = self.nat2[1:, :d, :d] + self.nat2[:-1, d:, d:]
        nat2_sub = self.nat2[1:-1, d:, :d]
        theta_diag = -0.5 * prec.diag + nat2_diag
        theta_sub = -prec.sub + 2.0 * nat2_sub
        return naturals_to_ssm(nat1_diag, theta_diag, theta_sub)

    def projection_inducing_states_to_observations(self, inputs):
        """``P_full = A_space · P_time``
        (spatio_temporal_variational.py:479-507)."""
        t = inputs[..., -1]
        p, _, _ = conditional_statistics(t, self.inducing_time, self.kernel)
        a = self.kernel.state_to_space_conditional_projection(inputs)  # [n, 1, d]
        return jnp.einsum("ncs,nfc->nfs", p, a)

    def update_sites(self, input_data) -> "SpatioTemporalSparseCVI":
        """(spatio_temporal_variational.py:509-553)."""
        inputs, observations = input_data
        t = inputs[..., -1]
        f_mu, f_var = self.space_time_predict_f(inputs)

        def ve_of_eta(eta1, eta2):
            return jnp.sum(
                self.likelihood.variational_expectations(eta1, eta2 - eta1**2, observations)
            )

        _, (g1, g2) = jax.value_and_grad(ve_of_eta, argnums=(0, 1))(f_mu, f_var + f_mu**2)

        proj = self.projection_inducing_states_to_observations(input_data[0])
        theta1 = jnp.einsum("nij,ni->nj", proj, g1)
        theta2 = jnp.einsum("ni,nij,nik->njk", g2, proj, proj)

        mt = self.inducing_time.shape[0]
        idx = jnp.searchsorted(self.inducing_time, t)
        summed1 = jax.ops.segment_sum(theta1, idx, num_segments=mt + 1)
        summed2 = jax.ops.segment_sum(theta2, idx, num_segments=mt + 1)
        lr = self.learning_rate
        return self.replace(
            nat1=(1.0 - lr) * self.nat1 + lr * summed1,
            nat2=(1.0 - lr) * self.nat2 + lr * summed2,
        )
