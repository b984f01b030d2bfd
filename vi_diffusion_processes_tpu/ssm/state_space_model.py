"""State-space representation of a Gauss–Markov chain — TPU-native core.

Equivalent of the reference's ``markovflow/state_space_model.py:35`` but
designed around JAX/XLA rather than banded C++ ops:

* the model is a pytree (``flax.struct.dataclass``) of five parameter arrays,
* marginal means/covariances and joint sampling are computed by a **parallel
  associative scan** over affine-Gaussian composition elements
  (O(log N) depth on TPU) instead of banded solves + Takahashi sparse
  inverses (``state_space_model.py:232-262``) — mathematically identical,
* the log-determinant, log-pdf and KL divergence use the Markov
  factorization in closed form instead of block-tridiagonal traces
  (``state_space_model.py:515-595``), again numerically identical.

The joint density over states ``x₀ … x_N`` is

    ``p(x) = N(x₀; μ₀, P₀) Π_k N(x_{k+1}; A_k x_k + b_k, Q_k)``

with block-tridiagonal precision ``K = A⁻ᵀ Q⁻¹ A⁻¹`` (SpInGP,
state_space_model.py:52-61); ``precision()`` materializes it as a
:class:`~..ops.btd.BTD` when natural-parameter algebra needs it.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ..ops.btd import BTD
from ..utils.linalg import (
    chol_psd,
    cho_solve,
    gaussian_kl,
    matmul_small,
    matvec_small,
    mvn_logpdf,
    transpose_last,
    tri_solve,
)

__all__ = ["StateSpaceModel", "ssm_from_covariances"]


def _affine_gaussian_compose(e1, e2):
    """Compose two affine-Gaussian maps (elementwise over leading axes).

    ``e = (A, b, Q)`` represents ``x_out = A x_in + b + ε, ε ~ N(0, Q)``;
    composition applies ``e1`` first, then ``e2``.  Associative.
    """
    a1, b1, q1 = e1
    a2, b2, q2 = e2
    a = a2 @ a1
    b = jnp.einsum("...ij,...j->...i", a2, b1) + b2
    q = a2 @ q1 @ transpose_last(a2) + q2
    return a, b, q


@struct.dataclass
class StateSpaceModel:
    """Linear time-varying Gauss–Markov chain over ``N+1`` states of dim ``d``.

    Shapes (arbitrary leading batch dims ``...``):

    * ``initial_mean``: ``[..., d]``
    * ``chol_initial_covariance``: ``[..., d, d]`` (lower)
    * ``state_transitions``: ``[..., N, d, d]``  (``A_k``: state k → k+1)
    * ``state_offsets``: ``[..., N, d]``  (``b_k``)
    * ``chol_process_covariances``: ``[..., N, d, d]`` (lower, ``chol Q_k``)
    """

    initial_mean: jnp.ndarray
    chol_initial_covariance: jnp.ndarray
    state_transitions: jnp.ndarray
    state_offsets: jnp.ndarray
    chol_process_covariances: jnp.ndarray

    # ------------------------------------------------------------------ shape
    @property
    def state_dim(self) -> int:
        return self.initial_mean.shape[-1]

    @property
    def num_transitions(self) -> int:
        return self.state_transitions.shape[-3]

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.initial_mean.shape[:-1]

    @property
    def event_shape(self) -> Tuple[int, int]:
        return (self.num_transitions + 1, self.state_dim)

    @property
    def initial_covariance(self) -> jnp.ndarray:
        l = self.chol_initial_covariance
        return l @ transpose_last(l)

    @property
    def process_covariances(self) -> jnp.ndarray:
        l = self.chol_process_covariances
        return matmul_small(l, transpose_last(l))

    @property
    def concatenated_cholesky_process_covariance(self) -> jnp.ndarray:
        """``[..., N+1, d, d]``: chol P₀ prepended to chol Q₁..Q_N
        (state_space_model.py:124 equivalent)."""
        return jnp.concatenate(
            [self.chol_initial_covariance[..., None, :, :], self.chol_process_covariances],
            axis=-3,
        )

    @property
    def concatenated_state_offsets(self) -> jnp.ndarray:
        """``[..., N+1, d]``: μ₀ treated as the offset of state 0."""
        return jnp.concatenate(
            [self.initial_mean[..., None, :], self.state_offsets], axis=-2
        )

    # -------------------------------------------------------------- marginals
    def _cumulative_elements(self):
        """Associative scan of (A, b, Q) over time (time axis moved to 0).

        d == 1 uses a scalar-channel composition (pure VPU elementwise ops —
        batched 1×1 matmuls are slow on TPU)."""
        if self.state_dim == 1:
            a_t = jnp.moveaxis(self.state_transitions[..., 0, 0], -1, 0)
            b_t = jnp.moveaxis(self.state_offsets[..., 0], -1, 0)
            q_t = jnp.moveaxis(self.process_covariances[..., 0, 0], -1, 0)

            def compose_s(e1, e2):
                a1, b1, q1 = e1
                a2, b2, q2 = e2
                return a2 * a1, a2 * b1 + b2, a2 * q1 * a2 + q2

            if a_t.ndim == 1 and a_t.shape[0] >= 4096:
                # blocked slice-free layout for long unbatched grids
                # (ops/blocked_scan.py)
                from ..ops.blocked_scan import blocked_assoc_scan

                ca, cb, cq = blocked_assoc_scan(
                    compose_s, (a_t, b_t, q_t), identity=(1.0, 0.0, 0.0)
                )
            else:
                ca, cb, cq = lax.associative_scan(compose_s, (a_t, b_t, q_t))
            return ca[..., None, None], cb[..., None], cq[..., None, None]
        a_t = jnp.moveaxis(self.state_transitions, -3, 0)
        b_t = jnp.moveaxis(self.state_offsets, -2, 0)
        q_t = jnp.moveaxis(self.process_covariances, -3, 0)
        if a_t.shape[0] >= 4096 and a_t.ndim == 3:
            # long unbatched grids: ONE packed [2d²+d, T] array through the
            # blocked scan (matrix-stack composes pay tile padding + XLA's
            # while-loop batched-matmul lowering, ops/blocked_scan.py)
            from ..ops import achmat as am
            from ..ops.blocked_scan import blocked_assoc_scan_packed

            d = a_t.shape[-1]
            dd = d * d
            n = a_t.shape[0]
            packed = jnp.concatenate(
                [a_t.reshape(n, dd).T, b_t.T, q_t.reshape(n, dd).T], axis=0
            )

            def compose_packed(x, y):
                rx, ry = x.shape[1:], y.shape[1:]
                a1 = x[:dd].reshape((d, d) + rx)
                b1 = x[dd : dd + d]
                q1 = x[dd + d :].reshape((d, d) + rx)
                a2 = y[:dd].reshape((d, d) + ry)
                b2 = y[dd : dd + d]
                q2 = y[dd + d :].reshape((d, d) + ry)
                a = am.amm(a2, a1)
                b = am.amv(a2, b1) + b2
                q = am.asym(am.amm(a2, am.amm(q1, am.amt(a2))) + q2)
                rest = b.shape[1:]
                return jnp.concatenate(
                    [a.reshape((dd,) + rest), b, q.reshape((dd,) + rest)], axis=0
                )

            ident = tuple(
                1.0 if i == j else 0.0 for i in range(d) for j in range(d)
            ) + (0.0,) * (d + dd)
            out = blocked_assoc_scan_packed(compose_packed, packed, identity=ident)
            ca = jnp.moveaxis(out[:dd].reshape(d, d, n), -1, 0)
            cb = out[dd : dd + d].T
            cq = jnp.moveaxis(out[dd + d :].reshape(d, d, n), -1, 0)
            return ca, cb, cq
        if a_t.shape[0] >= 4096:
            from ..ops.blocked_scan import blocked_assoc_scan

            d = a_t.shape[-1]
            eye = jnp.eye(d, dtype=a_t.dtype)
            return blocked_assoc_scan(
                _affine_gaussian_compose,
                (a_t, b_t, q_t),
                identity=(eye, jnp.zeros((d,), a_t.dtype), jnp.zeros((d, d), a_t.dtype)),
            )
        return lax.associative_scan(_affine_gaussian_compose, (a_t, b_t, q_t))

    def marginals(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Marginal means ``[..., N+1, d]`` and covariances ``[..., N+1, d, d]``.

        Parallel-in-time equivalent of ``marginal_means`` /
        ``marginal_covariances`` (state_space_model.py:232-262): the marginal
        at step k is the initial Gaussian pushed through the cumulative affine
        map ``C_k x₀ + d_k + noise``.
        """
        ca, cb, cq = self._cumulative_elements()
        mu0 = self.initial_mean
        p0 = self.initial_covariance
        means_rest = matvec_small(ca, mu0) + cb
        covs_rest = matmul_small(matmul_small(ca, p0), transpose_last(ca)) + cq
        means = jnp.concatenate([mu0[None], means_rest], axis=0)
        covs = jnp.concatenate([p0[None], covs_rest], axis=0)
        return jnp.moveaxis(means, 0, -2), jnp.moveaxis(covs, 0, -3)

    @property
    def marginal_means(self) -> jnp.ndarray:
        return self.marginals()[0]

    @property
    def marginal_covariances(self) -> jnp.ndarray:
        return self.marginals()[1]

    def subsequent_covariances(self, marginal_covariances: jnp.ndarray) -> jnp.ndarray:
        """``Cov(x_{k+1}, x_k) = A_k P_k`` (state_space_model.py:326)."""
        return matmul_small(self.state_transitions, marginal_covariances[..., :-1, :, :])

    # --------------------------------------------------------------- sampling
    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jnp.ndarray:
        """Joint sample of the whole trajectory, shape ``[*S, ..., N+1, d]``.

        One associative scan over noise-shifted affine maps — the parallel
        equivalent of the reference's joint banded solve against white noise
        (state_space_model.py:298-324).
        """
        d, n = self.state_dim, self.num_transitions
        k0, k1 = jax.random.split(key)
        eps0 = jax.random.normal(k0, sample_shape + self.batch_shape + (d,), self.initial_mean.dtype)
        eps = jax.random.normal(
            k1, sample_shape + self.batch_shape + (n, d), self.initial_mean.dtype
        )
        x0 = self.initial_mean + jnp.einsum(
            "...ij,...j->...i", self.chol_initial_covariance, eps0
        )
        shifted_b = self.state_offsets + jnp.einsum(
            "...ij,...j->...i", self.chol_process_covariances, eps
        )

        a_t = jnp.moveaxis(jnp.broadcast_to(
            self.state_transitions, sample_shape + self.state_transitions.shape
        ), -3, 0)
        b_t = jnp.moveaxis(shifted_b, -2, 0)

        def compose(e1, e2):
            a1, b1 = e1
            a2, b2 = e2
            return a2 @ a1, jnp.einsum("...ij,...j->...i", a2, b1) + b2

        ca, cb = lax.associative_scan(compose, (a_t, b_t))
        xs = jnp.einsum("t...ij,...j->t...i", ca, x0) + cb
        traj = jnp.concatenate([x0[None], xs], axis=0)
        return jnp.moveaxis(traj, 0, -2)

    # ------------------------------------------------------------- densities
    def log_det_precision(self) -> jnp.ndarray:
        """``log |K| = −log |P₀| − Σ log |Q_k|`` (state_space_model.py:343)."""
        chols = self.concatenated_cholesky_process_covariance
        return -2.0 * jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(chols, axis1=-2, axis2=-1))), axis=(-1, -2)
        )

    def log_pdf(self, states: jnp.ndarray) -> jnp.ndarray:
        """Joint log-density of trajectories ``[..., N+1, d]`` → ``[...]``.

        Markov factorization (state_space_model.py:485-526): one batched
        Gaussian log-pdf per transition, fully parallel over time.
        """
        x_prev = states[..., :-1, :]
        x_next = states[..., 1:, :]
        pred = jnp.einsum("...ij,...j->...i", self.state_transitions, x_prev) + self.state_offsets
        lp_init = mvn_logpdf(
            states[..., 0, :], self.initial_mean, self.chol_initial_covariance
        )
        lp_trans = mvn_logpdf(x_next, pred, self.chol_process_covariances)
        return lp_init + jnp.sum(lp_trans, axis=-1)

    def kl_divergence(self, other: "StateSpaceModel") -> jnp.ndarray:
        """``KL(self ‖ other)`` between two Gauss–Markov chains on one grid.

        Markov-chain decomposition (identical in value to the banded-trace
        formula at state_space_model.py:528-595):

            ``KL = KL(q₀‖p₀) + Σ_k E_{q(x_k)} KL(q(x_{k+1}|x_k) ‖ p(x_{k+1}|x_k))``

        where the expected conditional KL has the closed form used below.
        All terms need only q's marginals — computed by the parallel scan.
        """
        q, p = self, other
        d = q.state_dim
        kl0 = gaussian_kl(
            q.initial_mean,
            q.chol_initial_covariance,
            p.initial_mean,
            p.chol_initial_covariance,
        )
        means, covs = q.marginals()
        m_k = means[..., :-1, :]
        s_k = covs[..., :-1, :, :]

        lq = q.chol_process_covariances
        lp = p.chol_process_covariances
        # trace + logdet terms
        lp_inv_lq = tri_solve(lp, lq)
        trace = jnp.sum(lp_inv_lq**2, axis=(-1, -2))
        logdet_q = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(lq, axis1=-2, axis2=-1))), axis=-1)
        logdet_p = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(lp, axis1=-2, axis2=-1))), axis=-1)

        da = q.state_transitions - p.state_transitions
        db = q.state_offsets - p.state_offsets
        # E‖ΔA x + Δb‖²_{Qp⁻¹} = tr(Qp⁻¹ ΔA S ΔAᵀ) + ‖ΔA m + Δb‖²_{Qp⁻¹}
        lp_inv_da = tri_solve(lp, da)
        quad_cov = jnp.einsum("...ij,...jk,...ik->...", lp_inv_da, s_k, lp_inv_da)
        resid = jnp.einsum("...ij,...j->...i", da, m_k) + db
        alpha = tri_solve(lp, resid[..., None])[..., 0]
        quad_mean = jnp.sum(alpha**2, axis=-1)

        per_step = 0.5 * (trace - d + logdet_p - logdet_q + quad_cov + quad_mean)
        return kl0 + jnp.sum(per_step, axis=-1)

    def normalizer(self) -> jnp.ndarray:
        """Log-partition of the Gaussian in natural form
        (state_space_model.py:595-609):

            ``½ (D·log 2π − log|K| + μᵀKμ)``.
        """
        from ..ops.btd import btd_matvec

        dim = (self.num_transitions + 1) * self.state_dim
        cst = dim * jnp.log(2.0 * jnp.pi).astype(self.initial_mean.dtype)
        means, _ = self.marginals()
        k_mu = btd_matvec(self.precision(), means)
        maha = jnp.sum(means * k_mu, axis=(-1, -2))
        return 0.5 * (cst - self.log_det_precision() + maha)

    # -------------------------------------------------------------- precision
    def precision(self) -> BTD:
        """Assemble the block-tridiagonal precision ``K = A⁻ᵀ Q⁻¹ A⁻¹``.

        Blockwise SpInGP assembly (state_space_model.py:431-483):

            ``K₀₀ = P₀⁻¹ + A₁ᵀQ₁⁻¹A₁``,
            ``K_kk = Q_k⁻¹ + A_{k+1}ᵀQ_{k+1}⁻¹A_{k+1}``,
            ``K_NN = Q_N⁻¹``,
            ``K_{k+1,k} = −Q_{k+1}⁻¹A_{k+1}``.
        """
        d = self.state_dim
        eye = jnp.eye(d, dtype=self.initial_mean.dtype)
        chols = self.concatenated_cholesky_process_covariance  # [..., N+1, d, d]
        precisions = cho_solve(chols, jnp.broadcast_to(eye, chols.shape))  # [..., N+1, d, d]
        q_inv_a = matmul_small(precisions[..., 1:, :, :], self.state_transitions)  # [..., N, d, d]
        at_qinv_a = matmul_small(transpose_last(self.state_transitions), q_inv_a)
        diag = precisions
        diag = diag.at[..., :-1, :, :].add(at_qinv_a)
        return BTD(diag=diag, sub=-q_inv_a)


def ssm_from_covariances(
    initial_mean: jnp.ndarray,
    initial_covariance: jnp.ndarray,
    state_transitions: jnp.ndarray,
    state_offsets: jnp.ndarray,
    process_covariances: jnp.ndarray,
    jitter: float = 0.0,
) -> StateSpaceModel:
    """Build an SSM from (non-Cholesky) covariances, masking zero blocks.

    Equivalent of ``state_space_model_from_covariances``
    (state_space_model.py:613-656): process covariances that are exactly zero
    (e.g. deterministic kernels like Constant/HarmonicOscillator) get a zero
    "Cholesky" instead of NaNs.
    """
    d = initial_mean.shape[-1]
    eye = jnp.eye(d, dtype=initial_mean.dtype)

    def chol_or_zero(cov):
        is_zero = jnp.all(cov == 0.0, axis=(-1, -2), keepdims=True)
        safe = jnp.where(is_zero, eye, cov + jitter * eye)
        chol = chol_psd(safe)
        return jnp.where(is_zero, jnp.zeros_like(chol), chol)

    return StateSpaceModel(
        initial_mean=initial_mean,
        chol_initial_covariance=chol_or_zero(initial_covariance),
        state_transitions=state_transitions,
        state_offsets=state_offsets,
        chol_process_covariances=chol_or_zero(process_covariances),
    )
