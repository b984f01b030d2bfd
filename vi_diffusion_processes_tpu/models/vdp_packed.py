"""Structure-of-scalars VDP hot loop for ``d = 1`` (TPU layout fast path).

Same motivation as :mod:`.cvi_dp_packed`: TPU buffers tile ``(8, 128)`` over
the two minormost dims, so the generic :class:`.vdp.VariationalMarkovGP`
step carries ``[T, 1, 1]``/``[T, 1]`` arrays at up to 1024×/128× their
logical size through every scan boundary.  This module packs the entire
per-iteration state — ``A``, ``b``, both Lagrange multipliers, q(x₀) — into
rank-1 ``[T-1]`` buffers and re-expresses one full ``inference_step``
(forward marginals → backward Lagrange scans → smoothed (A, b) update →
q(x₀) update) plus the ELBO on that layout.

The math mirrors ``models/vdp.py`` (reference vi_sde.py:63-483) exactly —
same Euler discretization, same Gauss–Hermite grids (20 pts for E_sde,
10 pts for the drift expectations), same jittered-Cholesky quadrature —
only array shapes differ.  Equivalence vs the generic step is tested at
1e-9 in ``tests/unit/test_vdp_packed.py``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import default_jitter
from ..ops.btd import scalar_affine_all
from ..ops.quadrature import gauss_hermite_grid
from .cvi_dp_packed import _marginals_1d
from .vdp import CLIP_MAX, CLIP_MIN, VariationalMarkovGP

__all__ = [
    "PackedVDPState",
    "pack_vdp",
    "unpack_vdp",
    "packed_inference_step",
    "packed_vdp_elbo",
]


class PackedVDPState(struct.PyTreeNode):
    """All mutable VDP state as rank-1 (padding-free) arrays.

    ``a``/``b`` follow the generic sign convention (posterior drift
    ``dx = −a·x dt + b dt``); observations are held densely on the grid
    (zeros off-observation, precomputed mask — TPU scatters serialize per
    index, see cvi_dp_packed.pack_state).
    """

    a: jnp.ndarray  # [T-1]
    b: jnp.ndarray  # [T-1]
    lam: jnp.ndarray  # [T-1] λ Lagrange multiplier
    psi: jnp.ndarray  # [T-1] ψ Lagrange multiplier
    q0_mean: jnp.ndarray  # [] q(x₀) mean
    q0_var: jnp.ndarray  # [] q(x₀) variance
    obs_mask: jnp.ndarray  # [T] 1.0 at observation grid points
    y_dense: jnp.ndarray  # [T] observations scattered onto the grid


def pack_vdp(model: VariationalMarkovGP) -> PackedVDPState:
    """Squeeze a ``d = 1`` model's mutable state into rank-1 arrays.

    Requires unique observation indices (same assumption as the dense-site
    CVI packing; reference kalman_filter.py:541-551)."""
    if model.state_dim != 1:
        raise ValueError("packed VDP fast path requires state_dim == 1")
    t = model.grid.shape[0]
    dtype = model.b.dtype
    mask = jnp.zeros(t, dtype).at[model.obs_indices].set(1.0)
    return PackedVDPState(
        a=model.A[..., 0, 0],
        b=model.b[..., 0],
        lam=model.lambda_lagrange[..., 0],
        psi=model.psi_lagrange[..., 0, 0],
        q0_mean=model.q_initial_mean[0],
        q0_var=model.q_initial_cov[0, 0],
        obs_mask=mask,
        y_dense=jnp.zeros(t, dtype).at[model.obs_indices].set(
            model.observations[..., 0]
        ),
    )


def unpack_vdp(
    model: VariationalMarkovGP, state: PackedVDPState
) -> VariationalMarkovGP:
    """Restore a packed state into the API-shaped model pytree."""
    return model.replace(
        A=state.a[:, None, None],
        b=state.b[:, None],
        lambda_lagrange=state.lam[:, None],
        psi_lagrange=state.psi[:, None, None],
        q_initial_mean=state.q0_mean[None],
        q_initial_cov=state.q0_var[None, None],
    )


def _stab(x, stabilize: bool):
    if not stabilize:
        return x
    return jnp.clip(jnp.nan_to_num(x, nan=1e-8), CLIP_MIN, CLIP_MAX)


def _quad(dtype, n_points: int):
    z, w = gauss_hermite_grid(1, n_points, dtype)
    return z[:, 0], w


def _forward_marginals(model: VariationalMarkovGP, state: PackedVDPState):
    """Euler posterior marginals on scalar channels (vdp.py::forward_pass):
    ``a_ssm = 1 − Δt·a``, ``b_ssm = Δt·b``, ``q_ssm = Δt·q``, then the
    fused linear recurrences of cvi_dp_packed._marginals_1d."""
    dt = model.dt
    dtype = state.b.dtype
    q_scalar = jnp.reshape(model.prior_sde.q, ()).astype(dtype)
    a_ssm = 1.0 - dt * state.a
    b_ssm = dt * state.b
    if model.stabilize:
        a_ssm = jnp.clip(jnp.nan_to_num(a_ssm, nan=1e-8), -1.0, 1.0)
        b_ssm = jnp.clip(jnp.nan_to_num(b_ssm, nan=1e-8), -1.0, 1.0)
    qv = jnp.broadcast_to(dt * q_scalar, a_ssm.shape)
    return _marginals_1d(a_ssm, b_ssm, qv, state.q0_mean, state.q0_var)


def _e_sde_packed(m_t, v_t, a, b, drift_fn, q_scalar, dt, quad_z, quad_w):
    """``½ E_q ∫ ‖(−a·x + b) − f_p(x)‖²/q dt`` on scalar channels
    (sde/utils.py::squared_drift_difference_along_Gaussian_path, 20-pt
    Gauss–Hermite with the same jittered Cholesky as mvnquad)."""
    jitter = jnp.asarray(default_jitter(), m_t.dtype)
    chol = jnp.sqrt(v_t + jitter)
    x = m_t[:, None] + jnp.sqrt(jnp.asarray(2.0, m_t.dtype)) * chol[:, None] * quad_z
    diff = (-a[:, None] * x + b[:, None]) - drift_fn(x)
    vals = jnp.sum(diff * diff * quad_w, axis=-1) / q_scalar
    return 0.5 * jnp.sum(vals) * dt


def _masked_ve(model, means, varis, y_dense, mask):
    per_t = model.likelihood.variational_expectations(
        means[:, None], varis[:, None], y_dense[:, None]
    )
    return jnp.sum(mask * per_t)


def packed_vdp_elbo(model: VariationalMarkovGP, state: PackedVDPState):
    """``ELBO = E_obs − E_sde − KL[q(x₀)‖p(x₀)]`` (vdp.py::elbo)."""
    dtype = state.b.dtype
    m, v = _forward_marginals(model, state)
    quad_z, quad_w = _quad(dtype, 20)
    q_scalar = jnp.reshape(model.prior_sde.q, ()).astype(dtype)

    def drift_fn(x):
        return model.prior_sde.drift(x[..., None])[..., 0]

    e_obs = _masked_ve(model, m, v, state.y_dense, state.obs_mask)
    e_sde = _e_sde_packed(
        m[:-1], v[:-1], state.a, state.b, drift_fn, q_scalar, model.dt,
        quad_z, quad_w,
    )
    p_mu0 = model.p_initial_mean[0].astype(dtype)
    p_var0 = model.p_initial_cov[0, 0].astype(dtype)
    kl_0 = 0.5 * (
        state.q0_var / p_var0
        + (p_mu0 - state.q0_mean) ** 2 / p_var0
        - 1.0
        + jnp.log(p_var0 / state.q0_var)
    )
    return e_obs - e_sde - kl_0


def packed_inference_step(
    model: VariationalMarkovGP,
    state: PackedVDPState,
    lr,
    x0_lr=0.0,
) -> PackedVDPState:
    """One full VDP fixed-point iteration on packed state — forward
    marginals, backward Lagrange affine scans, smoothed (a, b) update,
    q(x₀) update (vdp.py::inference_step; reference
    vi_markov_gp_trainer.py:50-98).  ``model`` supplies static
    configuration only; its array fields are dead inputs under jit.
    """
    dtype = state.b.dtype
    dt = model.dt
    n_tr = state.a.shape[0]
    q_scalar = jnp.reshape(model.prior_sde.q, ()).astype(dtype)
    quad_z20, quad_w20 = _quad(dtype, 20)
    quad_z10, quad_w10 = _quad(dtype, 10)

    def drift_fn(x):
        return model.prior_sde.drift(x[..., None])[..., 0]

    m, v = _forward_marginals(model, state)

    # ---- dE_sde/dm, dE_sde/dv (÷dt undoes the Riemann sum, vdp.py:170-174)
    g_m, g_v = jax.grad(
        lambda mm, vv: _e_sde_packed(
            mm, vv, state.a, state.b, drift_fn, q_scalar, dt, quad_z20, quad_w20
        ),
        argnums=(0, 1),
    )(m[:-1], v[:-1])
    g_m, g_v = g_m / dt, g_v / dt

    # ---- jump conditions: VE grads, dense under the mask (vdp.py:176-186)
    jm, jv = jax.grad(
        lambda mm, vv: _masked_ve(model, mm, vv, state.y_dense, state.obs_mask),
        argnums=(0, 1),
    )(m, v)

    stab = model.stabilize
    g_m, g_v = _stab(g_m, stab), _stab(g_v, stab)
    jm, jv = _stab(jm, stab), _stab(jv, stab)

    # ---- backward Lagrange affine scans (vdp.py::update_lagrange)
    lam_last = jnp.asarray(0.0, dtype)
    psi_last = jnp.asarray(1e-10, dtype)
    t_lam = 1.0 - dt * state.a[1:]
    c_lam = dt * g_m[1:] - jm[1:n_tr]
    lam_rest = scalar_affine_all(t_lam, c_lam, lam_last, reverse=True)
    t_psi = 1.0 - 2.0 * dt * state.a[1:]
    c_psi = dt * g_v[1:] - jv[1:n_tr]
    psi_rest = scalar_affine_all(t_psi, c_psi, psi_last, reverse=True)
    lam = jnp.concatenate([lam_rest, lam_last[None]])
    psi = jnp.concatenate([psi_rest, psi_last[None]])

    # ---- smoothed (a, b) update (vdp.py::update_param)
    psi_s, lam_s = _stab(psi, stab), _stab(lam, stab)
    m_t, v_t = m[:-1], v[:-1]
    jitter = jnp.asarray(default_jitter(), dtype)
    chol = jnp.sqrt(v_t + jitter)
    x10 = m_t[:, None] + jnp.sqrt(jnp.asarray(2.0, dtype)) * chol[:, None] * quad_z10
    f10, fp10 = jax.jvp(drift_fn, (x10,), (jnp.ones_like(x10),))
    e_f = jnp.sum(f10 * quad_w10, axis=-1)
    e_grad_f = jnp.sum(fp10 * quad_w10, axis=-1)
    a_tilde = -e_grad_f + 2.0 * q_scalar * psi_s
    b_tilde = e_f + a_tilde * m_t - q_scalar * lam_s
    new_a = (1.0 - lr) * state.a + lr * a_tilde
    new_b = (1.0 - lr) * state.b + lr * b_tilde

    # ---- q(x₀) boundary update (vdp.py::update_initial_statistics)
    p_mu0 = model.p_initial_mean[0].astype(dtype)
    p_var0 = model.p_initial_cov[0, 0].astype(dtype)
    m0_new = p_mu0 - p_var0 * lam[0]
    v0_new = 1.0 / (1.0 / p_var0 + 2.0 * psi[0])
    return state.replace(
        a=new_a,
        b=new_b,
        lam=lam,
        psi=psi,
        q0_mean=(1.0 - x0_lr) * state.q0_mean + x0_lr * m0_new,
        q0_var=(1.0 - x0_lr) * state.q0_var + x0_lr * v0_new,
    )
