"""Batched (multi-trajectory) structure-of-scalars CVI-DP hot loop, d = 1.

BASELINE config #5 — B double-well trajectories trained together — used to
vmap the *generic* ``[T, 1, 1]`` model step, bypassing every fast path and
running ~45× slower per grid point than the single-trajectory packed loop
(``models/cvi_dp_packed.py``).  This module extends that loop to ``[B, T]``
planes, the TPU-natural layout (rank-2, lane-aligned along T).

Design: the joint precision over B *independent* chains is block-diagonal
over trajectories, i.e. it IS one block-tridiagonal system of length
``B·T`` whose cross-trajectory subdiagonal blocks are exactly zero.  The
flat d=1 sweeps (``riccati_d_scalar``, the affine substitutions, the
marginal linear recurrences — all dispatching to the fused Pallas kernels
on TPU) handle zero couplings *exactly*:

* UDU' pivots: ``D_k = K_k − K_{k,k+1}²/D_{k+1}`` decouples at a boundary
  because the squared coupling is 0 — the next trajectory's sweep restarts
  from its own diagonal;
* the bidiagonal mean substitutions and the forward marginal recurrence
  carry ``a = −U_{k,k+1} = 0`` across boundaries, so the first state of
  each trajectory reproduces its own ``(μ₀, P₀)`` with no leakage.

So the whole ``full_sites → naturals_to_ssm → marginals`` chain for B
trajectories is ONE call into the flagship flat path at length ``B·T``.
Only the KL needs new code: a transition mask zeroing the B−1 spurious
cross-boundary transitions, and per-trajectory KL₀ terms.

Assumes what the batched benchmark/bench harness provides: trajectories
share the (uniform) time grid, likelihood, and prior SDE; observations,
sites, and prior initial states may differ per trajectory.

Reference call stack: variational_cvi_sde.py:279-352 (site updates +
classic_elbo) vmapped over trajectories; the reference itself only threads
a leading batch_shape through the generic ops (state_space_model.py:101).
Equivalence vs the vmapped generic step is tested in
``tests/unit/test_cvi_dp_packed_batched.py``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import default_jitter
from .cvi_dp import CVISitesSDE
from .cvi_dp_packed import (
    PackedCVIState,
    _dist_q_1d,
    _quad_grid_1d,
    pack_state,
    unpack_state,
)

__all__ = [
    "BatchedPackedCVIState",
    "pack_state_batched",
    "unpack_state_batched",
    "packed_natgrad_step_batched",
]


class BatchedPackedCVIState(struct.PyTreeNode):
    """Per-trajectory CVI-DP state as ``[B, T]`` planes.

    Same field semantics as :class:`..cvi_dp_packed.PackedCVIState` with a
    leading trajectory axis; subdiagonal channels are ``[B, T-1]`` (the
    cross-trajectory couplings are structurally absent).  Prior initial
    moments ride along so trajectories may carry distinct ``p(x₀)``.
    """

    g_nat1: jnp.ndarray  # [B, T]
    g_nat2d: jnp.ndarray  # [B, T]
    g_nat2s: jnp.ndarray  # [B, T-1]
    d_nat1: jnp.ndarray  # [B, T]
    d_nat2: jnp.ndarray  # [B, T]
    fx_mu: jnp.ndarray  # [B, T]
    fx_var: jnp.ndarray  # [B, T]
    p_nat1: jnp.ndarray  # [B, T]
    p_nat2d: jnp.ndarray  # [B, T]
    p_nat2s: jnp.ndarray  # [B, T-1]
    obs_mask: jnp.ndarray  # [B, T]
    y_dense: jnp.ndarray  # [B, T]
    p_mu0: jnp.ndarray  # [B]   prior initial mean per trajectory
    p_var0: jnp.ndarray  # [B]  prior initial variance per trajectory


def pack_state_batched(models_stacked: CVISitesSDE) -> BatchedPackedCVIState:
    """Pack a leading-axis-stacked model pytree (as built by
    ``tree_map(stack, *models)``) into ``[B, T]`` planes."""
    packed = jax.vmap(pack_state)(models_stacked)
    dtype = packed.fx_mu.dtype
    return BatchedPackedCVIState(
        g_nat1=packed.g_nat1,
        g_nat2d=packed.g_nat2d,
        g_nat2s=packed.g_nat2s,
        d_nat1=packed.d_nat1,
        d_nat2=packed.d_nat2,
        fx_mu=packed.fx_mu,
        fx_var=packed.fx_var,
        p_nat1=packed.p_nat1,
        p_nat2d=packed.p_nat2d,
        p_nat2s=packed.p_nat2s,
        obs_mask=packed.obs_mask,
        y_dense=packed.y_dense,
        p_mu0=models_stacked.prior_initial_state.mu[:, 0].astype(dtype),
        p_var0=models_stacked.prior_initial_state.cov[:, 0, 0].astype(dtype),
    )


def unpack_state_batched(
    models_stacked: CVISitesSDE, state: BatchedPackedCVIState
) -> CVISitesSDE:
    """Restore ``[B, T]`` planes into the stacked API-shaped model pytree."""
    flat_fields = PackedCVIState(
        g_nat1=state.g_nat1,
        g_nat2d=state.g_nat2d,
        g_nat2s=state.g_nat2s,
        d_nat1=state.d_nat1,
        d_nat2=state.d_nat2,
        fx_mu=state.fx_mu,
        fx_var=state.fx_var,
        p_nat1=state.p_nat1,
        p_nat2d=state.p_nat2d,
        p_nat2s=state.p_nat2s,
        obs_mask=state.obs_mask,
        y_dense=state.y_dense,
    )
    return jax.vmap(unpack_state)(models_stacked, flat_fields)


def _flat_sub(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, T-1]`` subdiagonal planes → flat ``[B·T − 1]`` with exact
    zeros at the B−1 cross-trajectory couplings (and none past the end)."""
    return jnp.pad(x, ((0, 0), (0, 1))).reshape(-1)[:-1]


def _rows_from_flat_sub(x: jnp.ndarray, b: int, t: int) -> jnp.ndarray:
    """Inverse of :func:`_flat_sub`: drop the boundary entries."""
    return jnp.pad(x, (0, 1)).reshape(b, t)[:, :-1]


def _flat_state(state: BatchedPackedCVIState) -> PackedCVIState:
    """View the batch as ONE packed chain of length ``B·T`` (row-major
    reshape, free on contiguous planes)."""
    return PackedCVIState(
        g_nat1=state.g_nat1.reshape(-1),
        g_nat2d=state.g_nat2d.reshape(-1),
        g_nat2s=_flat_sub(state.g_nat2s),
        d_nat1=state.d_nat1.reshape(-1),
        d_nat2=state.d_nat2.reshape(-1),
        fx_mu=state.fx_mu.reshape(-1),
        fx_var=state.fx_var.reshape(-1),
        p_nat1=state.p_nat1.reshape(-1),
        p_nat2d=state.p_nat2d.reshape(-1),
        p_nat2s=_flat_sub(state.p_nat2s),
        obs_mask=state.obs_mask.reshape(-1),
        y_dense=state.y_dense.reshape(-1),
    )


def _kl_packed_rows(
    e1, ed, es, drift_fn, p_var, p_mu0, p_var0, quad_z, quad_w, dt, b, t, tmask
):
    """Per-trajectory KL[q‖p(SDE)] on the flat chain: the single-chain
    formula (``cvi_dp_packed._kl_packed``, mirroring sde_utils.py:262-359)
    with the B−1 cross-boundary transitions masked out and B initial-state
    KL₀ terms.  Returns ``[B]``."""
    mu = e1
    var = ed - e1**2
    cov_up = es - e1[:-1] * e1[1:]
    a = cov_up / var[:-1]
    bb = mu[1:] - a * mu[:-1]
    qv = var[1:] - a**2 * var[:-1]

    c_term = -(jnp.log(qv) - jnp.log(p_var)) - 1.0 + qv / p_var

    jitter = jnp.asarray(default_jitter(), var.dtype)
    chol = jnp.sqrt(var[:-1] + jitter)
    x = mu[:-1, None] + jnp.sqrt(jnp.asarray(2.0, mu.dtype)) * chol[:, None] * quad_z
    f_p = x + dt * drift_fn(x)
    f_q = a[:, None] * x + bb[:, None]
    diff2 = (f_p - f_q) ** 2 / p_var[:, None]
    fn_difference = jnp.sum(diff2 * quad_w, axis=-1)

    per_trans = tmask * (fn_difference + c_term)  # [B·T − 1]
    # row j's transitions occupy flat slots [j·T, j·T + T − 2]; slot
    # j·T + T − 1 is the (masked) boundary — pad one zero and row-sum
    kl_path = 0.5 * jnp.sum(jnp.pad(per_trans, (0, 1)).reshape(b, t), axis=1)

    var0 = var.reshape(b, t)[:, 0]
    mu0 = mu.reshape(b, t)[:, 0]
    kl_0 = 0.5 * (
        var0 / p_var0 + (p_mu0 - mu0) ** 2 / p_var0 - 1.0 + jnp.log(p_var0 / var0)
    )
    return kl_path + kl_0


def packed_natgrad_step_batched(
    model: CVISitesSDE, state: BatchedPackedCVIState, lr
) -> Tuple[BatchedPackedCVIState, jnp.ndarray]:
    """One full CVI-DP natgrad step for all B trajectories at once:
    ``update_data_sites(lr)`` → ``update_girsanov_sites(lr)`` →
    ``classic_elbo()`` (variational_cvi_sde.py:279-352 semantics), carried
    on ``[B, T]`` planes and computed through the flat flagship path.

    ``model`` supplies the static shared configuration (likelihood, prior
    SDE, uniform grid dt) — pass one *unstacked* representative model;
    per-trajectory data lives entirely in ``state``.  Returns the updated
    state and per-trajectory ELBOs ``[B]``.
    """
    b, t = state.g_nat1.shape
    dtype = model.time_grid.dtype
    dt = model.dt
    quad_z, quad_w = _quad_grid_1d(dtype)
    tmask = _flat_sub(jnp.ones((b, t - 1), dtype))
    flat = _flat_state(state)
    mask = flat.obs_mask
    y = flat.y_dense

    def drift_fn(x):
        return model.prior_sde.drift(x[..., None])[..., 0]

    q_scalar = jnp.reshape(model.prior_sde.q, ()).astype(dtype)
    p_var = jnp.broadcast_to(dt * q_scalar, (b * t - 1,))
    p_mu0 = state.p_mu0
    p_var0 = state.p_var0

    def masked_ve_rows(means, varis):
        per_t = model.likelihood.variational_expectations(
            means[:, None], varis[:, None], y[:, None]
        )
        return jnp.sum((mask * per_t).reshape(b, t), axis=1)

    # ---- update_data_sites(lr): dense VE grads at the cached marginals
    def ve_of_eta(eta1, eta2):
        mu = eta1
        var = eta2 - eta1**2
        return jnp.sum(masked_ve_rows(mu, var))

    m0 = flat.fx_mu
    g1, g2 = jax.grad(ve_of_eta, argnums=(0, 1))(m0, flat.fx_var + m0**2)
    d_nat1 = (1.0 - lr) * flat.d_nat1 + lr * g1
    d_nat2 = (1.0 - lr) * flat.d_nat2 + lr * g2
    flat = flat.replace(d_nat1=d_nat1, d_nat2=d_nat2)

    # refreshed posterior after the data-site update — ONE flagship-path
    # call at length B·T (Pallas-fused on TPU for B·T ≥ 4096)
    ssm_b, means_b, vars_b = _dist_q_1d(flat, dtype)

    # ---- update_girsanov_sites(lr): ∇_η Σ_j KL_j at dist_q(B)
    a_b = ssm_b[0]
    e1 = means_b
    ed = vars_b + means_b**2
    es = a_b * vars_b[:-1] + means_b[1:] * means_b[:-1]

    def total_kl(e1_, ed_, es_):
        return jnp.sum(
            _kl_packed_rows(
                e1_, ed_, es_, drift_fn, p_var, p_mu0, p_var0,
                quad_z, quad_w, dt, b, t, tmask,
            )
        )

    grad_e1, grad_ed, grad_es = jax.grad(total_kl, argnums=(0, 1, 2))(e1, ed, es)
    flat = flat.replace(
        g_nat1=flat.g_nat1 + lr * (d_nat1 - grad_e1),
        g_nat2d=flat.g_nat2d + lr * (d_nat2 - grad_ed),
        # boundary slots of grad_es are exactly zero (every term touching
        # them is masked), so the flat update preserves zero couplings
        g_nat2s=flat.g_nat2s - lr * grad_es,
    )

    # ---- refreshed posterior (dist_q(C)) + per-trajectory classic ELBO
    ssm_c, means_c, vars_c = _dist_q_1d(flat, dtype)
    flat = flat.replace(fx_mu=means_c, fx_var=vars_c)

    ve = masked_ve_rows(means_c, vars_c)
    a_c = ssm_c[0]
    kl = _kl_packed_rows(
        means_c,
        vars_c + means_c**2,
        a_c * vars_c[:-1] + means_c[1:] * means_c[:-1],
        drift_fn,
        p_var,
        p_mu0,
        p_var0,
        quad_z,
        quad_w,
        dt,
        b,
        t,
        tmask,
    )

    new_state = state.replace(
        g_nat1=flat.g_nat1.reshape(b, t),
        g_nat2d=flat.g_nat2d.reshape(b, t),
        g_nat2s=_rows_from_flat_sub(flat.g_nat2s, b, t),
        d_nat1=flat.d_nat1.reshape(b, t),
        d_nat2=flat.d_nat2.reshape(b, t),
        fx_mu=means_c.reshape(b, t),
        fx_var=vars_c.reshape(b, t),
    )
    return new_state, ve - kl
