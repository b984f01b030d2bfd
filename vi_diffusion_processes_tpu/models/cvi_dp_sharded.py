"""Time-axis-sharded CVI-DP natgrad step (d = 1 packed layout).

The multichip story for very long grids: every ``[T]`` plane of the packed
CVI-DP state (:mod:`.cvi_dp_packed`) is sharded over a mesh axis, and the
four O(T) scans inside one natgrad step — the Möbius UDU' pivot sweep, the
two bidiagonal mean substitutions, and the forward marginal recurrence —
run through :func:`..parallel.sharded.sharded_associative_scan` (local
scan → one ``all_gather`` of per-device aggregates → elementwise fold).
Everything else in the step (site updates, Gauss–Hermite KL, VE) is
elementwise or a reduction, which XLA auto-partitions under ``jit``.

This is the genuinely sharded counterpart of the step the reference's
trainer runs (variational_cvi_sde.py:279-352): update_data_sites →
update_girsanov_sites → classic_elbo, with the time axis live on the mesh
throughout — not just a sharded smoothing pass bolted onto an unsharded
step.  Exactness vs the single-device packed step is asserted in the
multichip dryrun (``__graft_entry__.py``) and in
``tests/integration/test_multichip.py``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.sharded import sharded_associative_scan
from .cvi_dp import CVISitesSDE
from .cvi_dp_packed import (
    PackedCVIState,
    _kl_packed,
    _quad_grid_1d,
)

__all__ = ["sharded_packed_natgrad_step", "sharded_dist_q_1d"]


def _ident(identity, dtype):
    return tuple(jnp.asarray(i, dtype) for i in identity)


def _mobius_pivots_sharded(kd, b2, mesh, axis):
    """UDU' pivot sweep ``D_k = kd_k − b2_k / D_{k+1}`` as the normalized
    2×2 Möbius suffix scan (ops/btd.py::_riccati_d_global_scan), sharded
    along time."""

    def compose(a, b):
        a00, a01, a10, a11 = a
        b00, b01, b10, b11 = b
        p00 = b00 * a00 + b01 * a10
        p01 = b00 * a01 + b01 * a11
        p10 = b10 * a00 + b11 * a10
        p11 = b10 * a01 + b11 * a11
        scale = jax.lax.rsqrt(p00**2 + p01**2 + p10**2 + p11**2 + 1e-300)
        return p00 * scale, p01 * scale, p10 * scale, p11 * scale

    elems = (kd, -b2, jnp.ones_like(kd), jnp.zeros_like(kd))
    c00, _, c10, _ = sharded_associative_scan(
        compose, elems, mesh, axis, _ident((1.0, 0.0, 0.0, 1.0), kd.dtype),
        reverse=True,
    )
    return c00 / c10


def _affine_sharded(t, c, x0, mesh, axis, reverse=False):
    """``x_k = t_k x_{k±1} + c_k`` (ops/btd.py::scalar_affine_all), sharded."""

    def comp(e1, e2):
        a1, b1 = e1
        a2, b2_ = e2
        return a2 * a1, a2 * b1 + b2_

    ca, cb = sharded_associative_scan(
        comp, (t, c), mesh, axis, _ident((1.0, 0.0), t.dtype), reverse=reverse
    )
    return ca * x0 + cb


def _marginals_sharded(a, b, qv, mu0, p0v, mesh, axis):
    """Forward marginal mean/variance recurrence
    (cvi_dp_packed._marginals_1d), sharded."""

    def comp(e1, e2):
        a1, b1, q1 = e1
        a2, b2_, q2 = e2
        return a2 * a1, a2 * b1 + b2_, a2 * q1 * a2 + q2

    ca, cb, cq = sharded_associative_scan(
        comp, (a, b, qv), mesh, axis, _ident((1.0, 0.0, 0.0), a.dtype)
    )
    means = jnp.concatenate([mu0[None], ca * mu0 + cb])
    varis = jnp.concatenate([p0v[None], ca * p0v * ca + cq])
    return means, varis


def sharded_dist_q_1d(state: PackedCVIState, compute_dtype, mesh: Mesh, axis: str):
    """``full_sites → naturals_to_ssm → marginals`` on scalar channels with
    every O(T) scan distributed over ``mesh.shape[axis]`` devices (the
    sharded twin of ``cvi_dp_packed._dist_q_1d``; f64 naturals algebra)."""
    f64 = state.p_nat1.dtype
    nat1 = state.p_nat1 + state.g_nat1.astype(f64) + state.d_nat1.astype(f64)
    nat2d = state.p_nat2d + state.g_nat2d.astype(f64) + state.d_nat2.astype(f64)
    nat2s = state.p_nat2s + state.g_nat2s.astype(f64)

    kd = -2.0 * nat2d
    ks = -nat2s
    b2 = jnp.concatenate([ks**2, jnp.zeros_like(kd[:1])])
    d_blocks = _mobius_pivots_sharded(kd, b2, mesh, axis)
    u = ks / d_blocks[1:]
    a64 = -u
    covs = 1.0 / d_blocks
    z_rest = _affine_sharded(-u, nat1[:-1], nat1[-1], mesh, axis, reverse=True)
    z = jnp.concatenate([z_rest, nat1[-1:]])
    w = covs * z
    mu_rest = _affine_sharded(-u, w[1:], w[0], mesh, axis)
    mu = jnp.concatenate([w[:1], mu_rest])
    b64 = mu[1:] - a64 * mu[:-1]

    a = a64.astype(compute_dtype)
    b = b64.astype(compute_dtype)
    qv = covs[1:].astype(compute_dtype)
    mu0 = mu[0].astype(compute_dtype)
    p0v = covs[0].astype(compute_dtype)
    means, varis = _marginals_sharded(a, b, qv, mu0, p0v, mesh, axis)
    return (a, b, qv, mu0, p0v), means, varis


def sharded_packed_natgrad_step(
    model: CVISitesSDE,
    state: PackedCVIState,
    lr,
    mesh: Mesh,
    axis: str,
) -> Tuple[PackedCVIState, jnp.ndarray]:
    """One full CVI-DP natgrad step — ``update_data_sites(lr)`` →
    ``update_girsanov_sites(lr)`` → ``classic_elbo()``
    (variational_cvi_sde.py:279-352) — with the time axis sharded over
    ``mesh.shape[axis]`` devices end to end.  Mirrors
    ``cvi_dp_packed.packed_natgrad_step`` term for term; only the scan
    engine differs, so results agree with the single-device step to
    association-order rounding."""
    dtype = model.time_grid.dtype
    t = state.g_nat1.shape[0]
    dt = model.dt
    quad_z, quad_w = _quad_grid_1d(dtype)
    mask = state.obs_mask
    y = state.y_dense

    def drift_fn(x):
        return model.prior_sde.drift(x[..., None])[..., 0]

    dts = model.time_grid[1:] - model.time_grid[:-1]
    q_scalar = jnp.reshape(model.prior_sde.q, ()).astype(dtype)
    p_var = jax.lax.stop_gradient(dts * q_scalar)
    p_mu0 = model.prior_initial_state.mu[0].astype(dtype)
    p_var0 = model.prior_initial_state.cov[0, 0].astype(dtype)

    def masked_ve(means, varis):
        per_t = model.likelihood.variational_expectations(
            means[:, None], varis[:, None], y[:, None]
        )
        return jnp.sum(mask * per_t)

    # ---- update_data_sites(lr)
    def ve_of_eta(eta1, eta2):
        return masked_ve(eta1, eta2 - eta1**2)

    m0 = state.fx_mu
    g1, g2 = jax.grad(ve_of_eta, argnums=(0, 1))(m0, state.fx_var + m0**2)
    d_nat1 = (1.0 - lr) * state.d_nat1 + lr * g1
    d_nat2 = (1.0 - lr) * state.d_nat2 + lr * g2
    state = state.replace(d_nat1=d_nat1, d_nat2=d_nat2)

    ssm_b, means_b, vars_b = sharded_dist_q_1d(state, dtype, mesh, axis)

    # ---- update_girsanov_sites(lr)
    a_b = ssm_b[0]
    e1 = means_b
    ed = vars_b + means_b**2
    es = a_b * vars_b[:-1] + means_b[1:] * means_b[:-1]
    grad_e1, grad_ed, grad_es = jax.grad(_kl_packed, argnums=(0, 1, 2))(
        e1, ed, es, drift_fn, p_var, p_mu0, p_var0, quad_z, quad_w, dt
    )
    state = state.replace(
        g_nat1=state.g_nat1 + lr * (d_nat1 - grad_e1),
        g_nat2d=state.g_nat2d + lr * (d_nat2 - grad_ed),
        g_nat2s=state.g_nat2s - lr * grad_es,
    )

    # ---- refreshed posterior + classic ELBO
    ssm_c, means_c, vars_c = sharded_dist_q_1d(state, dtype, mesh, axis)
    state = state.replace(fx_mu=means_c, fx_var=vars_c)

    ve = masked_ve(means_c, vars_c)
    a_c = ssm_c[0]
    kl = _kl_packed(
        means_c,
        vars_c + means_c**2,
        a_c * vars_c[:-1] + means_c[1:] * means_c[:-1],
        drift_fn,
        jnp.broadcast_to(dt * q_scalar, (t - 1,)),
        p_mu0,
        p_var0,
        quad_z,
        quad_w,
        dt,
    )
    return state, ve - kl
