"""Channelized CVI-DP hot loop for ``2 ≤ d ≤ 8`` (structure-of-scalars).

Generalizes :mod:`.cvi_dp_packed` (the d=1 rank-1 loop) to small state dims
using the chmat channel algebra (ops/chmat.py) — d ≤ 3 via adjugate
inverses, 4 ≤ d ≤ 8 via the PD-routed Cholesky forms: every ``[T, d, d]`` stack
is carried as ``d²`` rank-1 ``[T]`` channels, so nothing materializes in the
TPU's 256×-padded tiny-matrix layout and the whole natgrad step fuses into
a handful of kernels.  Without this, the generic d=2 VanderPol CVI-DP step
at T=100k does not even finish compiling on the remote TPU compiler.

Mirrors ``update_data_sites → update_girsanov_sites → classic_elbo``
(variational_cvi_sde.py:279-352) with the same dtype boundaries (float64
naturals algebra via the Schur-segment UDU', float32 compute); equivalence
vs the generic model is tested in ``tests/unit/test_cvi_dp_packed_ch.py``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ..config import default_jitter
from ..ops import chmat as cm
from ..ops.blocked_scan import blocked_assoc_scan
from ..ops.btd import udu_channels
from ..ops.quadrature import gauss_hermite_grid
from ..sde.utils import BTDNaturals
from .cvi_dp import CVISitesSDE, DataSites

__all__ = [
    "PackedChState",
    "pack_state_ch",
    "unpack_state_ch",
    "packed_natgrad_step_ch",
]


class PackedChState(struct.PyTreeNode):
    """All mutable CVI-DP state as channel pytrees (tuples of ``[T]``
    arrays).  Data sites are DENSE on the grid with a mask, as in the d=1
    packed loop."""

    g_nat1: tuple  # Vec channels [T], model dtype
    g_nat2d: tuple  # Mat channels [T]
    g_nat2s: tuple  # Mat channels [T-1]
    d_nat1: tuple  # Vec channels [T] (dense)
    d_nat2: tuple  # Mat channels [T] (dense)
    fx_mu: tuple  # Vec channels [T]
    fx_cov: tuple  # Mat channels [T]
    p_nat1: tuple  # Vec channels [T], f64 under x64
    p_nat2d: tuple  # Mat channels [T]
    p_nat2s: tuple  # Mat channels [T-1]
    obs_mask: jnp.ndarray  # [T]
    y: tuple  # Vec channels [T] (dense observations)


def pack_state_ch(model: CVISitesSDE) -> PackedChState:
    """Channelize a ``d ≤ 3`` model's mutable state."""
    d = model.state_dim
    if d > 8:
        raise ValueError("channelized CVI-DP fast path requires state_dim <= 8")
    t = model.time_grid.shape[0]
    dtype = model.time_grid.dtype
    obs_idx = model.obs_indices
    g = model.girsanov_sites
    ds = model.data_sites
    p = model.prior_nats
    if p is None:
        from .cvi_dp import _prior_nats_f64

        p = _prior_nats_f64(model.dist_p)

    def dense_v(vals):  # [n_obs, d] -> Vec channels [T]
        return tuple(
            jnp.zeros(t, dtype).at[obs_idx].set(vals[:, i]) for i in range(d)
        )

    def dense_m(vals):  # [n_obs, d, d] -> Mat channels [T]
        return tuple(
            tuple(
                jnp.zeros(t, dtype).at[obs_idx].set(vals[:, i, j])
                for j in range(d)
            )
            for i in range(d)
        )

    mask = jnp.zeros(t, dtype).at[obs_idx].set(1.0)
    return PackedChState(
        g_nat1=cm.vec_to_ch(g.nat1),
        g_nat2d=cm.mat_to_ch(g.nat2_diag),
        g_nat2s=cm.mat_to_ch(g.nat2_sub),
        d_nat1=dense_v(ds.nat1),
        d_nat2=dense_m(ds.nat2),
        fx_mu=cm.vec_to_ch(model.fx_mus),
        fx_cov=cm.mat_to_ch(model.fx_covs),
        p_nat1=cm.vec_to_ch(p.nat1),
        p_nat2d=cm.mat_to_ch(p.nat2_diag),
        p_nat2s=cm.mat_to_ch(p.nat2_sub),
        obs_mask=mask,
        y=dense_v(model.observations),
    )


def unpack_state_ch(model: CVISitesSDE, state: PackedChState) -> CVISitesSDE:
    """Restore a channel state into the API-shaped model pytree."""
    obs_idx = model.obs_indices
    d = model.state_dim
    nat1 = cm.ch_to_vec(state.d_nat1)[obs_idx]
    nat2 = cm.ch_to_mat(state.d_nat2)[obs_idx]
    return model.replace(
        girsanov_sites=BTDNaturals(
            nat1=cm.ch_to_vec(state.g_nat1),
            nat2_diag=cm.ch_to_mat(state.g_nat2d),
            nat2_sub=cm.ch_to_mat(state.g_nat2s),
        ),
        data_sites=DataSites(nat1=nat1, nat2=nat2),
        fx_mus=cm.ch_to_vec(state.fx_mu),
        fx_covs=cm.ch_to_mat(state.fx_cov),
    )


def _tree_astype(ch, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), ch)


def _affine_scan_ch(t_mat, c_vec, x0, *, reverse=False):
    """``x_k = T_k x_{k±1} + c_k`` on channel matrices/vectors via one
    blocked scan (matrix-affine composition)."""
    d = len(c_vec)
    dd = d * d

    def comp(e1, e2):
        t1 = cm.unflatten_mat(e1[:dd], d)
        c1 = tuple(e1[dd:])
        t2 = cm.unflatten_mat(e2[:dd], d)
        c2 = tuple(e2[dd:])
        return cm.flatten_mat(cm.mm(t2, t1)) + tuple(cm.vadd(cm.mv(t2, c1), c2))

    flat = cm.flatten_mat(t_mat) + tuple(c_vec)
    eye_flat = tuple(1.0 if i == j else 0.0 for i in range(d) for j in range(d))
    ident = eye_flat + (0.0,) * d
    out = blocked_assoc_scan(comp, flat, identity=ident, reverse=reverse)
    ca = cm.unflatten_mat(out[:dd], d)
    cb = tuple(out[dd:])
    return cm.vadd(cm.mv(ca, x0), cb)


def _marginals_scan_ch(a, c, q, x0, v0):
    """Fused marginal means+covariances: one blocked scan over the
    affine-Gaussian compose; means ≡ the mean solve (see cvi_dp_packed)."""
    d = len(c)
    dd = d * d

    def comp(e1, e2):
        a1 = cm.unflatten_mat(e1[:dd], d)
        b1 = tuple(e1[dd : dd + d])
        q1 = cm.unflatten_mat(e1[dd + d :], d)
        a2 = cm.unflatten_mat(e2[:dd], d)
        b2 = tuple(e2[dd : dd + d])
        q2 = cm.unflatten_mat(e2[dd + d :], d)
        a_new = cm.mm(a2, a1)
        b_new = cm.vadd(cm.mv(a2, b1), b2)
        q_new = cm.madd(cm.mm(a2, cm.mm(q1, cm.mt(a2))), q2)
        return cm.flatten_mat(a_new) + tuple(b_new) + cm.flatten_mat(q_new)

    flat = cm.flatten_mat(a) + tuple(c) + cm.flatten_mat(q)
    eye_flat = tuple(1.0 if i == j else 0.0 for i in range(d) for j in range(d))
    ident = eye_flat + (0.0,) * d + (0.0,) * dd
    out = blocked_assoc_scan(comp, flat, identity=ident)
    ca = cm.unflatten_mat(out[:dd], d)
    cb = tuple(out[dd : dd + d])
    cq = cm.unflatten_mat(out[dd + d :], d)

    means_rest = cm.vadd(cm.mv(ca, x0), cb)
    covs_rest = cm.madd(cm.mm(ca, cm.mm(v0, cm.mt(ca))), cq)
    means = tuple(
        jnp.concatenate([x0[i][None], means_rest[i]]) for i in range(d)
    )
    covs = tuple(
        tuple(
            jnp.concatenate([v0[i][j][None], covs_rest[i][j]])
            for j in range(d)
        )
        for i in range(d)
    )
    return means, covs


def naturals_to_marginals_ch(nat1, nat2d, nat2s, compute_dtype):
    """Channel naturals → SSM params + marginal means/covs.

    The channel twin of ``naturals_to_ssm_params`` + ``marginals``
    (ssm/transforms.py:133-172, ssm/state_space_model.py:122-159): input
    naturals in their own (f64) dtype, outputs in ``compute_dtype``.
    Shared by the CVI-DP channel loop below and the non-conjugate CVI
    packed loop (:mod:`.cvi_packed`).  Returns ``((a, qv), means, covs)``.
    """
    kd = cm.mscale(nat2d, -2.0)
    b_sub = cm.mscale(nat2s, -1.0)  # b_k = K[k+1,k]
    d_blocks, u_super = udu_channels(kd, b_sub)
    a = cm.mscale(cm.mt(u_super), -1.0)
    covs = cm.minv_pd(d_blocks)  # [P0, Q_1..Q_N] channels (PD pivots)

    def tail(mat):
        return tuple(tuple(x[1:] for x in row) for row in mat)

    def head1(v):
        return tuple(x[0] for x in v)

    qv = tail(covs)
    p0v = tuple(tuple(x[0] for x in row) for row in covs)

    # mean solve: U z = θ (backward), w = D⁻¹z, Uᵀ μ = w (forward)
    theta_head = tuple(x[:-1] for x in nat1)
    theta_last = tuple(x[-1] for x in nat1)
    neg_u = cm.mscale(u_super, -1.0)
    z_rest = _affine_scan_ch(neg_u, theta_head, theta_last, reverse=True)
    z = tuple(
        jnp.concatenate([z_rest[i], nat1[i][-1:]]) for i in range(len(nat1))
    )
    w = cm.mv(covs, z)
    w_head = head1(w)
    w_tail = tuple(x[1:] for x in w)

    # fused forward marginals in the compute dtype
    a32 = _tree_astype(a, compute_dtype)
    w_tail32 = _tree_astype(w_tail, compute_dtype)
    qv32 = _tree_astype(qv, compute_dtype)
    w032 = _tree_astype(w_head, compute_dtype)
    p032 = _tree_astype(p0v, compute_dtype)
    means, covs_m = _marginals_scan_ch(a32, w_tail32, qv32, w032, p032)
    return (a32, qv32), means, covs_m


def _dist_q_ch(state: PackedChState, compute_dtype):
    """full_sites + naturals→SSM + marginals, all channels.

    f64 naturals algebra (Schur-segment UDU' + matrix-affine mean solve),
    f32 marginals; the posterior marginal means ARE the mean solve."""
    f64 = state.p_nat1[0].dtype
    nat1 = cm.vadd(
        cm.vadd(state.p_nat1, _tree_astype(state.g_nat1, f64)),
        _tree_astype(state.d_nat1, f64),
    )
    nat2d = cm.madd(
        cm.madd(state.p_nat2d, _tree_astype(state.g_nat2d, f64)),
        _tree_astype(state.d_nat2, f64),
    )
    nat2s = cm.madd(state.p_nat2s, _tree_astype(state.g_nat2s, f64))
    return naturals_to_marginals_ch(nat1, nat2d, nat2s, compute_dtype)


def _kl_packed_ch(
    e1, ed, es, sde, p_var_diag, p_mu0, p_cov0, quad_z, quad_w, dt, d
):
    """KL[q‖p(SDE)] from q's channel expectation parameters.

    Mirrors sde/utils.py::_kl_of_exp_params + ssm_kl_along_gaussian_path
    with the Euler p-forward; ``p_var_diag`` is the per-interval ``Σ_p = dt·q``
    as a channel Mat over [T−1]."""
    mu = e1
    mu_outer = tuple(tuple(e1[i] * e1[j] for j in range(d)) for i in range(d))
    var = cm.msub(ed, mu_outer)
    mu_k = tuple(x[:-1] for x in mu)
    mu_next = tuple(x[1:] for x in mu)
    var_k = tuple(tuple(x[:-1] for x in row) for row in var)
    var_next = tuple(tuple(x[1:] for x in row) for row in var)

    # covs_upper = esᵀ − μ_k μ_{k+1}ᵀ;  a = (Σ_k⁻¹ covs_upper)ᵀ
    cov_up = cm.msub(
        cm.mt(es),
        tuple(tuple(mu_k[i] * mu_next[j] for j in range(d)) for i in range(d)),
    )
    a = cm.mt(cm.msolve_pd(var_k, cov_up))
    b = cm.vsub(mu_next, cm.mv(a, mu_k))
    qv = cm.msub(var_next, cm.mm(a, cm.mm(var_k, cm.mt(a))))

    p_inv = cm.minv_pd(p_var_diag)
    c_term = (
        -(cm.logdet_pd(qv) - cm.logdet_pd(p_var_diag))
        - float(d)
        + cm.trace_prod(p_inv, qv)
    )

    # Gauss–Hermite over q's marginals: x = μ + √2 L z  (channels [T−1, P])
    jitter = jnp.asarray(default_jitter(), var[0][0].dtype)
    chol = cm.mchol(cm.madd_scalar_diag(var_k, jitter))
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, mu[0].dtype))
    x = tuple(
        mu_k[i][:, None]
        + sqrt2 * sum(chol[i][j][:, None] * quad_z[:, j] for j in range(d))
        for i in range(d)
    )
    f_p = tuple(x[i] + dt * fi for i, fi in enumerate(sde.drift_ch(x)))
    f_q = tuple(
        sum(a[i][j][:, None] * x[j] for j in range(d)) + b[i][:, None]
        for i in range(d)
    )
    diff = tuple(f_p[i] - f_q[i] for i in range(d))
    weighted = sum(
        diff[i] * p_inv[i][j][:, None] * diff[j]
        for i in range(d)
        for j in range(d)
    )
    fn_difference = jnp.sum(weighted * quad_w, axis=-1)
    kl_path = 0.5 * jnp.sum(fn_difference + c_term)

    # KL₀ against the prior initial state (closed form, channels of scalars)
    var0 = tuple(tuple(x[0] for x in row) for row in var)
    mu0 = tuple(x[0] for x in mu)
    p0_inv = cm.minv_pd(p_cov0)
    diff0 = cm.vsub(p_mu0, mu0)
    kl_0 = 0.5 * (
        cm.trace_prod(p0_inv, var0)
        + cm.quad_form(diff0, p0_inv, diff0)
        - float(d)
        + cm.logdet_pd(p_cov0)
        - cm.logdet_pd(var0)
    )
    return kl_path + kl_0


def packed_elbo_ch(model: CVISitesSDE, state: PackedChState) -> jnp.ndarray:
    """``classic_elbo()`` of the current channel state (no updates)."""
    dtype = model.time_grid.dtype
    d = model.state_dim
    t = state.obs_mask.shape[0]
    dt = model.dt
    quad_z, quad_w = gauss_hermite_grid(d, 20, dtype)
    sde = model.prior_sde
    q_ch_const = cm.mat_to_ch(sde.q.astype(dtype))
    p_mu0 = cm.vec_to_ch(model.prior_initial_state.mu.astype(dtype))
    p_cov0 = cm.mat_to_ch(model.prior_initial_state.cov.astype(dtype))

    (a_c, _), means_c, covs_c = _dist_q_ch(state, dtype)
    mu = cm.ch_to_vec(means_c)
    var = cm.ch_to_vec(tuple(covs_c[i][i] for i in range(d)))
    per_t = model.likelihood.variational_expectations(mu, var, cm.ch_to_vec(state.y))
    ve = jnp.sum(state.obs_mask * per_t)

    var_kc = tuple(tuple(x[:-1] for x in row) for row in covs_c)
    es_c = cm.madd(
        cm.mm(a_c, var_kc),
        tuple(
            tuple(means_c[i][1:] * means_c[j][:-1] for j in range(d))
            for i in range(d)
        ),
    )
    p_var_elbo = tuple(
        tuple(jnp.broadcast_to(dt * q_ch_const[i][j], (t - 1,)) for j in range(d))
        for i in range(d)
    )
    kl = _kl_packed_ch(
        means_c,
        cm.madd(
            covs_c,
            tuple(
                tuple(means_c[i] * means_c[j] for j in range(d))
                for i in range(d)
            ),
        ),
        es_c,
        sde,
        p_var_elbo,
        p_mu0,
        p_cov0,
        quad_z,
        quad_w,
        dt,
        d,
    )
    return ve - kl


def packed_natgrad_step_ch(
    model: CVISitesSDE, state: PackedChState, lr
) -> Tuple[PackedChState, jnp.ndarray]:
    """One full CVI-DP natgrad step on channel state (d ≤ 3):
    ``update_data_sites(lr)`` → ``update_girsanov_sites(lr)`` →
    ``classic_elbo()`` — the trainer inner iteration, every buffer rank-1."""
    dtype = model.time_grid.dtype
    d = model.state_dim
    t = state.obs_mask.shape[0]
    dt = model.dt
    quad_z, quad_w = gauss_hermite_grid(d, 20, dtype)
    mask = state.obs_mask
    sde = model.prior_sde

    dts = model.time_grid[1:] - model.time_grid[:-1]
    q_ch_const = cm.mat_to_ch(sde.q.astype(dtype))
    p_var = tuple(
        tuple(lax.stop_gradient(dts * q_ch_const[i][j]) for j in range(d))
        for i in range(d)
    )
    p_mu0 = cm.vec_to_ch(model.prior_initial_state.mu.astype(dtype))
    p_cov0 = cm.mat_to_ch(model.prior_initial_state.cov.astype(dtype))

    def masked_ve(means, covs_m):
        mu = cm.ch_to_vec(means)  # [T, d] — tiny fusion, likelihood API
        var = cm.ch_to_vec(tuple(covs_m[i][i] for i in range(d)))
        y = cm.ch_to_vec(state.y)
        per_t = model.likelihood.variational_expectations(mu, var, y)
        return jnp.sum(mask * per_t)

    # ---- update_data_sites(lr): dense masked VE grads in η coordinates
    def ve_of_eta(eta1, eta2):
        mu_outer = tuple(
            tuple(eta1[i] * eta1[j] for j in range(d)) for i in range(d)
        )
        cov = cm.msub(eta2, mu_outer)
        return masked_ve(eta1, cov)

    eta1_0 = state.fx_mu
    eta2_0 = cm.madd(
        state.fx_cov,
        tuple(tuple(eta1_0[i] * eta1_0[j] for j in range(d)) for i in range(d)),
    )
    g1, g2 = jax.grad(ve_of_eta, argnums=(0, 1))(eta1_0, eta2_0)
    d_nat1 = jax.tree_util.tree_map(
        lambda s, g: (1.0 - lr) * s + lr * g, state.d_nat1, g1
    )
    d_nat2 = jax.tree_util.tree_map(
        lambda s, g: (1.0 - lr) * s + lr * g, state.d_nat2, g2
    )
    state = state.replace(d_nat1=d_nat1, d_nat2=d_nat2)

    # ---- dist_q(B) + ∇_η KL → girsanov update
    (a_b, _), means_b, covs_b = _dist_q_ch(state, dtype)
    e1 = means_b
    ed = cm.madd(
        covs_b,
        tuple(tuple(means_b[i] * means_b[j] for j in range(d)) for i in range(d)),
    )
    var_k = tuple(tuple(x[:-1] for x in row) for row in covs_b)
    es = cm.madd(
        cm.mm(a_b, var_k),
        tuple(
            tuple(means_b[i][1:] * means_b[j][:-1] for j in range(d))
            for i in range(d)
        ),
    )
    grad_e1, grad_ed, grad_es = jax.grad(_kl_packed_ch, argnums=(0, 1, 2))(
        e1, ed, es, sde, p_var, p_mu0, p_cov0, quad_z, quad_w, dt, d
    )
    # symmetric-subspace projection of the η_diag gradient — see
    # sde/utils.py::_sym_exp_grads
    grad_ed = cm.sym(grad_ed)
    state = state.replace(
        g_nat1=jax.tree_util.tree_map(
            lambda g, dn, gr: g + lr * (dn - gr), state.g_nat1, d_nat1, grad_e1
        ),
        g_nat2d=jax.tree_util.tree_map(
            lambda g, dn, gr: g + lr * (dn - gr), state.g_nat2d, d_nat2, grad_ed
        ),
        g_nat2s=jax.tree_util.tree_map(
            lambda g, gr: g - lr * gr, state.g_nat2s, grad_es
        ),
    )

    # ---- dist_q(C) + classic ELBO
    (a_c, _), means_c, covs_c = _dist_q_ch(state, dtype)
    state = state.replace(fx_mu=means_c, fx_cov=covs_c)

    ve = masked_ve(means_c, covs_c)
    var_kc = tuple(tuple(x[:-1] for x in row) for row in covs_c)
    es_c = cm.madd(
        cm.mm(a_c, var_kc),
        tuple(
            tuple(means_c[i][1:] * means_c[j][:-1] for j in range(d))
            for i in range(d)
        ),
    )
    # classic_elbo's KL uses the scalar grid dt (cvi_dp.py::kl_q_p)
    p_var_elbo = tuple(
        tuple(jnp.broadcast_to(dt * q_ch_const[i][j], (t - 1,)) for j in range(d))
        for i in range(d)
    )
    kl = _kl_packed_ch(
        means_c,
        cm.madd(
            covs_c,
            tuple(
                tuple(means_c[i] * means_c[j] for j in range(d))
                for i in range(d)
            ),
        ),
        es_c,
        sde,
        p_var_elbo,
        p_mu0,
        p_cov0,
        quad_z,
        quad_w,
        dt,
        d,
    )
    return state, ve - kl
