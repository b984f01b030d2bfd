"""Parallel-in-time Kalman filtering/smoothing with Gaussian sites.

This module is the TPU-native engine behind every posterior computation in
the framework.  The reference computes posteriors by assembling the prior
block-tridiagonal precision, adding site precisions, and running sequential
C++ banded Cholesky/solve/sparse-inverse recursions
(markovflow/kalman_filter.py:86-182, block_tri_diag.py:428-534).  Here the
same posterior is computed with **associative scans** over
affine-Gaussian "elements" (Särkkä & García-Fernández, *Temporal
Parallelization of Bayesian Smoothers*, 2020 — see PAPERS.md), giving
O(log N) depth on TPU instead of O(N) sequential steps, with identical
results.

Sites are per-state Gaussian potentials in natural (information) form

    ``φ_k(x_k) = exp(θ_kᵀ x_k − ½ x_kᵀ Λ_k x_k)``

which subsumes every observation model in the reference:

* dense Gaussian observations:  ``Λ = HᵀR⁻¹H``, ``θ = HᵀR⁻¹y``
  (``KalmanFilter``, kalman_filter.py:275)
* time-varying / CVI sites: arbitrary ``(θ, Λ)`` (``KalmanFilterWithSites``,
  kalman_filter.py:440)
* sparse sites on a dense grid: ``Λ_k = 0`` at unobserved points
  (``KalmanFilterWithSparseSites``, kalman_filter.py:504).

All functions take time-major inputs internally; the public API uses the
library convention (time axis ``-3``/``-2``) with arbitrary leading batch
dimensions.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ssm.state_space_model import StateSpaceModel
from ..utils.linalg import chol_psd, matmul_small, solve_small, symmetrize, transpose_last

__all__ = [
    "FilterResult",
    "SmootherResult",
    "filter_smoother_with_sites",
    "site_log_normalizer",
    "posterior_ssm_from_smoothed",
]


class FilterResult(NamedTuple):
    means: jnp.ndarray  # filtered means  [..., N+1, d]
    covs: jnp.ndarray  # filtered covs   [..., N+1, d, d]
    pred_means: jnp.ndarray  # one-step-ahead predicted means (pred_means[0] = prior μ₀)
    pred_covs: jnp.ndarray  # predicted covs (pred_covs[0] = prior P₀)


class SmootherResult(NamedTuple):
    means: jnp.ndarray  # smoothed means [..., N+1, d]
    covs: jnp.ndarray  # smoothed covs  [..., N+1, d, d]
    gains: jnp.ndarray  # RTS gains E_k [..., N, d, d]:  Cov(x_k, x_{k+1}|y) = E_k S_{k+1}


def _solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return solve_small(a, b)


# --------------------------------------------------------------------- filter
def _filter_compose(e_i, e_j):
    """Associative composition of filtering elements (S&GF 2020, Lemma 7).

    d == 1 short-circuits to scalar arithmetic (VPU-only)."""
    a_i, b_i, c_i, eta_i, j_i = e_i
    a_j, b_j, c_j, eta_j, j_j = e_j
    d = a_i.shape[-1]
    if d == 1:
        ai, ci, ji = a_i[..., 0, 0], c_i[..., 0, 0], j_i[..., 0, 0]
        aj, cj, jj = a_j[..., 0, 0], c_j[..., 0, 0], j_j[..., 0, 0]
        bi, ei = b_i[..., 0], eta_i[..., 0]
        bj, ej = b_j[..., 0], eta_j[..., 0]
        g = 1.0 / (1.0 + ci * jj)
        a = aj * g * ai
        b = aj * g * (bi + ci * ej) + bj
        c = aj * g * ci * aj + cj
        eta = ai * g * (ej - jj * bi) + ei
        j = ai * g * jj * ai + ji
        return (
            a[..., None, None],
            b[..., None],
            c[..., None, None],
            eta[..., None],
            j[..., None, None],
        )
    eye = jnp.eye(d, dtype=a_i.dtype)
    # G = (I + C_i J_j)^{-1};  (I + J_j C_i)^{-1} = Gᵀ for symmetric C, J
    g = _solve(eye + c_i @ j_j, jnp.broadcast_to(eye, c_i.shape))
    gt = transpose_last(g)
    a = a_j @ g @ a_i
    b = jnp.einsum(
        "...ij,...j->...i", a_j @ g, b_i + jnp.einsum("...ij,...j->...i", c_i, eta_j)
    ) + b_j
    c = a_j @ g @ c_i @ transpose_last(a_j) + c_j
    eta = jnp.einsum(
        "...ji,...jk,...k->...i",
        a_i,
        gt,
        eta_j - jnp.einsum("...ij,...j->...i", j_j, b_i),
    ) + eta_i
    j = transpose_last(a_i) @ gt @ j_j @ a_i + j_i
    return a, b, symmetrize(c), eta, symmetrize(j)


def _make_filter_elements(ssm: StateSpaceModel, nat1: jnp.ndarray, nat2_prec: jnp.ndarray):
    """Build the N+1 filtering elements (time-major).

    ``nat1[k] = θ_k``, ``nat2_prec[k] = Λ_k`` (site *precision*, PSD).

    Element 0 is the site-updated prior; element k≥1 represents
    ``p(x_k|x_{k-1}) φ_k(x_k)`` in the (A, b, C, η, J) parametrization:

        ``A* = (I+QΛ)⁻¹A``, ``b* = (I+QΛ)⁻¹(b+Qθ)``, ``C* = (I+QΛ)⁻¹Q``,
        ``η* = Aᵀ(I+ΛQ)⁻¹(θ−Λb)``, ``J* = Aᵀ(I+ΛQ)⁻¹ΛA``.
    """
    d = ssm.state_dim
    eye = jnp.eye(d, dtype=ssm.initial_mean.dtype)

    # time-major views
    a_t = jnp.moveaxis(ssm.state_transitions, -3, 0)  # [N, ..., d, d]
    b_t = jnp.moveaxis(ssm.state_offsets, -2, 0)
    q_t = jnp.moveaxis(ssm.process_covariances, -3, 0)
    th_t = jnp.moveaxis(nat1, -2, 0)  # [N+1, ..., d]
    lm_t = jnp.moveaxis(nat2_prec, -3, 0)  # [N+1, ..., d, d]

    # --- element 0: updated initial state
    p0 = ssm.initial_covariance
    m0 = ssm.initial_mean
    ipl0 = eye + p0 @ lm_t[0]
    c0 = symmetrize(_solve(ipl0, p0))
    b0 = _solve(ipl0, (m0 + jnp.einsum("...ij,...j->...i", p0, th_t[0]))[..., None])[..., 0]
    a0 = jnp.zeros_like(p0)
    eta0 = jnp.zeros_like(m0)
    j0 = jnp.zeros_like(p0)

    # --- elements 1..N
    lam = lm_t[1:]
    th = th_t[1:]
    iql = eye + q_t @ lam  # (I + QΛ)
    a_star = _solve(iql, a_t)
    b_star = _solve(iql, (b_t + jnp.einsum("...ij,...j->...i", q_t, th))[..., None])[..., 0]
    c_star = symmetrize(_solve(iql, q_t))
    # (I+ΛQ)⁻¹ = (I+QΛ)⁻ᵀ
    rhs = th - jnp.einsum("...ij,...j->...i", lam, b_t)
    ilq_rhs = _solve(transpose_last(iql), rhs[..., None])[..., 0]
    eta_star = jnp.einsum("...ji,...j->...i", a_t, ilq_rhs)
    ilq_lam_a = _solve(transpose_last(iql), lam @ a_t)
    j_star = symmetrize(transpose_last(a_t) @ ilq_lam_a)

    cat = lambda first, rest: jnp.concatenate([first[None], rest], axis=0)
    return (
        cat(a0, a_star),
        cat(b0, b_star),
        cat(c0, c_star),
        cat(eta0, eta_star),
        cat(j0, j_star),
    )


#: channelized (structure-of-scalars) fast path threshold — see chmat.py;
#: tests lower this to exercise the channel path on small grids
CH_THRESHOLD = 4096

#: channelized path state-dim ceiling.  d ≤ 3 uses adjugate inverses; 4 ≤ d
#: ≤ CH_MAX_DIM routes every inverse through PD Cholesky/Woodbury forms
#: (achmat.ainv_ipl/ainv_pd on packed ``[d,d,nb]`` arrays — O(d²) HLO per
#: compose) — covers kernel sums (Matern52+Matern12 → d=4) and
#: reference-scale spatio-temporal state dims (M_space=7 × Matern32 →
#: d=14, docs/notebooks/spatio_temporal.py:19-28).  Beyond this the
#: ``[d,d]`` channel blocks outgrow VPU-friendly unrolled Cholesky pivots
#: and the dense [T,d,d] path takes over.
CH_MAX_DIM = 16

#: the remote TPU compiler OOMs (compile-helper subprocess SIGKILL) on the
#: packed channelized graphs past d≈8 when the blocked scans instantiate
#: the unrolled compose ~16× (recursive cross pass) — measured on the
#: reference-scale spatio-temporal config (d=14, Mt=10k, 1.6 MB MLIR; even
#: the UDU' alone died).  d > 8 therefore runs the 3-instantiation variant
#: (``blocked_assoc_scan_packed(..., cross_seq=True)``), which compiles at
#: d=14 and keeps the same per-element arithmetic.  If a future config
#: still OOMs, lower this ceiling — the dense [T,d,d] stack path (QR- and
#: Cholesky-routed custom calls + ``btd_udu_parallel_dense``) is the
#: fallback and is f64-safe, just custom-call-bound (~0.27 steps/s at d=14
#: vs the channelized path).
CH_MAX_DIM_TPU = 16


def ch_max_dim() -> int:
    """Backend-aware channelized-path state-dim ceiling (trace-time)."""
    return CH_MAX_DIM_TPU if jax.default_backend() == "tpu" else CH_MAX_DIM


def _ch_eligible(ssm: StateSpaceModel, nat1: jnp.ndarray) -> bool:
    """Unbatched, small-d, long-grid: the channelized path applies."""
    return (
        nat1.ndim == 2
        and ssm.state_transitions.ndim == 3
        and 1 <= ssm.state_dim <= ch_max_dim()
        and nat1.shape[0] >= CH_THRESHOLD
    )


def _make_filter_elements_ch(ssm: StateSpaceModel, nat1, nat2_prec):
    """Channelized `_make_filter_elements` (scalar [N] channels, chmat.py)."""
    from ..ops import chmat as cm

    d = ssm.state_dim
    a = cm.mat_to_ch(ssm.state_transitions)  # [N] channels
    b = cm.vec_to_ch(ssm.state_offsets)
    q = cm.mat_to_ch(ssm.process_covariances)
    th = cm.vec_to_ch(nat1)  # [N+1] channels
    lm = cm.mat_to_ch(nat2_prec)

    th0 = tuple(x[0] for x in th)
    lm0 = tuple(tuple(x[0] for x in row) for row in lm)
    th_r = tuple(x[1:] for x in th)
    lm_r = tuple(tuple(x[1:] for x in row) for row in lm)

    # element 0: site-updated prior (scalar channels, shape [])
    p0 = cm.mat_to_ch(ssm.initial_covariance)
    m0 = cm.vec_to_ch(ssm.initial_mean)
    ipl0_inv = cm.inv_ipl(p0, lm0)  # (I + P₀Λ₀)⁻¹ — PD-routed at any d
    c0 = cm.sym(cm.mm(ipl0_inv, p0))
    b0 = cm.mv(ipl0_inv, cm.vadd(m0, cm.mv(p0, th0)))
    a0 = cm.mzeros(d, m0[0])
    eta0 = cm.vzeros(d, m0[0])
    j0 = cm.mzeros(d, m0[0])

    # elements 1..N
    iql_inv = cm.inv_ipl(q, lm_r)  # (I + QΛ)⁻¹
    a_star = cm.mm(iql_inv, a)
    b_star = cm.mv(iql_inv, cm.vadd(b, cm.mv(q, th_r)))
    c_star = cm.sym(cm.mm(iql_inv, q))
    # (I+ΛQ)⁻¹ = (I+QΛ)⁻ᵀ
    ilq_inv = cm.mt(iql_inv)
    rhs = cm.vsub(th_r, cm.mv(lm_r, b))
    eta_star = cm.mv(cm.mt(a), cm.mv(ilq_inv, rhs))
    j_star = cm.sym(cm.mm(cm.mt(a), cm.mm(ilq_inv, cm.mm(lm_r, a))))

    def cat_m(first, rest):
        return tuple(
            tuple(
                jnp.concatenate([first[i][j][None], rest[i][j]])
                for j in range(d)
            )
            for i in range(d)
        )

    def cat_v(first, rest):
        return tuple(jnp.concatenate([first[i][None], rest[i]]) for i in range(d))

    return (
        cat_m(a0, a_star),
        cat_v(b0, b_star),
        cat_m(c0, c_star),
        cat_v(eta0, eta_star),
        cat_m(j0, j_star),
    )


def _elem_pack(a, b, c, eta, j):
    from ..ops import chmat as cm

    return cm.flatten_mat(a) + tuple(b) + cm.flatten_mat(c) + tuple(eta) + cm.flatten_mat(j)


def _elem_unpack(flat, d):
    from ..ops import chmat as cm

    dd = d * d
    a = cm.unflatten_mat(flat[:dd], d)
    b = tuple(flat[dd : dd + d])
    c = cm.unflatten_mat(flat[dd + d : 2 * dd + d], d)
    eta = tuple(flat[2 * dd + d : 2 * dd + 2 * d])
    j = cm.unflatten_mat(flat[2 * dd + 2 * d :], d)
    return a, b, c, eta, j


#: above this state dim, scan composes run on packed [d,d,nb] arrays
#: (ops/achmat.py) instead of d² separate scalar channels — the tuple form's
#: O(d³)-HLO matrix products make the d ≥ 4 graphs explode (161k-line HLO,
#: ~45 min first TPU compile for the d=4 GPR grad at 100k); the array form
#: keeps the per-compose graph O(d²) slices + O(1) vector ops
ARRAY_COMPOSE_MIN_DIM = 4


def _filter_compose_ch(d: int):
    """Channelized Lemma-7 composition (mirrors `_filter_compose`).

    Tuple-of-scalar-channels form, d ≤ 3 only; d ≥ 4 goes through the packed
    `_filter_compose_ach` + `blocked_assoc_scan_packed` path."""
    from ..ops import chmat as cm

    def fn(x, y):
        a_i, b_i, c_i, eta_i, j_i = _elem_unpack(x, d)
        a_j, b_j, c_j, eta_j, j_j = _elem_unpack(y, d)
        g = cm.inv_ipl(c_i, j_j)  # (I + C_i J_j)⁻¹, PSD×PSD — any d
        gt = cm.mt(g)
        ajg = cm.mm(a_j, g)
        a = cm.mm(ajg, a_i)
        b = cm.vadd(cm.mv(ajg, cm.vadd(b_i, cm.mv(c_i, eta_j))), b_j)
        c = cm.sym(cm.madd(cm.mm(ajg, cm.mm(c_i, cm.mt(a_j))), c_j))
        ait_gt = cm.mm(cm.mt(a_i), gt)
        eta = cm.vadd(cm.mv(ait_gt, cm.vsub(eta_j, cm.mv(j_j, b_i))), eta_i)
        j = cm.sym(cm.madd(cm.mm(ait_gt, cm.mm(j_j, a_i)), j_i))
        return _elem_pack(a, b, c, eta, j)

    return fn


def _unpack_filter_elem_packed(x: jnp.ndarray, d: int):
    """Packed ``[C, ...]`` filter element → (a, b, c, eta, j) array-channel
    views (static slices + reshapes — free under XLA fusion)."""
    dd = d * d
    rest = x.shape[1:]
    a = x[:dd].reshape((d, d) + rest)
    b = x[dd : dd + d]
    c = x[dd + d : 2 * dd + d].reshape((d, d) + rest)
    eta = x[2 * dd + d : 2 * dd + 2 * d]
    j = x[2 * dd + 2 * d :].reshape((d, d) + rest)
    return a, b, c, eta, j


def _pack_filter_elem(a, b, c, eta, j, d: int) -> jnp.ndarray:
    dd = d * d
    rest = b.shape[1:]
    return jnp.concatenate(
        [a.reshape((dd,) + rest), b, c.reshape((dd,) + rest), eta,
         j.reshape((dd,) + rest)],
        axis=0,
    )


def _filter_compose_ach(d: int):
    """Array-channel Lemma-7 composition on ONE packed ``[C, ...]`` operand
    (C = 3d² + 2d channels; same math as `_filter_compose_ch`).  Keeping the
    whole element a single array lets the blocked scan slice/update ONE
    buffer per step — the tuple form cost ~17k dynamic_update_slice ops per
    d=4 GPR grad step (see ops/blocked_scan.py::blocked_assoc_scan_packed)."""
    from ..ops import achmat as am

    def fn(x, y):
        a_i, b_i, c_i, eta_i, j_i = _unpack_filter_elem_packed(x, d)
        a_j, b_j, c_j, eta_j, j_j = _unpack_filter_elem_packed(y, d)
        g = am.ainv_ipl(c_i, j_j)
        ajg = am.amm(a_j, g)
        a = am.amm(ajg, a_i)
        b = am.amv(ajg, b_i + am.amv(c_i, eta_j)) + b_j
        c = am.asym(am.amm(ajg, am.amm(c_i, am.amt(a_j))) + c_j)
        ait_gt = am.amm(am.amt(a_i), am.amt(g))
        eta = am.amv(ait_gt, eta_j - am.amv(j_j, b_i)) + eta_i
        j = am.asym(am.amm(ait_gt, am.amm(j_j, a_i)) + j_i)
        return _pack_filter_elem(a, b, c, eta, j, d)

    return fn


def _to_ach_mat(x: jnp.ndarray) -> jnp.ndarray:
    """``[N, d, d]`` (or ``[d, d]``) → algebra-leading ``[d, d, N]`` / ``[d, d]``."""
    return jnp.moveaxis(x, (-2, -1), (0, 1))


def _to_ach_vec(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, 0)


def _make_filter_elements_ach(ssm: StateSpaceModel, nat1, nat2_prec):
    """Array-channel `_make_filter_elements_ch` (packed [d,d,N] algebra;
    same math, O(d²)-ops graph — the tuple form's O(d³) element build
    dominates the d ≥ 4 HLO)."""
    from ..ops import achmat as am

    d = ssm.state_dim
    a = _to_ach_mat(ssm.state_transitions)  # [d, d, N]
    b = _to_ach_vec(ssm.state_offsets)  # [d, N]
    q = _to_ach_mat(ssm.process_covariances)
    th = _to_ach_vec(nat1)  # [d, N+1]
    lm = _to_ach_mat(nat2_prec)  # [d, d, N+1]

    th0, th_r = th[:, 0], th[:, 1:]
    lm0, lm_r = lm[:, :, 0], lm[:, :, 1:]

    p0 = ssm.initial_covariance  # [d, d] — algebra-leading already
    m0 = ssm.initial_mean  # [d]
    ipl0_inv = am.ainv_ipl(p0, lm0)
    c0 = am.asym(am.amm(ipl0_inv, p0))
    b0 = am.amv(ipl0_inv, m0 + am.amv(p0, th0))

    iql_inv = am.ainv_ipl(q, lm_r)  # (I + QΛ)⁻¹
    a_star = am.amm(iql_inv, a)
    b_star = am.amv(iql_inv, b + am.amv(q, th_r))
    c_star = am.asym(am.amm(iql_inv, q))
    ilq_inv = am.amt(iql_inv)  # (I+ΛQ)⁻¹ = (I+QΛ)⁻ᵀ
    rhs = th_r - am.amv(lm_r, b)
    eta_star = am.amv(am.amt(a), am.amv(ilq_inv, rhs))
    j_star = am.asym(am.amm(am.amt(a), am.amm(ilq_inv, am.amm(lm_r, a))))

    zm = jnp.zeros_like(p0)
    zv = jnp.zeros_like(m0)
    a_all = jnp.concatenate([zm[..., None], a_star], axis=-1)
    b_all = jnp.concatenate([b0[..., None], b_star], axis=-1)
    c_all = jnp.concatenate([c0[..., None], c_star], axis=-1)
    eta_all = jnp.concatenate([zv[..., None], eta_star], axis=-1)
    j_all = jnp.concatenate([zm[..., None], j_star], axis=-1)
    return _pack_filter_elem(a_all, b_all, c_all, eta_all, j_all, d)


def _parallel_filter_ch(ssm: StateSpaceModel, nat1, nat2_prec) -> FilterResult:
    """Channelized parallel filter — everything on rank-1 [N] channels."""
    from ..ops import chmat as cm
    from ..ops.blocked_scan import blocked_assoc_scan

    d = ssm.state_dim
    eye_flat = tuple(1.0 if i == j else 0.0 for i in range(d) for j in range(d))
    ident = eye_flat + (0.0,) * d + (0.0,) * (d * d) + (0.0,) * d + (0.0,) * (d * d)
    if d >= ARRAY_COMPOSE_MIN_DIM:
        from ..ops.blocked_scan import blocked_assoc_scan_packed

        packed = _make_filter_elements_ach(ssm, nat1, nat2_prec)
        # d > 8: 3-instantiation graph (see blocked_assoc_scan_packed)
        big = {"cross_seq": True, "num_blocks": 512} if d >= 4 else {}
        out_p = blocked_assoc_scan_packed(
            _filter_compose_ach(d), packed, identity=ident, **big
        )
        _, b_cum_a, c_cum_a, _, _ = _unpack_filter_elem_packed(out_p, d)
    else:
        a_e, b_e, c_e, eta_e, j_e = _make_filter_elements_ch(ssm, nat1, nat2_prec)
        flat = _elem_pack(a_e, b_e, c_e, eta_e, j_e)
        out = blocked_assoc_scan(_filter_compose_ch(d), flat, identity=ident)
        _, b_cum, c_cum, _, _ = _elem_unpack(out, d)

    if d >= ARRAY_COMPOSE_MIN_DIM:
        # array-channel prediction pass (O(d²) graph)
        from ..ops import achmat as am

        f_means = b_cum_a  # [d, N+1]
        f_covs = c_cum_a  # [d, d, N+1]
        a = _to_ach_mat(ssm.state_transitions)
        b = _to_ach_vec(ssm.state_offsets)
        q = _to_ach_mat(ssm.process_covariances)
        pm_rest = am.amv(a, f_means[:, :-1]) + b
        pc_rest = am.amm(a, am.amm(f_covs[:, :, :-1], am.amt(a))) + q
        pred_m = jnp.concatenate([ssm.initial_mean[:, None], pm_rest], axis=-1)
        pred_p = jnp.concatenate(
            [ssm.initial_covariance[..., None], pc_rest], axis=-1
        )
        return FilterResult(
            means=jnp.moveaxis(f_means, 0, -1),
            covs=jnp.moveaxis(f_covs, (0, 1), (-2, -1)),
            pred_means=jnp.moveaxis(pred_m, 0, -1),
            pred_covs=jnp.moveaxis(pred_p, (0, 1), (-2, -1)),
        )

    f_means_ch = b_cum
    f_covs_ch = c_cum
    # one-step-ahead prediction from filtered (elementwise channels)
    a = cm.mat_to_ch(ssm.state_transitions)
    b = cm.vec_to_ch(ssm.state_offsets)
    q = cm.mat_to_ch(ssm.process_covariances)
    fm_prev = tuple(x[:-1] for x in f_means_ch)
    fc_prev = tuple(tuple(x[:-1] for x in row) for row in f_covs_ch)
    pm_rest = cm.vadd(cm.mv(a, fm_prev), b)
    pc_rest = cm.madd(cm.mm(a, cm.mm(fc_prev, cm.mt(a))), q)
    m0 = cm.vec_to_ch(ssm.initial_mean)
    p0 = cm.mat_to_ch(ssm.initial_covariance)
    pred_m = tuple(
        jnp.concatenate([m0[i][None], pm_rest[i]]) for i in range(d)
    )
    pred_p = tuple(
        tuple(jnp.concatenate([p0[i][j][None], pc_rest[i][j]]) for j in range(d))
        for i in range(d)
    )
    return FilterResult(
        means=cm.ch_to_vec(f_means_ch),
        covs=cm.ch_to_mat(f_covs_ch),
        pred_means=cm.ch_to_vec(pred_m),
        pred_covs=cm.ch_to_mat(pred_p),
    )


def parallel_filter(
    ssm: StateSpaceModel, nat1: jnp.ndarray, nat2_prec: jnp.ndarray
) -> FilterResult:
    """Information-form Kalman filter over sites, parallel in time."""
    if _ch_eligible(ssm, nat1):
        return _parallel_filter_ch(ssm, nat1, nat2_prec)
    elems = _make_filter_elements(ssm, nat1, nat2_prec)
    n_el = elems[0].shape[0]
    if n_el >= 4096:
        # long grids: the blocked slice-free scan layout — the stride-2
        # slice/pad tree of lax.associative_scan dominates both device
        # time and (with gradients) TPU compile time (ops/blocked_scan.py)
        from ..ops.blocked_scan import blocked_assoc_scan

        d = ssm.state_dim
        eye = jnp.eye(d, dtype=elems[0].dtype)
        zd = jnp.zeros((d,), elems[0].dtype)
        zdd = jnp.zeros((d, d), elems[0].dtype)
        _, b_cum, c_cum, _, _ = blocked_assoc_scan(
            _filter_compose, elems, identity=(eye, zd, zdd, zd, zdd)
        )
    else:
        _, b_cum, c_cum, _, _ = lax.associative_scan(_filter_compose, elems)
    f_means = jnp.moveaxis(b_cum, 0, -2)
    f_covs = jnp.moveaxis(c_cum, 0, -3)

    # one-step-ahead prediction from filtered (parallel, elementwise)
    pm_rest = (
        jnp.einsum("...ij,...j->...i", ssm.state_transitions, f_means[..., :-1, :])
        + ssm.state_offsets
    )
    pc_rest = (
        ssm.state_transitions @ f_covs[..., :-1, :, :] @ transpose_last(ssm.state_transitions)
        + ssm.process_covariances
    )
    pred_means = jnp.concatenate([ssm.initial_mean[..., None, :], pm_rest], axis=-2)
    pred_covs = jnp.concatenate(
        [ssm.initial_covariance[..., None, :, :], pc_rest], axis=-3
    )
    return FilterResult(f_means, f_covs, pred_means, pred_covs)


# ------------------------------------------------------------------- smoother
def _smoother_compose(e_j, e_i):
    """Reverse-scan composition: ``e_i`` is earlier in time than ``e_j``."""
    e_gain_i, g_i, l_i = e_i
    e_gain_j, g_j, l_j = e_j
    gain = e_gain_i @ e_gain_j
    g = jnp.einsum("...ij,...j->...i", e_gain_i, g_j) + g_i
    l = e_gain_i @ l_j @ transpose_last(e_gain_i) + l_i
    return gain, g, symmetrize(l)


def _smoother_compose_ch(d: int):
    """Channelized RTS compose (mirrors `_smoother_compose`; args follow
    the reverse-scan convention: first = later suffix, second = earlier)."""
    from ..ops import chmat as cm

    dd = d * d

    def unpack(flat):
        e = cm.unflatten_mat(flat[:dd], d)
        g = tuple(flat[dd : dd + d])
        l = cm.unflatten_mat(flat[dd + d :], d)
        return e, g, l

    def fn(x, y):
        e_j, g_j, l_j = unpack(x)  # later suffix
        e_i, g_i, l_i = unpack(y)  # earlier element
        gain = cm.mm(e_i, e_j)
        g = cm.vadd(cm.mv(e_i, g_j), g_i)
        l = cm.sym(cm.madd(cm.mm(e_i, cm.mm(l_j, cm.mt(e_i))), l_i))
        return cm.flatten_mat(gain) + tuple(g) + cm.flatten_mat(l)

    return fn


def _smoother_compose_ach(d: int):
    """Array-channel RTS compose on ONE packed ``[C, ...]`` operand
    (C = 2d² + d; same math/operand convention as `_smoother_compose_ch`)."""
    from ..ops import achmat as am

    dd = d * d

    def unpack(x):
        rest = x.shape[1:]
        return (
            x[:dd].reshape((d, d) + rest),
            x[dd : dd + d],
            x[dd + d :].reshape((d, d) + rest),
        )

    def fn(x, y):
        e_j, g_j, l_j = unpack(x)  # later suffix
        e_i, g_i, l_i = unpack(y)  # earlier element
        gain = am.amm(e_i, e_j)
        g = am.amv(e_i, g_j) + g_i
        l = am.asym(am.amm(e_i, am.amm(l_j, am.amt(e_i))) + l_i)
        rest = g.shape[1:]
        return jnp.concatenate(
            [gain.reshape((dd,) + rest), g, l.reshape((dd,) + rest)], axis=0
        )

    return fn


def _parallel_smoother_ch(ssm: StateSpaceModel, filt: FilterResult) -> SmootherResult:
    """Channelized RTS smoother — rank-1 [N] channels throughout."""
    from ..ops import chmat as cm
    from ..ops.blocked_scan import blocked_assoc_scan

    d = ssm.state_dim
    if d >= ARRAY_COMPOSE_MIN_DIM:
        # array-channel element build (O(d²) graph)
        from ..ops import achmat as am

        aa = _to_ach_mat(ssm.state_transitions)
        bb = _to_ach_vec(ssm.state_offsets)
        fm_a = _to_ach_vec(filt.means)  # [d, N+1]
        fc_a = _to_ach_mat(filt.covs)  # [d, d, N+1]
        pc_next_a = _to_ach_mat(filt.pred_covs[..., 1:, :, :])
        fm_ka = fm_a[:, :-1]
        fc_ka = fc_a[:, :, :-1]
        # E_k = P_k|k A_kᵀ (P_{k+1}^-)⁻¹ = ((P⁻)⁻¹ A P_k|k)ᵀ — P⁻ is PD
        e_ka = am.amt(am.amm(am.ainv_pd(pc_next_a), am.amm(aa, fc_ka)))
        g_ka = fm_ka - am.amv(e_ka, am.amv(aa, fm_ka) + bb)
        l_ka = am.asym(fc_ka - am.amm(e_ka, am.amm(aa, fc_ka)))
        e_alla = jnp.concatenate([e_ka, jnp.zeros_like(e_ka[:, :, :1])], axis=-1)
        g_alla = jnp.concatenate([g_ka, fm_a[:, -1:]], axis=-1)
        l_alla = jnp.concatenate([l_ka, fc_a[:, :, -1:]], axis=-1)

        from ..ops.blocked_scan import blocked_assoc_scan_packed

        dd = d * d
        n_all = g_alla.shape[-1]
        packed = jnp.concatenate(
            [e_alla.reshape(dd, n_all), g_alla, l_alla.reshape(dd, n_all)], axis=0
        )
        eye_flat = tuple(1.0 if i == j else 0.0 for i in range(d) for j in range(d))
        ident = eye_flat + (0.0,) * d + (0.0,) * dd
        big = {"cross_seq": True, "num_blocks": 512} if d >= 4 else {}
        out_p = blocked_assoc_scan_packed(
            _smoother_compose_ach(d), packed, identity=ident, reverse=True, **big
        )
        g_cum_a = out_p[dd : dd + d]
        l_cum_a = out_p[dd + d :].reshape(d, d, n_all)
        return SmootherResult(
            means=jnp.moveaxis(g_cum_a, 0, -1),
            covs=jnp.moveaxis(l_cum_a, (0, 1), (-2, -1)),
            gains=jnp.moveaxis(e_ka, (0, 1), (-2, -1)),
        )
    else:
        a = cm.mat_to_ch(ssm.state_transitions)
        b = cm.vec_to_ch(ssm.state_offsets)
        fm = cm.vec_to_ch(filt.means)
        fc = cm.mat_to_ch(filt.covs)
        pc_next = cm.mat_to_ch(filt.pred_covs[..., 1:, :, :])

        fm_k = tuple(x[:-1] for x in fm)
        fc_k = tuple(tuple(x[:-1] for x in row) for row in fc)

        # E_k = P_k|k A_kᵀ (P_{k+1}^-)⁻¹ = ((P⁻)⁻¹ A P_k|k)ᵀ — P⁻ is PD
        e_k = cm.mt(cm.msolve_pd(pc_next, cm.mm(a, fc_k)))
        g_k = cm.vsub(fm_k, cm.mv(e_k, cm.vadd(cm.mv(a, fm_k), b)))
        l_k = cm.sym(cm.msub(fc_k, cm.mm(e_k, cm.mm(a, fc_k))))

        def cat_m(rest, last):
            return tuple(
                tuple(jnp.concatenate([rest[i][j], last[i][j][None]]) for j in range(d))
                for i in range(d)
            )

        def cat_v(rest, last):
            return tuple(jnp.concatenate([rest[i], last[i][None]]) for i in range(d))

        fm_last = tuple(x[-1] for x in fm)
        fc_last = tuple(tuple(x[-1] for x in row) for row in fc)
        e_all = cat_m(e_k, cm.mzeros(d, fm_last[0]))
        g_all = cat_v(g_k, fm_last)
        l_all = cat_m(l_k, fc_last)

        flat = cm.flatten_mat(e_all) + tuple(g_all) + cm.flatten_mat(l_all)
    eye_flat = tuple(1.0 if i == j else 0.0 for i in range(d) for j in range(d))
    ident = eye_flat + (0.0,) * d + (0.0,) * (d * d)
    out = blocked_assoc_scan(
        _smoother_compose_ch(d), flat, identity=ident, reverse=True
    )
    dd = d * d
    g_cum = tuple(out[dd : dd + d])
    l_cum = cm.unflatten_mat(out[dd + d :], d)
    return SmootherResult(
        means=cm.ch_to_vec(g_cum),
        covs=cm.ch_to_mat(l_cum),
        gains=cm.ch_to_mat(e_k),
    )


def site_log_normalizer_ch(
    filt: FilterResult, nat1: jnp.ndarray, nat2_prec: jnp.ndarray
) -> jnp.ndarray:
    """Channelized `site_log_normalizer` (same closed form, scalar channels;
    ``(I+PΛ)⁻¹`` and ``log|I+PΛ|`` are PD-routed for any static d).

    d ≥ ARRAY_COMPOSE_MIN_DIM uses the packed array-channel algebra — the
    tuple form emits O(d³) separate HLO ops per product, which at d ≥ 10
    bloats the graph for no runtime benefit."""
    from ..ops import chmat as cm

    d = nat1.shape[-1]
    if d >= ARRAY_COMPOSE_MIN_DIM:
        from ..ops import achmat as am

        p = _to_ach_mat(filt.pred_covs)  # [d, d, N+1]
        m = _to_ach_vec(filt.pred_means)  # [d, N+1]
        th = _to_ach_vec(nat1)
        lm = _to_ach_mat(nat2_prec)
        ipl_inv = am.ainv_ipl(p, lm)
        logdet = am.alogdet_ipl(p, lm)
        m_prime = am.amv(ipl_inv, m)
        p_prime = am.amm(ipl_inv, p)
        per_step = (
            -0.5 * logdet
            - 0.5 * am.aquad_form(m, lm, m_prime)
            + am.avdot(th, m_prime)
            + 0.5 * am.aquad_form(th, p_prime, th)
        )
        return jnp.sum(per_step, axis=-1)
    p = cm.mat_to_ch(filt.pred_covs)
    m = cm.vec_to_ch(filt.pred_means)
    th = cm.vec_to_ch(nat1)
    lm = cm.mat_to_ch(nat2_prec)
    ipl_inv = cm.inv_ipl(p, lm)
    logdet = cm.logdet_ipl(p, lm)
    m_prime = cm.mv(ipl_inv, m)
    p_prime = cm.mm(ipl_inv, p)
    term_quad_m = -0.5 * cm.quad_form(m, lm, m_prime)
    term_cross = cm.vdot(th, m_prime)
    term_quad_t = 0.5 * cm.quad_form(th, p_prime, th)
    per_step = -0.5 * logdet + term_quad_m + term_cross + term_quad_t
    return jnp.sum(per_step, axis=-1)


def parallel_smoother(ssm: StateSpaceModel, filt: FilterResult) -> SmootherResult:
    """RTS smoother via reverse associative scan (S&GF 2020, §4)."""
    if (
        filt.means.ndim == 2
        and ssm.state_transitions.ndim == 3
        and 1 <= ssm.state_dim <= ch_max_dim()
        and filt.means.shape[0] >= CH_THRESHOLD
    ):
        return _parallel_smoother_ch(ssm, filt)
    a_t = jnp.moveaxis(ssm.state_transitions, -3, 0)
    b_t = jnp.moveaxis(ssm.state_offsets, -2, 0)
    fm_t = jnp.moveaxis(filt.means, -2, 0)  # [N+1, ..., d]
    fc_t = jnp.moveaxis(filt.covs, -3, 0)
    pc_next = jnp.moveaxis(filt.pred_covs, -3, 0)[1:]  # P_{k+1}^- for k=0..N-1

    # E_k = P_k|k A_kᵀ (P_{k+1}^-)⁻¹
    e_k = transpose_last(_solve(pc_next, a_t @ fc_t[:-1]))
    g_k = fm_t[:-1] - jnp.einsum(
        "...ij,...j->...i", e_k, jnp.einsum("...ij,...j->...i", a_t, fm_t[:-1]) + b_t
    )
    l_k = symmetrize(fc_t[:-1] - e_k @ a_t @ fc_t[:-1])

    # last element: identity on the final filtered marginal
    e_last = jnp.zeros_like(fc_t[-1])
    g_last = fm_t[-1]
    l_last = fc_t[-1]

    elems = (
        jnp.concatenate([e_k, e_last[None]], axis=0),
        jnp.concatenate([g_k, g_last[None]], axis=0),
        jnp.concatenate([l_k, l_last[None]], axis=0),
    )

    def op(a, b):
        # With reverse=True, associative_scan folds from the right: ``a`` is
        # the already-combined later suffix, ``b`` the earlier element.
        return _smoother_compose(a, b)

    if elems[0].shape[0] >= 4096:
        from ..ops.blocked_scan import blocked_assoc_scan

        d = a_t.shape[-1]
        eye = jnp.eye(d, dtype=elems[0].dtype)
        zd = jnp.zeros((d,), elems[0].dtype)
        zdd = jnp.zeros((d, d), elems[0].dtype)
        _, g_cum, l_cum = blocked_assoc_scan(
            op, elems, identity=(eye, zd, zdd), reverse=True
        )
    else:
        _, g_cum, l_cum = lax.associative_scan(op, elems, reverse=True)
    return SmootherResult(
        means=jnp.moveaxis(g_cum, 0, -2),
        covs=jnp.moveaxis(l_cum, 0, -3),
        gains=jnp.moveaxis(e_k, 0, -3),
    )


def filter_smoother_with_sites(
    ssm: StateSpaceModel, nat1: jnp.ndarray, nat2_prec: jnp.ndarray
) -> Tuple[FilterResult, SmootherResult]:
    filt = parallel_filter(ssm, nat1, nat2_prec)
    return filt, parallel_smoother(ssm, filt)


# ------------------------------------------------------------- log normalizer
def site_log_normalizer(
    filt: FilterResult, nat1: jnp.ndarray, nat2_prec: jnp.ndarray
) -> jnp.ndarray:
    """``log ∫ p(x) Π_k φ_k(x_k) dx`` — the evidence of the site-augmented model.

    Chain rule over predicted marginals (all parallel):

        ``log Z = Σ_k log ∫ N(x; m_k⁻, P_k⁻) exp(θ_kᵀx − ½xᵀΛ_kx) dx``

    with the closed-form Gaussian integral

        ``−½log|I+PΛ| − ½mᵀΛ(I+PΛ)⁻¹m + θᵀ(I+PΛ)⁻¹m + ½θᵀ(I+PΛ)⁻¹Pθ``.

    For Gaussian observations add the per-datum constants
    ``−½ yᵀR⁻¹y − ½log|2πR|`` to recover ``log p(y)``
    (kalman_filter.py:184-255 equivalent).
    """
    if (
        nat1.ndim == 2
        and 1 <= nat1.shape[-1] <= ch_max_dim()
        and nat1.shape[0] >= CH_THRESHOLD
    ):
        return site_log_normalizer_ch(filt, nat1, nat2_prec)
    d = nat1.shape[-1]
    eye = jnp.eye(d, dtype=nat1.dtype)
    p = filt.pred_covs
    m = filt.pred_means
    ipl = eye + p @ nat2_prec
    from ..utils.linalg import logdet_pos

    logdet = logdet_pos(ipl)  # LU-free: TPU has no f64 slogdet
    ipl_inv_m = _solve(ipl, m[..., None])[..., 0]
    ipl_inv_p = _solve(ipl, p)
    term_quad_m = -0.5 * jnp.einsum("...i,...ij,...j->...", m, nat2_prec, ipl_inv_m)
    term_cross = jnp.einsum("...i,...i->...", nat1, ipl_inv_m)
    term_quad_t = 0.5 * jnp.einsum("...i,...ij,...j->...", nat1, ipl_inv_p, nat1)
    per_step = -0.5 * logdet + term_quad_m + term_cross + term_quad_t
    return jnp.sum(per_step, axis=-1)


# ---------------------------------------------------------------- posteriors
def posterior_ssm_from_smoothed(
    ssm: StateSpaceModel, smooth: SmootherResult, jitter: float = 0.0
) -> StateSpaceModel:
    """Convert smoothed marginals + RTS gains into a forward posterior SSM.

    Equivalent of ``BaseKalmanFilter.posterior_state_space_model``
    (kalman_filter.py:109-182), which goes through the sequential UDU'
    banded factorization.  Here we use the pairwise smoothed joints:
    ``Cov(x_k, x_{k+1}|y) = E_k S_{k+1}``, so

        ``Ā_k = S_{k+1} E_kᵀ S_k⁻¹``,
        ``b̄_k = m̄_{k+1} − Ā_k m̄_k``,
        ``Q̄_k = S_{k+1} − Ā_k E_k S_{k+1}``  (all parallel over k).

    ``jitter`` defaults to 0: posterior process covariances are legitimately
    tiny over small gaps (Q ~ dt³ for Matern32), so even 1e-10 jitter is a
    large *relative* perturbation and visibly shifts KL(q‖p).  Callers that
    only sample/predict (and must survive Q=0 deterministic chains) pass
    ``default_jitter()`` explicitly.
    """
    s = smooth.covs
    m = smooth.means
    e = smooth.gains
    d = s.shape[-1]
    eye = jnp.eye(d, dtype=s.dtype)

    s_k = s[..., :-1, :, :] + jitter * eye
    s_next = s[..., 1:, :, :]
    cross = matmul_small(e, s_next)  # Cov(x_k, x_{k+1}|y)
    a_post = transpose_last(_solve(s_k, cross))
    b_post = m[..., 1:, :] - jnp.einsum("...ij,...j->...i", a_post, m[..., :-1, :])
    q_post = symmetrize(s_next - matmul_small(a_post, cross))
    chol_q = chol_psd(q_post + jitter * eye)
    return StateSpaceModel(
        initial_mean=m[..., 0, :],
        chol_initial_covariance=chol_psd(s[..., 0, :, :] + jitter * eye),
        state_transitions=a_post,
        state_offsets=b_post,
        chol_process_covariances=chol_q,
    )
