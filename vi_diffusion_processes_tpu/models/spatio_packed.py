"""Packed (plane-layout) hot loop for spatio-temporal CVI site updates.

``SpatioTemporalSparseCVI.update_sites`` (spatio_temporal_variational.py:
509-553) re-derives, at EVERY site iteration, a stack of loop-invariant
quantities — the prior precision (``dist_p.precision()`` at ``[Mt, d, d]``),
the Markov two-sided conditional statistics at all N observation inputs
(``conditional_statistics`` at ``[N, d, 2d]``), the spatial conditional
weights, and a ``[N, 7, 7]`` Cholesky whose only use is a quadratic form —
and pushes ``[N, 2d, 2d]`` tiny-matrix products plus a 2d²-channel scatter
through the TPU's padded small-block layout.

This module packs the whole step into TPU-native planes:

* **pack time** (once per dataset/hyperparameters): all invariants above,
  reduced to per-point vectors — the combined projection ``u_n = P_nᵀa_n``
  (which serves BOTH the f-prediction and the site back-projection: the
  reference's ``proj`` of spatio_temporal_variational.py:479-507 equals
  ``u_nᵀ``), the scalar variance floors ``κ_n + a_nᵀT_n a_n``, and the
  quadratic-form weight planes ``[N, C]`` over the pairwise-covariance
  columns.
* **per step**: channel naturals → UDU' → marginals (the CVI-DP channel
  engine, :func:`..models.cvi_dp_packed_ch.naturals_to_marginals_ch`),
  one ``[Mt+1, C]`` pairwise plane, one row-gather, elementwise VE
  gradients, and a cumulative-sum segment reduction (sorted time inputs)
  instead of a 2d²-wide scatter.

Equivalence vs the generic model is tested in
``tests/unit/test_spatio_packed.py``.  Requires sorted observation times
and a single spatial output per input row (the model's own layout).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import chmat as cm
from .cvi_dp_packed_ch import naturals_to_marginals_ch
from .spatio_temporal import SpatioTemporalSparseCVI

__all__ = [
    "PackedSpatioCache",
    "PackedSpatioState",
    "pack_spatio",
    "unpack_spatio",
    "packed_spatio_site_step",
]


def _sym_cols(two_d: int):
    """Upper-triangle (i ≤ j) column order of a symmetric [2d, 2d] block."""
    return [(i, j) for i in range(two_d) for j in range(i, two_d)]


class PackedSpatioCache(struct.PyTreeNode):
    """Loop-invariant per-dataset precomputations (see module docstring)."""

    p_theta_diag: tuple  # Mat channels [Mt], f64: −½·prior precision diag
    p_theta_sub: tuple  # Mat channels [Mt−1], f64: −prior precision sub
    u: jnp.ndarray  # [N, 2d]  combined projection P_nᵀ a_n
    uu: jnp.ndarray  # [N, C2]  u_i·u_j upper-triangle (off-diag doubled)
    var_floor: jnp.ndarray  # [N]  κ_n + a_nᵀ T_n a_n
    idx: jnp.ndarray  # [N]  pairwise-row index per observation
    seg_starts: jnp.ndarray  # [Mt+2]  segment boundaries in the sorted inputs
    init_mean: jnp.ndarray  # [d]  prior initial mean (pseudo-end rows)
    init_cov: jnp.ndarray  # [d, d]  prior initial covariance
    y: jnp.ndarray  # [N]  observations


class PackedSpatioState(struct.PyTreeNode):
    """Mutable site state: nat1 as its natural ``[Mt+1, 2d]`` plane and
    nat2 as the symmetric-fold plane ``[Mt+1, C2]``."""

    nat1: jnp.ndarray
    nat2_sym: jnp.ndarray


def _fold_sym(mat: jnp.ndarray) -> jnp.ndarray:
    """[..., 2d, 2d] symmetric → [..., C2] upper-triangle columns (one
    gather on the flattened trailing axes)."""
    two_d = mat.shape[-1]
    flat_idx = np.asarray([i * two_d + j for i, j in _sym_cols(two_d)])
    return jnp.reshape(mat, mat.shape[:-2] + (two_d * two_d,))[..., flat_idx]


def _unfold_sym(plane: jnp.ndarray, two_d: int) -> jnp.ndarray:
    """[..., C2] → [..., 2d, 2d] symmetric (one gather)."""
    col_of = {}
    for c, (i, j) in enumerate(_sym_cols(two_d)):
        col_of[(i, j)] = c
        col_of[(j, i)] = c
    idx = np.asarray(
        [[col_of[(i, j)] for j in range(two_d)] for i in range(two_d)]
    )
    return plane[..., idx]


def pack_spatio(
    model: SpatioTemporalSparseCVI, input_data
) -> Tuple[PackedSpatioCache, PackedSpatioState]:
    """Precompute the loop invariants for ``input_data`` (sorted times)."""
    from ..ssm.conditionals import conditional_statistics
    from ..utils.linalg import matvec_small, transpose_last

    inputs, observations = input_data
    x_space, t = inputs[..., :-1], inputs[..., -1]
    kernel = model.kernel
    d = kernel.state_dim
    mt = model.inducing_time.shape[0]

    # two-sided Markov conditional statistics at the observation times
    p, t_cond, idx = conditional_statistics(t, model.inducing_time, kernel)

    # combined state→f projection a_n [d] (spatial conditional × emission)
    a = kernel.state_to_space_conditional_projection(inputs)[..., 0, :]  # [N, d]
    u = matvec_small(transpose_last(p), a)  # [N, 2d] = P_nᵀ a_n

    # scalar variance floor: κ_n = knn − k_mnᵀKmm⁻¹k_mn, plus a_nᵀT_n a_n
    ks = kernel.kernel_space
    kmn = ks(kernel.inducing_space, x_space)  # [Ms, N]
    kmm = ks(kernel.inducing_space)
    knn = ks(x_space, full_cov=False)
    chol_kmm = jnp.linalg.cholesky(kmm)
    lk = jax.scipy.linalg.solve_triangular(chol_kmm, kmn, lower=True)
    kappa = knn - jnp.sum(lk**2, axis=0)
    at_a = matvec_small(t_cond, a)
    var_floor = kappa + jnp.sum(a * at_a, axis=-1)

    two_d = 2 * d
    cols = _sym_cols(two_d)
    uu = jnp.stack(
        [u[:, i] * u[:, j] * (1.0 if i == j else 2.0) for i, j in cols], axis=-1
    )

    # segment boundaries of the sorted observation times (idx ascending)
    seg_starts = jnp.searchsorted(idx, jnp.arange(mt + 2))

    # prior precision → −½ diag / −sub channels (f64 like the CVI-DP cache)
    f64 = jnp.float64 if jax.config.jax_enable_x64 else t.dtype
    prec = jax.tree_util.tree_map(
        lambda z: z.astype(f64), model.dist_p
    ).precision()
    p_theta_diag = cm.mat_to_ch(-0.5 * prec.diag)
    p_theta_sub = cm.mat_to_ch(-prec.sub)

    batch_shape = model.inducing_time.shape[:-1]
    init_mean = kernel.initial_mean(batch_shape).astype(t.dtype)
    init_cov = kernel.initial_covariance(model.inducing_time[..., :1]).astype(
        t.dtype
    )

    cache = PackedSpatioCache(
        p_theta_diag=p_theta_diag,
        p_theta_sub=p_theta_sub,
        u=u,
        uu=uu,
        var_floor=var_floor,
        idx=idx,
        seg_starts=seg_starts,
        init_mean=init_mean,
        init_cov=init_cov,
        y=observations[..., 0],
    )
    state = PackedSpatioState(nat1=model.nat1, nat2_sym=_fold_sym(model.nat2))
    return cache, state


def unpack_spatio(
    model: SpatioTemporalSparseCVI, state: PackedSpatioState
) -> SpatioTemporalSparseCVI:
    two_d = 2 * model.kernel.state_dim
    return model.replace(
        nat1=state.nat1, nat2=_unfold_sym(state.nat2_sym, two_d)
    )


def _dist_q_marginal_channels(model, cache, state, compute_dtype):
    """Site naturals + prior → posterior marginal/cross channels.

    Mirrors ``SpatioTemporalSparseCVI.dist_q``
    (spatio_temporal_variational.py:447-476) on channels; returns
    ``(means [d][Mt], covs [d][d][Mt], cross [d][d][Mt−1])`` in
    ``compute_dtype`` where ``cross[i][j] = Cov(x_{k+1}, x_k)[i, j]``.
    """
    d = model.kernel.state_dim
    f64 = cache.p_theta_diag[0][0].dtype
    nat1 = state.nat1.astype(f64)
    nat2t = _unfold_sym(state.nat2_sym, 2 * d).astype(f64)

    nat1_diag = nat1[1:, :d] + nat1[:-1, d:]
    nat2_diag = nat2t[1:, :d, :d] + nat2t[:-1, d:, d:]
    nat2_sub = nat2t[1:-1, d:, :d]

    nat1_ch = cm.vec_to_ch(nat1_diag)
    theta_diag = cm.madd(cache.p_theta_diag, cm.mat_to_ch(nat2_diag))
    theta_sub = cm.madd(cache.p_theta_sub, cm.mscale(cm.mat_to_ch(nat2_sub), 2.0))

    (a_c, _), means, covs = naturals_to_marginals_ch(
        nat1_ch, theta_diag, theta_sub, compute_dtype
    )
    covs_head = tuple(tuple(x[:-1] for x in row) for row in covs)
    cross = cm.mm(a_c, covs_head)  # Cov(x_{k+1}, x_k) = A_k P_k
    return means, covs, cross


def _pairwise_planes(cache, means, covs, cross, d, compute_dtype):
    """Assemble the prior-extended pairwise mean plane ``[Mt+1, 2d]`` and
    the symmetric pairwise covariance plane ``[Mt+1, C2]``
    (ssm/conditionals.py::pairwise_marginals, column layout)."""
    im = cache.init_mean.astype(compute_dtype)
    ic = cache.init_cov.astype(compute_dtype)

    def col_mean(i):
        if i < d:  # earlier state of the pair: prior-extended at the front
            return jnp.concatenate([im[i][None], means[i]])
        i -= d  # later state: prior-extended at the back
        return jnp.concatenate([means[i], im[i][None]])

    mean_plane = jnp.stack([col_mean(i) for i in range(2 * d)], axis=-1)

    zero = jnp.zeros((1,), compute_dtype)

    def col_cov(i, j):
        if i < d and j < d:  # P₋ block
            return jnp.concatenate([ic[i, j][None], covs[i][j]])
        if i < d <= j:  # Cov(x_{k−1}, x_k) = crossᵀ block
            jj = j - d
            return jnp.concatenate([zero, cross[jj][i], zero])
        ii, jj = i - d, j - d  # P₊ block
        return jnp.concatenate([covs[ii][jj], ic[ii, jj][None]])

    cov_plane = jnp.stack(
        [col_cov(i, j) for i, j in _sym_cols(2 * d)], axis=-1
    )
    return mean_plane, cov_plane


def packed_spatio_site_step(
    model: SpatioTemporalSparseCVI,
    cache: PackedSpatioCache,
    state: PackedSpatioState,
    compute_dtype=None,
) -> PackedSpatioState:
    """One CVI site update on planes — ``update_sites``
    (spatio_temporal_variational.py:509-553) with every per-step tensor in
    a lane-friendly ``[rows, cols]`` layout."""
    d = model.kernel.state_dim
    if compute_dtype is None:
        compute_dtype = model.inducing_time.dtype
    means, covs, cross = _dist_q_marginal_channels(
        model, cache, state, compute_dtype
    )
    mean_plane, cov_plane = _pairwise_planes(
        cache, means, covs, cross, d, compute_dtype
    )

    g_mean = jnp.take(mean_plane, cache.idx, axis=0)  # [N, 2d]
    g_cov = jnp.take(cov_plane, cache.idx, axis=0)  # [N, C2]
    u = cache.u.astype(compute_dtype)
    uu = cache.uu.astype(compute_dtype)
    f_mu = jnp.sum(u * g_mean, axis=-1)
    f_var = cache.var_floor.astype(compute_dtype) + jnp.sum(uu * g_cov, axis=-1)

    y = cache.y.astype(compute_dtype)

    def ve_of_eta(eta1, eta2):
        mu = eta1
        var = eta2 - eta1**2
        return jnp.sum(
            model.likelihood.variational_expectations(
                mu[:, None], var[:, None], y[:, None]
            )
        )

    g1, g2 = jax.grad(ve_of_eta, argnums=(0, 1))(f_mu, f_var + f_mu**2)

    # site columns: θ₁ = g1·u, θ₂ = g2·(u uᵀ) — the uu plane carries
    # doubled off-diagonals for the quadratic form, so scale them back
    site_cols = jnp.concatenate(
        [g1[:, None] * u, g2[:, None] * uu * _sym_scale(d, compute_dtype)],
        axis=-1,
    )

    # sorted-segment reduction: cumulative sum + boundary differences
    cs = jnp.concatenate(
        [jnp.zeros((1, site_cols.shape[-1]), compute_dtype),
         jnp.cumsum(site_cols, axis=0)]
    )
    starts = cache.seg_starts
    summed = cs[starts[1:]] - cs[starts[:-1]]  # [Mt+1, 2d + C2]

    lr = model.learning_rate
    dtype = state.nat1.dtype
    new_nat1 = (1.0 - lr) * state.nat1 + lr * summed[:, : 2 * d].astype(dtype)
    new_nat2 = (1.0 - lr) * state.nat2_sym + lr * summed[:, 2 * d :].astype(dtype)
    return PackedSpatioState(nat1=new_nat1, nat2_sym=new_nat2)


def _sym_scale(d, dtype):
    """Undo the off-diagonal doubling of the ``uu`` plane for the site θ₂
    columns (the plane stores u_iu_j·2 off-diagonal for the quadratic form;
    θ₂'s symmetric fold wants plain u_iu_j)."""
    return jnp.asarray(
        [1.0 if i == j else 0.5 for i, j in _sym_cols(2 * d)], dtype
    )
