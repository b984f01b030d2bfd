"""Block-tridiagonal (BTD) linear algebra — the TPU-native replacement for the
reference's C++ ``banded_matrices`` custom-op library.

The reference stores banded matrices densely as ``[bandwidth, N·d]`` and calls
C++ kernels (``cholesky_band``, ``solve_triang_mat``,
``inverse_from_cholesky_band``, … — see SURVEY.md §2.1, imported at
``markovflow/block_tri_diag.py:22-31``).  On TPU we instead keep the *block*
layout directly — a pair of stacked small matrices:

* ``diag``: ``[..., N, d, d]`` — the block diagonal
* ``sub``:  ``[..., N-1, d, d]`` — the lower block sub-diagonal
  (``sub[k] = K[k+1, k]``)

which removes the reference's ``band_to_block``/``block_to_band`` conversions
entirely, keeps every operation a batched ``d×d`` matmul (MXU-friendly once
batched), and is differentiable by construction (JAX traces through
``lax.scan``; no hand-written C++ gradients needed, unlike
``banded_matrices``' registered TF gradients).

Sequential recursions (Cholesky, UDU', Takahashi sparse inverse) are
implemented as ``lax.scan`` — O(N) depth but fully fused by XLA.  The affine
recursions (triangular solves) additionally have O(log N)-depth
``jax.lax.associative_scan`` fast paths used on TPU for long grids.

Time axis convention: axis ``-3`` for block stacks, ``-2`` for vector stacks.
Arbitrary leading batch dimensions are supported everywhere.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.linalg import transpose_last, tri_solve

__all__ = [
    "BTD",
    "btd_to_dense",
    "btd_from_dense",
    "btd_matvec",
    "btd_add",
    "btd_scale",
    "btd_cholesky",
    "btd_chol_solve_vec",
    "btd_tri_solve_vec",
    "btd_logdet_from_chol",
    "btd_blocks_of_inverse",
    "btd_udu",
    "btd_solve_sym_vec",
]


class BTD(NamedTuple):
    """A symmetric (or lower-triangular) block-tridiagonal matrix.

    For symmetric use the upper sub-diagonal is implied (``sub[k]ᵀ``); for
    Cholesky factors ``diag`` blocks are lower-triangular and ``sub`` is the
    lower block sub-diagonal of the factor.
    """

    diag: jnp.ndarray  # [..., N, d, d]
    sub: jnp.ndarray  # [..., N-1, d, d]

    @property
    def num_blocks(self) -> int:
        return self.diag.shape[-3]

    @property
    def block_dim(self) -> int:
        return self.diag.shape[-1]

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.diag.shape[:-3]


def btd_to_dense(m: BTD, symmetric: bool = True) -> jnp.ndarray:
    """Densify to ``[..., N·d, N·d]`` (debug/test only — the equivalent of the
    reference's ``unpack_banded_matrix_to_dense``, block_tri_diag.py:158)."""
    n, d = m.num_blocks, m.block_dim
    batch = m.batch_shape
    out = jnp.zeros(batch + (n, d, n, d), dtype=m.diag.dtype)
    idx = jnp.arange(n)
    out = out.at[..., idx, :, idx, :].set(jnp.moveaxis(m.diag, -3, 0) if batch else m.diag)
    if n > 1:
        idx1 = jnp.arange(1, n)
        sub_moved = jnp.moveaxis(m.sub, -3, 0) if batch else m.sub
        out = out.at[..., idx1, :, idx1 - 1, :].set(sub_moved)
        if symmetric:
            out = out.at[..., idx1 - 1, :, idx1, :].set(transpose_last(sub_moved))
    return out.reshape(batch + (n * d, n * d))


def btd_from_dense(dense: jnp.ndarray, n: int, d: int) -> BTD:
    """Extract the in-band blocks of a dense ``[..., N·d, N·d]`` matrix."""
    batch = dense.shape[:-2]
    blocks = dense.reshape(batch + (n, d, n, d))
    idx = jnp.arange(n)
    diag = blocks[..., idx, :, idx, :]
    if batch:
        diag = jnp.moveaxis(diag, 0, -3)
    idx1 = jnp.arange(1, n)
    sub = blocks[..., idx1, :, idx1 - 1, :]
    if batch:
        sub = jnp.moveaxis(sub, 0, -3)
    return BTD(diag=diag, sub=sub)


def btd_matvec(m: BTD, vec: jnp.ndarray, symmetric: bool = True) -> jnp.ndarray:
    """``K @ x`` for ``x: [..., N, d]`` — fully parallel batched matmuls.

    Equivalent of ``BlockTriDiagonal.dense_mult`` (block_tri_diag.py:175).
    """
    y = jnp.einsum("...ij,...j->...i", m.diag, vec)
    lower = jnp.einsum("...ij,...j->...i", m.sub, vec[..., :-1, :])
    y = y.at[..., 1:, :].add(lower)
    if symmetric:
        upper = jnp.einsum("...ji,...j->...i", m.sub, vec[..., 1:, :])
        y = y.at[..., :-1, :].add(upper)
    return y


def btd_add(a: BTD, b: BTD) -> BTD:
    return BTD(diag=a.diag + b.diag, sub=a.sub + b.sub)


def btd_scale(a: BTD, s) -> BTD:
    return BTD(diag=a.diag * s, sub=a.sub * s)


def _scan_time_first(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.moveaxis(x, axis, 0)


def btd_cholesky(m: BTD) -> BTD:
    """Blocked Cholesky ``K = L Lᵀ`` of a symmetric PD block-tridiagonal matrix.

    The factor ``L`` is lower block *bidiagonal*:

        ``L₀ L₀ᵀ = D₀``,
        ``Cₖ = Bₖ Lₖ⁻ᵀ``,
        ``Lₖ₊₁ Lₖ₊₁ᵀ = Dₖ₊₁ − Cₖ Cₖᵀ``.

    TPU-native equivalent of the C++ ``cholesky_band``
    (block_tri_diag.py:428-440).  Sequential over N inside one fused scan.
    """
    diag_t = _scan_time_first(m.diag, -3)  # [N, ..., d, d]
    sub_t = _scan_time_first(m.sub, -3)  # [N-1, ..., d, d]

    l0 = jnp.linalg.cholesky(diag_t[0])

    def step(l_prev, inputs):
        b_k, d_next = inputs
        # C_k = B_k L_k^{-T}  ⇔  C_kᵀ = L_k^{-1} B_kᵀ
        c_k = transpose_last(tri_solve(l_prev, transpose_last(b_k)))
        schur = d_next - c_k @ transpose_last(c_k)
        l_next = jnp.linalg.cholesky(schur)
        return l_next, (l_next, c_k)

    _, (l_rest, c_all) = lax.scan(step, l0, (sub_t, diag_t[1:]))
    l_diag = jnp.concatenate([l0[None], l_rest], axis=0)
    return BTD(
        diag=jnp.moveaxis(l_diag, 0, -3),
        sub=jnp.moveaxis(c_all, 0, -3),
    )


def btd_tri_solve_vec(l: BTD, rhs: jnp.ndarray, *, transpose: bool = False) -> jnp.ndarray:
    """Solve ``L x = rhs`` (or ``Lᵀ x = rhs``) for lower block-bidiagonal ``L``.

    ``rhs: [..., N, d]``.  Equivalent of the C++ ``solve_triang_mat``
    (block_tri_diag.py:339-350).
    """
    ld_t = _scan_time_first(l.diag, -3)
    ls_t = _scan_time_first(l.sub, -3)
    rhs_t = _scan_time_first(rhs, -2)

    if not transpose:
        x0 = tri_solve(ld_t[0], rhs_t[0][..., None])[..., 0]

        def step(x_prev, inputs):
            c_k, l_next, r_next = inputs
            resid = r_next - jnp.einsum("...ij,...j->...i", c_k, x_prev)
            x_next = tri_solve(l_next, resid[..., None])[..., 0]
            return x_next, x_next

        _, xs = lax.scan(step, x0, (ls_t, ld_t[1:], rhs_t[1:]))
        out = jnp.concatenate([x0[None], xs], axis=0)
    else:
        # Lᵀ is upper block bidiagonal: backward substitution.
        xn = tri_solve(ld_t[-1], rhs_t[-1][..., None], transpose=True)[..., 0]

        def step(x_next, inputs):
            c_k, l_k, r_k = inputs
            resid = r_k - jnp.einsum("...ji,...j->...i", c_k, x_next)
            x_k = tri_solve(l_k, resid[..., None], transpose=True)[..., 0]
            return x_k, x_k

        _, xs = lax.scan(step, xn, (ls_t, ld_t[:-1], rhs_t[:-1]), reverse=True)
        out = jnp.concatenate([xs, xn[None]], axis=0)
    return jnp.moveaxis(out, 0, -2)


def btd_chol_solve_vec(l: BTD, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve ``(L Lᵀ) x = rhs`` given the BTD Cholesky factor."""
    return btd_tri_solve_vec(l, btd_tri_solve_vec(l, rhs), transpose=True)


def btd_logdet_from_chol(l: BTD) -> jnp.ndarray:
    """``log |L Lᵀ| = 2 Σ log diag(L)`` (block_tri_diag.py:353)."""
    return 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(l.diag, axis1=-2, axis2=-1))), axis=(-1, -2)
    )


def btd_blocks_of_inverse(l: BTD) -> BTD:
    """In-band blocks of ``(L Lᵀ)⁻¹`` from the BTD Cholesky factor ``L``.

    Takahashi-style backward block recursion — the TPU-native equivalent of
    the C++ ``inverse_from_cholesky_band`` (block_tri_diag.py:318-331):

        ``Σ_NN = L_N⁻ᵀ L_N⁻¹``
        ``G_k  = −L_k⁻ᵀ C_kᵀ``
        ``Σ_{k,k+1} = G_k Σ_{k+1,k+1}``  (returned transposed, as ``sub``)
        ``Σ_kk = L_k⁻ᵀ L_k⁻¹ + G_k Σ_{k+1,k+1} G_kᵀ``

    Returns a BTD with ``diag[k] = Σ_kk`` and ``sub[k] = Σ_{k+1,k}``.
    This is exact for block-tridiagonal matrices because the Cholesky factor
    is block bidiagonal.
    """
    ld_t = _scan_time_first(l.diag, -3)
    ls_t = _scan_time_first(l.sub, -3)
    d = l.block_dim
    eye = jnp.eye(d, dtype=l.diag.dtype)

    def inv_from_chol(lk):
        linv = tri_solve(lk, jnp.broadcast_to(eye, lk.shape))
        return transpose_last(linv) @ linv

    sig_n = inv_from_chol(ld_t[-1])

    def step(sig_next, inputs):
        l_k, c_k = inputs
        # G_k = -L_k^{-T} C_kᵀ
        g_k = -tri_solve(l_k, transpose_last(c_k), transpose=True)
        cross = g_k @ sig_next  # Σ_{k,k+1}
        sig_k = inv_from_chol(l_k) + cross @ transpose_last(g_k)
        return sig_k, (sig_k, transpose_last(cross))

    _, (sig_rest, sub_rest) = lax.scan(step, sig_n, (ld_t[:-1], ls_t), reverse=True)
    diag = jnp.concatenate([sig_rest, sig_n[None]], axis=0)
    return BTD(diag=jnp.moveaxis(diag, 0, -3), sub=jnp.moveaxis(sub_rest, 0, -3))


def btd_udu(k: BTD) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factor a symmetric PD BTD matrix as ``K = U D Uᵀ`` with unit upper
    block-bidiagonal ``U``.

    Returns ``(d_blocks [..., N, d, d], u_super [..., N-1, d, d])`` where
    ``u_super[k] = U[k, k+1]``.  Backward recursion
    (``D_k = K_kk − K_{k,k+1} D_{k+1}⁻¹ K_{k,k+1}ᵀ``) — equivalent of
    ``SymmetricBlockTriDiagonal.upper_diagonal_lower``
    (block_tri_diag.py:442-534), which is how a posterior precision is
    converted back into SSM transition form (SpInGP: ``K = A⁻ᵀ Q⁻¹ A⁻¹``).
    """
    kd_t = _scan_time_first(k.diag, -3)
    ks_t = _scan_time_first(k.sub, -3)

    d_n = kd_t[-1]

    def step(d_next, inputs):
        k_kk, b_k = inputs  # b_k = K[k+1,k]  ⇒  K[k,k+1] = b_kᵀ
        l_next = jnp.linalg.cholesky(d_next)
        # U_k = K[k,k+1] D_{k+1}^{-1}  ⇒  U_kᵀ = D_{k+1}^{-1} b_k
        ut_k = tri_solve(l_next, tri_solve(l_next, b_k), transpose=True)
        d_k = k_kk - transpose_last(ut_k) @ b_k
        return d_k, (d_k, transpose_last(ut_k))

    _, (d_rest, u_rest) = lax.scan(step, d_n, (kd_t[:-1], ks_t), reverse=True)
    d_blocks = jnp.concatenate([d_rest, d_n[None]], axis=0)
    return jnp.moveaxis(d_blocks, 0, -3), jnp.moveaxis(u_rest, 0, -3)


def btd_udu_parallel_dense(k: BTD, num_windows: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parallel block UDU' for arbitrary ``d`` via the Schur-segment
    composition (same math as :func:`udu_channels`) on a blocked
    lane-layout: all element arrays live as ``[d, d, lanes]`` with the data
    axis minormost, every pivot inverse is the *unrolled* achmat Cholesky,
    and the scan is two vectorized window phases plus a tiny sequential
    cross-window pass.

    Exists for the d > 8 TPU regime (``parallel/pskf.py::CH_MAX_DIM_TPU``):

    * the fully channelized graph (``btd_udu_parallel_ch``) OOMs the remote
      TPU compiler at d = 14 even in isolation (0.96 MB MLIR → compile
      helper SIGKILL, measured);
    * the sequential :func:`btd_udu` fallback issues one tiny Cholesky +
      triangular-solve custom call per grid point (8.6 s of an 11 s d=14
      spatio step at N = 10k, measured);
    * a ``lax.associative_scan`` over dense ``[N, d, d]`` stacks with
      batched Cholesky custom calls still costs 2.1 s — the TPU custom
      calls process tiny batched blocks essentially sequentially.

    Structure (mirrors :func:`.blocked_scan.blocked_assoc_scan`): window
    suffix scan (phase A, ``l`` steps × ``nw`` lanes), sequential suffix
    pass over the ``nw`` window aggregates emitting *exclusive* boundaries
    (phase B), and one vectorized combine of each within-window suffix with
    its window boundary (phase C).  The compose body is instantiated only
    three times, so the HLO stays small at any ``d``.  Identity elements
    (window-padding and scan seeds) ride an explicit flag channel with
    guarded (NaN-free-under-AD) pivots, exactly like ``udu_channels``.

    Equivalent of ``SymmetricBlockTriDiagonal.upper_diagonal_lower``
    (block_tri_diag.py:442-534).  Unbatched input only
    (``diag.ndim == 3``); dispatched from ``ssm.transforms.naturals_to_ssm``.
    """
    from . import achmat as am

    kd = k.diag  # [N, d, d]
    b = k.sub  # [N-1, d, d];  b_k = K[k+1, k]
    n_el = b.shape[0]
    d = kd.shape[-1]
    dtype = kd.dtype

    def to_lanes(x):  # [n, d, d] → [d, d, n]
        return jnp.moveaxis(x, (-2, -1), (0, 1))

    def from_lanes(x):  # [d, d, n] → [n, d, d]
        return jnp.moveaxis(x, (0, 1), (-2, -1))

    if n_el == 0:
        return kd, b

    # segment [k, k+1]: boundary quadratic form (A, B, C) with the interior
    # eliminated — A → x_k², B = K[k,k+1] = b_kᵀ → x_k·x_{k+1}, C = K_{k+1,k+1}
    a0 = jnp.zeros((d, d, n_el), dtype)
    b0 = to_lanes(b).swapaxes(0, 1)  # bᵀ channels
    c0 = to_lanes(kd[1:])
    f0 = jnp.zeros((n_el,), dtype)  # 1.0 marks an identity element

    nw = max(1, min(num_windows, n_el))
    l = -(-n_el // nw)
    pad = nw * l - n_el

    def ident(rest):
        return (
            jnp.zeros((d, d) + rest, dtype),
            jnp.zeros((d, d) + rest, dtype),
            jnp.broadcast_to(jnp.eye(d, dtype=dtype).reshape((d, d) + (1,) * len(rest)), (d, d) + rest),
            jnp.ones(rest, dtype),
        )

    if pad:
        ia, ib, ic, iflag = ident((pad,))
        a0 = jnp.concatenate([a0, ia], axis=-1)
        b0 = jnp.concatenate([b0, ib], axis=-1)
        c0 = jnp.concatenate([c0, ic], axis=-1)
        f0 = jnp.concatenate([f0, iflag], axis=-1)

    def win(x):  # [..., nw*l] → [l, ..., nw]  (window w owns chunk [w·l, (w+1)·l))
        y = x.reshape(x.shape[:-1] + (nw, l))
        return jnp.moveaxis(y, -1, 0)

    aw, bw, cw, fw = win(a0), win(b0), win(c0), win(f0)

    def compose(later, earlier):
        """Suffix compose on [d, d, *rest] channel operands with identity
        flags (x = later segment, y = earlier — eliminates the interface)."""
        a_r, b_r, c_r, f_r = later
        a_l, b_l, c_l, f_l = earlier
        m_inv = am.ainv_pd(c_l + a_r, guarded=True)  # PD cyclic-reduction pivot
        blm = am.amm(b_l, m_inv)
        a_new = am.asym(a_l - am.amm(blm, am.amt(b_l)))
        b_new = -am.amm(blm, b_r)
        c_new = am.asym(c_r - am.amm(am.amt(b_r), am.amm(m_inv, b_r)))

        def sel(f, x, y):
            return jnp.where(f > 0.5, x, y)

        out_a = sel(f_l, a_r, sel(f_r, a_l, a_new))
        out_b = sel(f_l, b_r, sel(f_r, b_l, b_new))
        out_c = sel(f_l, c_r, sel(f_r, c_l, c_new))
        return out_a, out_b, out_c, f_l * f_r

    # --- phase A: within-window suffixes + window aggregates (l steps, nw lanes)
    def step_a(carry, row):
        out = compose(carry, row)
        return out, out

    agg, within = lax.scan(step_a, ident((nw,)), (aw, bw, cw, fw), reverse=True)

    # --- phase B: exclusive suffix over the nw window aggregates (tiny,
    # sequential — one compose instantiation instead of a log-tree of them)
    agg_t = tuple(jnp.moveaxis(x, -1, 0) for x in agg)

    def step_b(carry, row):
        return compose(carry, row), carry  # emit PRE-compose ⇒ exclusive

    _, bound_t = lax.scan(step_b, ident(()), agg_t, reverse=True)
    bound = tuple(jnp.moveaxis(x, 0, -1) for x in bound_t)  # [d, d, nw] / [nw]

    # --- phase C: combine window boundary into each within-window suffix
    # (within: [l, d, d, nw] → lanes [d, d, l, nw]; boundary broadcast over l)
    within_l = tuple(jnp.moveaxis(x, 0, -2) for x in within)
    bound_b = tuple(x[..., None, :] for x in bound)
    a_s, b_s, c_s, _ = compose(bound_b, within_l)

    def unwin(x):  # [d, d, l, nw] → [d, d, nw*l] → unpadded [d, d, n_el]
        y = jnp.moveaxis(x, -2, -1).reshape(x.shape[:-2] + (nw * l,))
        return y[..., :n_el]

    a_s, b_s, c_s = unwin(a_s), unwin(b_s), unwin(c_s)

    # D_k = K_kk + A_k − B_k C_k⁻¹ B_kᵀ for k < N−1;  D_{N−1} = K_{N−1,N−1}
    kd_l = to_lanes(kd)
    corr = am.amm(b_s, am.amm(am.ainv_pd(c_s), am.amt(b_s)))
    d_head = am.asym(kd_l[:, :, :-1] + a_s - corr)
    d_blocks_l = jnp.concatenate([d_head, kd_l[:, :, -1:]], axis=-1)
    # U_k = K[k,k+1] D_{k+1}⁻¹ = b_kᵀ D_{k+1}⁻¹
    u_super_l = am.amm(b0[..., :n_el], am.ainv_pd(d_blocks_l[:, :, 1:]))
    return from_lanes(d_blocks_l), from_lanes(u_super_l)


def btd_udu_parallel_ch(k: BTD) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parallel block UDU' for d ≤ 3 via Schur-segment (cyclic-reduction)
    composition on scalar channels.

    ``D_k = K_kk − b_kᵀ D_{k+1}⁻¹ b_k`` is the Schur complement of the
    suffix ``K[k:, k:]`` onto ``x_k``.  A suffix segment ``[k..j]`` is
    summarized by its boundary quadratic form ``(A, B, C)`` (contributions
    to ``x_k²``, ``x_k·x_j`` and ``x_j²``, interior eliminated); adjacent
    segments compose by eliminating the shared interface:

        ``M = C_left + A_right`` (a PD cyclic-reduction pivot),
        ``A' = A_l − B_l M⁻¹ B_lᵀ``, ``B' = −B_l M⁻¹ B_r``,
        ``C' = C_r − B_rᵀ M⁻¹ B_r``.

    This is associative AND numerically stable (all pivots PD — unlike the
    naive 2d×2d transfer-matrix product, whose columns collapse onto the
    dominant invariant subspace and cancel catastrophically).  An explicit
    identity flag channel handles the scan's neutral element.  Replaces the
    O(N)-sequential ``lax.scan`` for the d = 2/3 CVI hot loop
    (ssm_gaussian_transformations.py:333-512).
    """
    from . import chmat as cm

    kd_ch = cm.mat_to_ch(k.diag)  # [N] channels
    b_ch = cm.mat_to_ch(k.sub)  # [N-1]; b_k = K[k+1,k]
    d_ch, u_ch = udu_channels(kd_ch, b_ch)
    return cm.ch_to_mat(d_ch), cm.ch_to_mat(u_ch)


def udu_channels(kd_ch, b_ch):
    """Channel-level Schur-segment UDU' (see :func:`btd_udu_parallel_ch`).

    ``kd_ch``: d×d channel matrix of ``[N]`` arrays; ``b_ch``: same over
    ``[N-1]``.  Returns ``(d_blocks_ch [N], u_super_ch [N-1])`` channels.
    """
    from . import chmat as cm
    from .blocked_scan import blocked_assoc_scan

    d = len(kd_ch)
    dd = d * d

    # base element k = segment [k, k+1]: A=0, B=K[k,k+1]=b_kᵀ, C=K_{k+1,k+1}
    a0 = cm.mzeros(d, b_ch[0][0])
    b0 = cm.mt(b_ch)
    c0 = tuple(tuple(kd_ch[i][j][1:] for j in range(d)) for i in range(d))
    zero = jnp.zeros_like(b_ch[0][0])
    flat = cm.flatten_mat(a0) + cm.flatten_mat(b0) + cm.flatten_mat(c0) + (zero,)

    def unpack(f):
        return (
            cm.unflatten_mat(f[:dd], d),
            cm.unflatten_mat(f[dd : 2 * dd], d),
            cm.unflatten_mat(f[2 * dd : 3 * dd], d),
            f[3 * dd],
        )

    def compose(x, y):
        # suffix convention: x = later segment, y = earlier segment
        a_r, b_r, c_r, id_r = unpack(x)
        a_l, b_l, c_l, id_l = unpack(y)
        # C_l + A_r is a symmetric PD Schur pivot; d ≤ 3 keeps the adjugate
        # closed form, d ≥ 4 routes through the guarded Cholesky inverse so
        # identity-padding lanes (zero matrices) stay NaN-free under autodiff
        m_inv = cm.minv_pd(cm.madd(c_l, a_r), guarded=d > 3)
        a_new = cm.msub(a_l, cm.mm(b_l, cm.mm(m_inv, cm.mt(b_l))))
        b_new = cm.mscale(cm.mm(b_l, cm.mm(m_inv, b_r)), -1.0)
        c_new = cm.msub(c_r, cm.mm(cm.mt(b_r), cm.mm(m_inv, b_r)))

        def sel(id_other, real, fallback):
            return jnp.where(id_other > 0.5, fallback, real)

        # identity handling: if y (earlier) is identity → x; if x → y
        out_a = tuple(
            tuple(
                sel(id_l, sel(id_r, a_new[i][j], a_l[i][j]), a_r[i][j])
                for j in range(d)
            )
            for i in range(d)
        )
        out_b = tuple(
            tuple(
                sel(id_l, sel(id_r, b_new[i][j], b_l[i][j]), b_r[i][j])
                for j in range(d)
            )
            for i in range(d)
        )
        out_c = tuple(
            tuple(
                sel(id_l, sel(id_r, c_new[i][j], c_l[i][j]), c_r[i][j])
                for j in range(d)
            )
            for i in range(d)
        )
        out_id = id_l * id_r
        return (
            cm.flatten_mat(out_a)
            + cm.flatten_mat(out_b)
            + cm.flatten_mat(out_c)
            + (out_id,)
        )

    def compose_array(x, y):
        """Array-channel compose for d ≥ 4: identical math on ONE packed
        ``[3d²+1, ...]`` operand (ops/achmat.py) — O(d²) HLO per compose so
        the scan graph stays compilable, and a single array per scan step so
        the blocked scan does one slice/update per step instead of 3d²+1
        (see blocked_assoc_scan_packed)."""
        from . import achmat as am

        def aunpack(f):
            rest = f.shape[1:]
            return (
                f[:dd].reshape((d, d) + rest),
                f[dd : 2 * dd].reshape((d, d) + rest),
                f[2 * dd : 3 * dd].reshape((d, d) + rest),
                f[3 * dd],
            )

        a_r, b_r, c_r, id_r = aunpack(x)
        a_l, b_l, c_l, id_l = aunpack(y)
        m_inv = am.ainv_pd(c_l + a_r, guarded=True)
        blm = am.amm(b_l, m_inv)
        a_new = a_l - am.amm(blm, am.amt(b_l))
        b_new = -am.amm(blm, b_r)
        c_new = c_r - am.amm(am.amt(b_r), am.amm(m_inv, b_r))

        def sel(id_other, real, fallback):
            return jnp.where(id_other > 0.5, fallback, real)

        out_a = sel(id_l, sel(id_r, a_new, a_l), a_r)
        out_b = sel(id_l, sel(id_r, b_new, b_l), b_r)
        out_c = sel(id_l, sel(id_r, c_new, c_l), c_r)
        out_id = (id_l * id_r) * jnp.ones_like(out_a[0, 0])
        rest = out_id.shape
        return jnp.concatenate(
            [out_a.reshape((dd,) + rest), out_b.reshape((dd,) + rest),
             out_c.reshape((dd,) + rest), out_id[None]],
            axis=0,
        )

    ident = (0.0,) * (3 * dd) + (1.0,)
    if d >= 4:
        from . import achmat as am
        from .blocked_scan import blocked_assoc_scan_packed

        n_el = flat[0].shape[0]
        packed = jnp.stack(flat)  # [3dd+1, N-1] — rank-1 channels
        # d ≥ 4: two-level cross pass (5 compose instantiations, ~66
        # sequential steps at T=10k) — the recursive/assoc cross pass
        # instantiates the unrolled compose ~16× (OOMs the remote TPU
        # compiler at d=14, SIGKILL measured) and does ~4× the compose
        # work (12 full-width tree levels + a 64-step near-scalar subscan)
        big = {"cross_seq": True, "num_blocks": 512} if d >= 4 else {}
        out_p = blocked_assoc_scan_packed(
            compose_array, packed, identity=ident, reverse=True, **big
        )
        a_a = out_p[:dd].reshape(d, d, n_el)
        b_a = out_p[dd : 2 * dd].reshape(d, d, n_el)
        c_a = out_p[2 * dd : 3 * dd].reshape(d, d, n_el)
        kd_a = am.pack_mat(cm.flatten_mat(kd_ch), d)
        bch_a = am.pack_mat(cm.flatten_mat(b_ch), d)
        # D_k = K_kk + A_k − B_k C_k⁻¹ B_kᵀ for k < N-1;  D_{N-1} = K_{N-1,N-1}
        corr = am.amm(b_a, am.amm(am.ainv_pd(c_a), am.amt(b_a)))
        d_head = am.asym(kd_a[:, :, :-1] + a_a - corr)
        d_blocks_a = jnp.concatenate([d_head, kd_a[:, :, -1:]], axis=-1)
        u_super_a = am.amm(am.amt(bch_a), am.ainv_pd(d_blocks_a[:, :, 1:]))
        d_blocks_ch = cm.unflatten_mat(am.unpack_mat(d_blocks_a), d)
        u_super_ch = cm.unflatten_mat(am.unpack_mat(u_super_a), d)
        return d_blocks_ch, u_super_ch

    out = blocked_assoc_scan(compose, flat, identity=ident, reverse=True)
    a_s, b_s, c_s, _ = unpack(out)

    # D_k = K_kk + A_k − B_k C_k⁻¹ B_kᵀ for k < N-1;  D_{N-1} = K_{N-1,N-1}
    kd_head = tuple(tuple(kd_ch[i][j][:-1] for j in range(d)) for i in range(d))
    corr = cm.mm(b_s, cm.mm(cm.minv_pd(c_s), cm.mt(b_s)))
    d_head = cm.sym(cm.msub(cm.madd(kd_head, a_s), corr))
    d_blocks_ch = tuple(
        tuple(
            jnp.concatenate([d_head[i][j], kd_ch[i][j][-1:]])
            for j in range(d)
        )
        for i in range(d)
    )
    d_next = tuple(
        tuple(x[1:] for x in row) for row in d_blocks_ch
    )
    u_super_ch = cm.mm(cm.mt(b_ch), cm.minv_pd(d_next))  # U_k = b_kᵀ D_{k+1}⁻¹
    return d_blocks_ch, u_super_ch


def _mobius_compose(a, b):
    """Compose two 4-channel 2×2 Möbius maps: ``b`` (earlier) applied on top
    of the suffix ``a`` (later), normalized for overflow safety.
    Normalization preserves the projective class, so associativity holds."""
    a00, a01, a10, a11 = a
    b00, b01, b10, b11 = b
    p00 = b00 * a00 + b01 * a10
    p01 = b00 * a01 + b01 * a11
    p10 = b10 * a00 + b11 * a10
    p11 = b10 * a01 + b11 * a11
    scale = jnp.sqrt(p00**2 + p01**2 + p10**2 + p11**2) + 1e-300
    return p00 / scale, p01 / scale, p10 / scale, p11 / scale


def btd_udu_parallel_1d(k: BTD, block_size: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parallel UDU' for scalar blocks (d = 1).

    The backward recursion ``D_k = K_kk − B_k² / D_{k+1}`` is a continued
    fraction — a composition of Möbius maps ``M_k = [[K_kk, −B_k²], [1, 0]]``
    acting on ``D = p/q`` projectively.  A single global associative scan of
    these maps is exact in f64 but float32-unstable: on fine grids the
    recursion is parabolic-degenerate (``A ≈ 1``), the log-depth product
    tree loses the small singular direction, and D can come out negative.

    The cure is sequential-ORDER arithmetic with window-level parallelism
    (empirically ~1e-5 relative error in f32 where the scan tree fails
    completely):

    1. per-window Möbius map composition, sequential over the window length
       ``l`` but vectorized across ``nb = N/l`` windows (with the diagonal
       preconditioning ``s_k = |B_k|`` that makes every map O(1)-
       conditioned),
    2. a tiny sequential boundary pass over the ``nb`` window maps,
    3. the exact within-window recursion from the boundary values —
       sequential in ``l``, vectorized across windows.

    On TPU with f32 the two heavy phases run as fused Pallas kernels
    (:mod:`.pallas_riccati`); elsewhere the same phases are XLA scans.
    Total sequential depth ``2l + nb ≈ 3√N``.

    This is the TPU fast path for the CVI hot loop
    (``naturals_to_ssm_params``) where the reference runs sequential C++
    banded recursions (ssm_gaussian_transformations.py:333-512).
    """
    kd = k.diag[..., 0, 0]  # [..., N]
    ks = k.sub[..., 0, 0]  # [..., N-1]

    b2 = jnp.concatenate([ks**2, jnp.zeros_like(kd[..., :1])], axis=-1)  # B_N = 0
    d_scalar = riccati_d_scalar(kd, b2, block_size)

    # U_k = K[k,k+1] / D_{k+1} = B_kᵀ/D_{k+1} (scalar: sub_k / D_{k+1})
    u_scalar = ks / d_scalar[..., 1:]
    return d_scalar[..., :, None, None], u_scalar[..., :, None, None]


def riccati_d_scalar(kd: jnp.ndarray, b2: jnp.ndarray, block_size: int = 512) -> jnp.ndarray:
    """Dtype/backend dispatch for the scalar Riccati sweep on ``[..., N]``
    channels (see :func:`btd_udu_parallel_1d` for the stability rationale):
    f64 → exact global Möbius scan (blocked layout for long grids); f32 on
    TPU → Pallas windowed sweep; otherwise → windowed XLA scans."""
    n = kd.shape[-1]
    batch = kd.shape[:-1]
    if kd.dtype == jnp.float64:
        if not batch and n >= 4096 and jax.default_backend() == "tpu":
            # fused double-float Pallas sweep: one kernel for the whole
            # scan (~4e-15 rel error); the XLA blocked scans below spend
            # ~90% of their device time in slice/pad/DUS op dispatches
            from .pallas_scan import riccati_d_sweep_df

            return riccati_d_sweep_df(kd, b2)
        if not batch and n >= 4096:
            # long grids: same Möbius composition through the blocked
            # layout — lax.associative_scan's stride-2 slice/pad tree
            # dominates device time otherwise (see ops/blocked_scan.py)
            return _riccati_d_blocked(kd, b2)
        # f64 is exact under the log-depth global Möbius scan — lowest
        # latency (no windowing needed)
        return _riccati_d_global_scan(kd, b2)
    if (
        not batch
        and kd.dtype == jnp.float32
        and n >= 1024
        and jax.default_backend() == "tpu"
    ):
        from .pallas_riccati import riccati_d_sweep

        return riccati_d_sweep(kd, b2)
    return _riccati_d_xla(kd, b2, block_size)


def _riccati_d_xla(kd: jnp.ndarray, b2: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """XLA implementation of the three-phase windowed Riccati sweep
    (sequential-order arithmetic; see :func:`btd_udu_parallel_1d`)."""
    n = kd.shape[-1]
    batch = kd.shape[:-1]

    # diagonal preconditioning
    s = jnp.where(b2 > 0, jnp.sqrt(b2), jnp.abs(kd) + 1e-30)
    s_next = jnp.concatenate([s[..., 1:], jnp.ones_like(s[..., :1])], axis=-1)
    kd_t = kd / s
    b2_t = b2 / (s * s_next)

    l = min(block_size, n)
    nb = -(-n // l)
    pad = nb * l - n

    def blockify(x, pad_value):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full(batch + (pad,), pad_value, x.dtype)], axis=-1
            )
        return jnp.moveaxis(x.reshape(batch + (nb, l)), -1, 0)  # [l, ..., nb]

    kd_blk = blockify(kd_t, 1.0)
    b2_blk = blockify(b2_t, 0.0)
    s_blk = blockify(s, 1.0)

    # phase 1: window maps, sequential over l, vectorized over windows
    ones = jnp.ones(batch + (nb,), kd.dtype)
    zeros = jnp.zeros(batch + (nb,), kd.dtype)

    def compose(w, inputs):
        a00, nb2 = inputs
        w00, w01, w10, w11 = w
        p00 = a00 * w00 - nb2 * w10
        p01 = a00 * w01 - nb2 * w11
        scale = jax.lax.rsqrt(p00**2 + p01**2 + w00**2 + w01**2 + 1e-30)
        return (p00 * scale, p01 * scale, w00 * scale, w01 * scale), None

    (w00, w01, w10, w11), _ = lax.scan(
        compose, (ones, zeros, zeros, ones), (kd_blk, b2_blk), reverse=True
    )

    # phase 2: boundary pass over windows (right to left)
    def boundary(carry, wm):
        p, q = carry
        m00, m01, m10, m11 = wm
        p2 = m00 * p + m01 * q
        q2 = m10 * p + m11 * q
        scale = jax.lax.rsqrt(p2**2 + q2**2 + 1e-30)
        return (p2 * scale, q2 * scale), (p, q)

    wm_t = tuple(jnp.moveaxis(w, -1, 0) for w in (w00, w01, w10, w11))
    one = jnp.ones(batch, kd.dtype)
    zero = jnp.zeros(batch, kd.dtype)
    _, (hb0, hb1) = lax.scan(boundary, (one, zero), wm_t, reverse=True)
    hb0 = jnp.moveaxis(hb0, 0, -1)  # [..., nb]
    hb1 = jnp.moveaxis(hb1, 0, -1)
    d_bnd = jnp.where(hb1 == 0, jnp.inf, hb0 / jnp.where(hb1 == 0, 1.0, hb1))

    # phase 3: exact within-window sweep
    def sweep(carry_d, inputs):
        kd_i, b2_i, s_i = inputs
        d_t = kd_i - b2_i / carry_d
        return d_t, d_t * s_i

    _, ds = lax.scan(sweep, d_bnd, (kd_blk, b2_blk, s_blk), reverse=True)
    d_blocks = jnp.moveaxis(ds, 0, -1)  # [..., nb, l]
    return d_blocks.reshape(batch + (nb * l,))[..., :n]


def _riccati_d_blocked(kd: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Global Möbius suffix scan via the blocked (slice-free) layout —
    identical math to :func:`_riccati_d_global_scan`, different association
    order (f64-exact either way)."""
    from .blocked_scan import blocked_assoc_scan

    def compose(a, b):
        a00, a01, a10, a11 = a
        b00, b01, b10, b11 = b
        p00 = b00 * a00 + b01 * a10
        p01 = b00 * a01 + b01 * a11
        p10 = b10 * a00 + b11 * a10
        p11 = b10 * a01 + b11 * a11
        scale = jax.lax.rsqrt(p00**2 + p01**2 + p10**2 + p11**2 + 1e-300)
        return p00 * scale, p01 * scale, p10 * scale, p11 * scale

    c00, _, c10, _ = blocked_assoc_scan(
        compose,
        (kd, -b2, jnp.ones_like(kd), jnp.zeros_like(kd)),
        identity=(1.0, 0.0, 0.0, 1.0),
        reverse=True,
    )
    return c00 / c10


def scalar_affine_all(t: jnp.ndarray, c: jnp.ndarray, x0, *, reverse: bool = False) -> jnp.ndarray:
    """``x_k = t_k x_{k±1} + c_k`` on rank-1 scalar channels, blocked for
    long grids (same semantics as the d=1 branch of :func:`affine_scan`)."""

    def comp(e1, e2):
        a1, b1 = e1
        a2, b2_ = e2
        return a2 * a1, a2 * b1 + b2_

    if t.ndim == 1 and t.shape[0] >= 4096 and jax.default_backend() == "tpu":
        from .pallas_scan import linear_recurrence

        return linear_recurrence(t, c, jnp.asarray(x0, t.dtype), reverse)
    if t.ndim == 1 and t.shape[0] >= 4096:
        from .blocked_scan import blocked_assoc_scan

        ca, cb = blocked_assoc_scan(comp, (t, c), identity=(1.0, 0.0), reverse=reverse)
    else:
        ca, cb = lax.associative_scan(comp, (t, c), reverse=reverse)
    return ca * x0 + cb


def _riccati_d_global_scan(kd: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Global log-depth Möbius associative scan (exact in float64; unstable
    in float32 near the parabolic regime — see btd_udu_parallel_1d)."""
    m00 = jnp.moveaxis(kd, -1, 0)
    m01 = jnp.moveaxis(-b2, -1, 0)
    m10 = jnp.ones_like(m00)
    m11 = jnp.zeros_like(m00)

    def compose(a, b):
        # reverse scan: a = later cumulative suffix, b = earlier element
        a00, a01, a10, a11 = a
        b00, b01, b10, b11 = b
        p00 = b00 * a00 + b01 * a10
        p01 = b00 * a01 + b01 * a11
        p10 = b10 * a00 + b11 * a10
        p11 = b10 * a01 + b11 * a11
        scale = jax.lax.rsqrt(p00**2 + p01**2 + p10**2 + p11**2 + 1e-300)
        return p00 * scale, p01 * scale, p10 * scale, p11 * scale

    c00, _, c10, _ = lax.associative_scan(compose, (m00, m01, m10, m11), reverse=True)
    return jnp.moveaxis(c00 / c10, 0, -1)


def affine_scan(t_mats: jnp.ndarray, c_vecs: jnp.ndarray, x0: jnp.ndarray, *, reverse: bool = False) -> jnp.ndarray:
    """Parallel solve of the affine recursion ``x_k = T_k x_{k±1} + c_k``.

    ``t_mats: [..., N, d, d]``, ``c_vecs: [..., N, d]``, ``x0: [..., d]`` is
    the boundary value (first element when ``reverse=False``, last when
    ``reverse=True``).  Returns all N values (excluding the boundary).
    O(log N) depth — used to parallelize the block-bidiagonal substitutions.
    """
    d = t_mats.shape[-1]
    if d == 1:
        # scalar fast path — keep the scan on the VPU (blocked slice-free
        # layout for long unbatched grids, ops/blocked_scan.py)
        t_t = jnp.moveaxis(t_mats[..., 0, 0], -1, 0)
        c_t = jnp.moveaxis(c_vecs[..., 0], -1, 0)

        def compose_s(e1, e2):
            a1, b1 = e1
            a2, b2 = e2
            return a2 * a1, a2 * b1 + b2

        if t_t.ndim == 1 and t_t.shape[0] >= 4096:
            from .blocked_scan import blocked_assoc_scan

            ca, cb = blocked_assoc_scan(
                compose_s, (t_t, c_t), identity=(1.0, 0.0), reverse=reverse
            )
        else:
            ca, cb = lax.associative_scan(compose_s, (t_t, c_t), reverse=reverse)
        xs = ca * x0[..., 0] + cb
        return jnp.moveaxis(xs, 0, -1)[..., None]

    t_t = jnp.moveaxis(t_mats, -3, 0)
    c_t = jnp.moveaxis(c_vecs, -2, 0)

    def compose(e1, e2):
        # e2 applied after e1 in recursion order (for reverse scans JAX
        # passes (later-suffix, earlier-element) — same formula applies)
        a1, b1 = e1
        a2, b2 = e2
        return a2 @ a1, jnp.einsum("...ij,...j->...i", a2, b1) + b2

    if t_t.shape[0] >= 4096 and t_t.ndim == 3:
        # long unbatched grids: ONE packed [d²+d, T] array through the
        # blocked scan — matrix-stack composes pay tile padding plus XLA's
        # while-loop batched-matmul lowering per step (blocked_scan.py)
        from . import achmat as am
        from .blocked_scan import blocked_assoc_scan_packed

        dd2 = d * d
        n_el = t_t.shape[0]
        packed = jnp.concatenate(
            [t_mats.reshape(n_el, dd2).T, c_vecs.T], axis=0
        )

        def compose_packed(x, y):
            rest_x = x.shape[1:]
            a1 = x[:dd2].reshape((d, d) + rest_x)
            b1 = x[dd2:]
            rest_y = y.shape[1:]
            a2 = y[:dd2].reshape((d, d) + rest_y)
            b2 = y[dd2:]
            a = am.amm(a2, a1)
            b = am.amv(a2, b1) + b2
            return jnp.concatenate([a.reshape((dd2,) + b.shape[1:]), b], axis=0)

        ident = tuple(
            1.0 if i == j else 0.0 for i in range(d) for j in range(d)
        ) + (0.0,) * d
        out = blocked_assoc_scan_packed(
            compose_packed, packed, identity=ident, reverse=reverse
        )
        ca_a = out[:dd2].reshape(d, d, n_el)
        cb_a = out[dd2:]
        xs_a = am.amv(ca_a, x0[:, None]) + cb_a  # [d, T]
        return xs_a.T
    if t_t.shape[0] >= 4096:
        from .blocked_scan import blocked_assoc_scan

        dd = t_t.shape[-1]
        eye = jnp.eye(dd, dtype=t_t.dtype)
        ca, cb = blocked_assoc_scan(
            compose,
            (t_t, c_t),
            identity=(eye, jnp.zeros((dd,), t_t.dtype)),
            reverse=reverse,
        )
    else:
        ca, cb = lax.associative_scan(compose, (t_t, c_t), reverse=reverse)
    xs = jnp.einsum("t...ij,...j->t...i", ca, x0) + cb
    return jnp.moveaxis(xs, 0, -2)


def btd_solve_sym_vec(k: BTD, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve ``K x = rhs`` for symmetric PD BTD ``K`` via ``U D Uᵀ``.

    ``U z = rhs`` (backward), ``w = D⁻¹ z``, ``Uᵀ x = w`` (forward).
    """
    d_blocks, u_super = btd_udu(k)
    d_t = _scan_time_first(d_blocks, -3)
    u_t = _scan_time_first(u_super, -3)
    r_t = _scan_time_first(rhs, -2)

    # backward: z_N = r_N ; z_k = r_k − U_k z_{k+1}
    def bwd(z_next, inputs):
        u_k, r_k = inputs
        z_k = r_k - jnp.einsum("...ij,...j->...i", u_k, z_next)
        return z_k, z_k

    _, z_rest = lax.scan(bwd, r_t[-1], (u_t, r_t[:-1]), reverse=True)
    z = jnp.concatenate([z_rest, r_t[-1][None]], axis=0)

    chols = jnp.linalg.cholesky(d_t)
    w = tri_solve(chols, tri_solve(chols, z[..., None]), transpose=True)[..., 0]

    # forward: x_0 = w_0 ; x_k = w_k − U_{k-1}ᵀ x_{k-1}
    def fwd(x_prev, inputs):
        u_k, w_k = inputs
        x_k = w_k - jnp.einsum("...ji,...j->...i", u_k, x_prev)
        return x_k, x_k

    _, x_rest = lax.scan(fwd, w[0], (u_t, w[1:]))
    x = jnp.concatenate([w[0][None], x_rest], axis=0)
    return jnp.moveaxis(x, 0, -2)
