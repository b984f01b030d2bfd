"""Channelized small-matrix algebra: ``[..., N, d, d]`` stacks as tuples of
rank-1 ``[..., N]`` scalar channels.

Why: TPU tiles the two minormost dims ``(8, 128)``, so a ``[N, 2, 2]``
stack materializes at 256× its logical size and every batched-tiny-matmul
becomes its own fusion root — profiling exact GPR (d=2, N=10k) showed 189
fusions/call averaging ~1 ms each, ~100× the useful arithmetic.  Unrolled
scalar formulas on ``[N]`` channels remove both the padding and the fusion
breaks: a d=2 matmul is 8 elementwise multiplies XLA fuses freely.

Representation: a matrix stack is a **tuple of tuples** (row-major)
``m[i][j] -> [..., N]``; a vector stack is a tuple ``v[i] -> [..., N]``.
``d`` is static (unrolled Python loops).  General (non-symmetric) inversion
is closed-form adjugate for d ≤ 3; **arbitrary d** is supported through the
PD-routed primitives (:func:`mchol`/:func:`minv_pd`/:func:`msolve_pd`/
:func:`logdet_pd` — unrolled Cholesky + triangular substitution) and the
Woodbury pair :func:`inv_ipl`/:func:`logdet_ipl` for ``(I + P·Λ)⁻¹`` with
PSD ``P, Λ`` — ``I + UᵀPU`` (``U = chol(Λ)``) is always symmetric PD, so no
general-matrix inverse is ever needed on the hot paths (this covers kernel
sums like Matern52+Matern12 (d = 4) and spatio-temporal state dims
``M·d_t``, markovflow/models/spatio_temporal_variational.py:45-106).
Everything is autodiff-transparent; the guarded variants avoid the
NaN-through-``where`` gradient trap at exactly-singular inputs (sparse
sites with ``Λ = 0``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "mat_to_ch",
    "ch_to_mat",
    "vec_to_ch",
    "ch_to_vec",
    "mm",
    "mv",
    "mt",
    "madd",
    "msub",
    "mscale",
    "vadd",
    "vsub",
    "vscale",
    "sym",
    "det",
    "minv",
    "minv_pd",
    "msolve",
    "msolve_vec",
    "msolve_pd",
    "msolve_pd_vec",
    "mchol",
    "mchol_psd",
    "tri_inv_lower",
    "inv_ipl",
    "logdet_ipl",
    "logdet_pd",
    "vdot",
    "quad_form",
    "meye",
    "mzeros",
    "vzeros",
]

Mat = Tuple[Tuple[jnp.ndarray, ...], ...]
Vec = Tuple[jnp.ndarray, ...]


def mat_to_ch(x: jnp.ndarray) -> Mat:
    """``[..., N, d, d]`` → row-major channel tuple (one slice per entry)."""
    d = x.shape[-1]
    return tuple(tuple(x[..., i, j] for j in range(d)) for i in range(d))


def ch_to_mat(m: Mat) -> jnp.ndarray:
    """Channel tuple → ``[..., N, d, d]``."""
    return jnp.stack([jnp.stack(row, axis=-1) for row in m], axis=-2)


def vec_to_ch(x: jnp.ndarray) -> Vec:
    return tuple(x[..., i] for i in range(x.shape[-1]))


def ch_to_vec(v: Vec) -> jnp.ndarray:
    return jnp.stack(v, axis=-1)


def _dim(m: Mat) -> int:
    return len(m)


def mm(a: Mat, b: Mat) -> Mat:
    d = _dim(a)
    return tuple(
        tuple(sum(a[i][k] * b[k][j] for k in range(d)) for j in range(d))
        for i in range(d)
    )


def mv(a: Mat, v: Vec) -> Vec:
    d = _dim(a)
    return tuple(sum(a[i][k] * v[k] for k in range(d)) for i in range(d))


def mt(a: Mat) -> Mat:
    d = _dim(a)
    return tuple(tuple(a[j][i] for j in range(d)) for i in range(d))


def madd(a: Mat, b: Mat) -> Mat:
    d = _dim(a)
    return tuple(tuple(a[i][j] + b[i][j] for j in range(d)) for i in range(d))


def msub(a: Mat, b: Mat) -> Mat:
    d = _dim(a)
    return tuple(tuple(a[i][j] - b[i][j] for j in range(d)) for i in range(d))


def mscale(a: Mat, s) -> Mat:
    d = _dim(a)
    return tuple(tuple(s * a[i][j] for j in range(d)) for i in range(d))


def vadd(a: Vec, b: Vec) -> Vec:
    return tuple(x + y for x, y in zip(a, b))


def vsub(a: Vec, b: Vec) -> Vec:
    return tuple(x - y for x, y in zip(a, b))


def vscale(a: Vec, s) -> Vec:
    return tuple(s * x for x in a)


def sym(a: Mat) -> Mat:
    d = _dim(a)
    return tuple(
        tuple(0.5 * (a[i][j] + a[j][i]) for j in range(d)) for i in range(d)
    )


def vdot(a: Vec, b: Vec):
    return sum(x * y for x, y in zip(a, b))


def quad_form(v: Vec, a: Mat, w: Vec):
    """``vᵀ A w``."""
    return vdot(v, mv(a, w))


def det(a: Mat):
    d = _dim(a)
    if d == 1:
        return a[0][0]
    if d == 2:
        return a[0][0] * a[1][1] - a[0][1] * a[1][0]
    if d == 3:
        return (
            a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
            - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
            + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
        )
    raise NotImplementedError(
        "channelized general det only for d <= 3 — use logdet_pd/logdet_ipl"
    )


def minv(a: Mat) -> Mat:
    """Closed-form (adjugate) inverse, d ≤ 3."""
    d = _dim(a)
    dt = det(a)
    inv_dt = 1.0 / dt
    if d == 1:
        return ((inv_dt,),)
    if d == 2:
        return (
            (a[1][1] * inv_dt, -a[0][1] * inv_dt),
            (-a[1][0] * inv_dt, a[0][0] * inv_dt),
        )
    if d == 3:
        c = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                r = [k for k in range(3) if k != i]
                s = [k for k in range(3) if k != j]
                minor = a[r[0]][s[0]] * a[r[1]][s[1]] - a[r[0]][s[1]] * a[r[1]][s[0]]
                c[j][i] = ((-1) ** (i + j)) * minor * inv_dt  # adjugate transpose
        return tuple(tuple(row) for row in c)
    raise NotImplementedError(
        "channelized general (adjugate) inverse only for d <= 3 — use "
        "minv_pd for symmetric PD or inv_ipl for (I + P·Λ)⁻¹ at any d"
    )


def msolve(a: Mat, b: Mat) -> Mat:
    """``a⁻¹ b``."""
    return mm(minv(a), b)


def msolve_vec(a: Mat, v: Vec) -> Vec:
    return mv(minv(a), v)


def meye(d: int, like: jnp.ndarray) -> Mat:
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return tuple(
        tuple(one if i == j else zero for j in range(d)) for i in range(d)
    )


def mzeros(d: int, like: jnp.ndarray) -> Mat:
    zero = jnp.zeros_like(like)
    return tuple(tuple(zero for _ in range(d)) for _ in range(d))


def vzeros(d: int, like: jnp.ndarray) -> Vec:
    zero = jnp.zeros_like(like)
    return tuple(zero for _ in range(d))


def mchol(a: Mat) -> Mat:
    """Unrolled lower Cholesky of a PD channel matrix (any static d)."""
    d = _dim(a)
    if d == 1:
        return ((jnp.sqrt(a[0][0]),),)
    zero = jnp.zeros_like(a[0][0])
    l = [[zero] * d for _ in range(d)]
    for j in range(d):
        s = a[j][j] - sum(l[j][k] * l[j][k] for k in range(j))
        l[j][j] = jnp.sqrt(s)
        for i in range(j + 1, d):
            t = a[i][j] - sum(l[i][k] * l[j][k] for k in range(j))
            l[i][j] = t / l[j][j]
    return tuple(tuple(row) for row in l)


def mchol_psd(a: Mat) -> Mat:
    """Guarded lower Cholesky for PSD (possibly rank-deficient) channel
    matrices: zero pivots yield zero columns instead of NaN, and the guards
    are double-``where``d so gradients stay finite at exact singularity
    (sparse sites carry ``Λ = 0`` at unobserved points)."""
    d = _dim(a)
    zero = jnp.zeros_like(a[0][0])
    l = [[zero] * d for _ in range(d)]
    for j in range(d):
        s = a[j][j] - sum(l[j][k] * l[j][k] for k in range(j))
        ok = s > 0
        s_safe = jnp.where(ok, s, 1.0)
        ljj = jnp.where(ok, jnp.sqrt(s_safe), 0.0)
        l[j][j] = ljj
        denom = jnp.where(ok, ljj, 1.0)
        for i in range(j + 1, d):
            t = a[i][j] - sum(l[i][k] * l[j][k] for k in range(j))
            l[i][j] = jnp.where(ok, t / denom, 0.0)
    return tuple(tuple(row) for row in l)


def tri_inv_lower(l: Mat, *, guarded: bool = False) -> Mat:
    """``L⁻¹`` of a lower-triangular channel matrix by unrolled forward
    substitution.  ``guarded=True`` maps zero pivots to zero rows (paired
    with :func:`mchol_psd` inside scans whose garbage lanes are masked)."""
    d = _dim(l)
    zero = jnp.zeros_like(l[0][0])
    recip = []
    for i in range(d):
        if guarded:
            ok = jnp.abs(l[i][i]) > 0
            safe = jnp.where(ok, l[i][i], 1.0)
            recip.append(jnp.where(ok, 1.0 / safe, 0.0))
        else:
            recip.append(1.0 / l[i][i])
    inv = [[zero] * d for _ in range(d)]
    for j in range(d):
        inv[j][j] = recip[j]
        for i in range(j + 1, d):
            s = sum(l[i][k] * inv[k][j] for k in range(j, i))
            inv[i][j] = -s * recip[i]
    return tuple(tuple(row) for row in inv)


def minv_pd(a: Mat, *, guarded: bool = False) -> Mat:
    """Inverse of a symmetric PD channel matrix, any static d.

    d ≤ 3 (unguarded) keeps the adjugate closed form; otherwise routes
    through Cholesky: ``A⁻¹ = L⁻ᵀ L⁻¹``."""
    d = _dim(a)
    if d <= 3 and not guarded:
        return minv(a)
    li = tri_inv_lower(mchol_psd(a) if guarded else mchol(a), guarded=guarded)
    return mm(mt(li), li)


def msolve_pd(a: Mat, b: Mat) -> Mat:
    """``A⁻¹ B`` for symmetric PD ``A``, any static d."""
    return mm(minv_pd(a), b)


def msolve_pd_vec(a: Mat, v: Vec) -> Vec:
    return mv(minv_pd(a), v)


def inv_ipl(p: Mat, lam: Mat) -> Mat:
    """``(I + P·Λ)⁻¹`` for PSD ``P`` and PSD (possibly singular) ``Λ``.

    d ≤ 3 uses the adjugate directly.  For larger d the product ``P·Λ`` is
    not symmetric, so we go through Woodbury with ``U = chol(Λ)``:

        ``(I + P U Uᵀ)⁻¹ = I − P U (I + Uᵀ P U)⁻¹ Uᵀ``

    where ``M = I + UᵀPU ⪰ I`` is symmetric PD — stable for any d, and
    exact at ``Λ = 0`` (sparse sites) thanks to the guarded chol."""
    d = _dim(p)
    if d <= 3:
        return minv(madd(meye(d, p[0][0]), mm(p, lam)))
    u = mchol_psd(lam)
    pu = mm(p, u)
    m = madd(meye(d, p[0][0]), mm(mt(u), pu))
    m_inv = minv_pd(m, guarded=True)
    return msub(meye(d, p[0][0]), mm(pu, mm(m_inv, mt(u))))


def logdet_ipl(p: Mat, lam: Mat):
    """``log|I + P·Λ|`` for PSD ``P``, PSD ``Λ`` — any static d via
    ``det(I + PUUᵀ) = det(I + UᵀPU)`` and the Cholesky-diagonal log-det."""
    d = _dim(p)
    if d <= 3:
        return jnp.log(det(madd(meye(d, p[0][0]), mm(p, lam))))
    u = mchol_psd(lam)
    m = madd(meye(d, p[0][0]), mm(mt(u), mm(p, u)))
    lm = mchol(m)
    return 2.0 * sum(jnp.log(lm[i][i]) for i in range(d))


def logdet_pd(a: Mat):
    """``log|A|`` for PD channel matrices, any static d (closed-form det
    for d ≤ 3, Cholesky-diagonal otherwise)."""
    d = _dim(a)
    if d <= 3:
        return jnp.log(det(a))
    l = mchol(a)
    return 2.0 * sum(jnp.log(l[i][i]) for i in range(d))


def madd_scalar_diag(a: Mat, s) -> Mat:
    """``A + s·I``."""
    d = _dim(a)
    return tuple(
        tuple(a[i][j] + s if i == j else a[i][j] for j in range(d))
        for i in range(d)
    )


def trace_prod(a: Mat, b: Mat):
    """``tr(A B)``."""
    d = _dim(a)
    return sum(a[i][k] * b[k][i] for i in range(d) for k in range(d))


def flatten_mat(m: Mat) -> Tuple[jnp.ndarray, ...]:
    return tuple(x for row in m for x in row)


def unflatten_mat(flat: Sequence[jnp.ndarray], d: int) -> Mat:
    return tuple(tuple(flat[i * d + j] for j in range(d)) for i in range(d))
