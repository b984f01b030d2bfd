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
``d`` is static (unrolled Python loops); inversion is closed-form adjugate
for d ≤ 3 — the library's SDE state dims (Matern12/32/52, harmonic, OU,
VanDerPol) are 1–3.  Everything is autodiff-transparent.
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
    "msolve",
    "msolve_vec",
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
    raise NotImplementedError("channelized det only for d <= 3")


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
    raise NotImplementedError("channelized inverse only for d <= 3")


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
    """Closed-form lower Cholesky of a PD channel matrix, d ≤ 3."""
    d = _dim(a)
    if d == 1:
        return ((jnp.sqrt(a[0][0]),),)
    if d == 2:
        l00 = jnp.sqrt(a[0][0])
        l10 = a[1][0] / l00
        l11 = jnp.sqrt(a[1][1] - l10 * l10)
        zero = jnp.zeros_like(l00)
        return ((l00, zero), (l10, l11))
    if d == 3:
        l00 = jnp.sqrt(a[0][0])
        l10 = a[1][0] / l00
        l20 = a[2][0] / l00
        l11 = jnp.sqrt(a[1][1] - l10 * l10)
        l21 = (a[2][1] - l20 * l10) / l11
        l22 = jnp.sqrt(a[2][2] - l20 * l20 - l21 * l21)
        zero = jnp.zeros_like(l00)
        return ((l00, zero, zero), (l10, l11, zero), (l20, l21, l22))
    raise NotImplementedError("channelized cholesky only for d <= 3")


def logdet_pd(a: Mat):
    """``log|A|`` for PD channel matrices (via the closed-form det)."""
    return jnp.log(det(a))


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
