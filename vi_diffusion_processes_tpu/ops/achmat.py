"""Array-channel small-matrix algebra: ``[d, d, *rest]`` stacks with the
algebra axes LEADING (data axes trailing/minormost).

Companion to :mod:`chmat` (tuple-of-scalar-channels).  The tuple form emits
``O(d³)`` separate HLO ops per matrix product, which is ideal for d ≤ 3 but
makes the d ≥ 4 scan-compose graphs explode: the GPR d=4 kernel-sum
value+grad at N=100k lowers to a 161k-line HLO whose *first* remote TPU
compile takes ~45 minutes (measured; d=2 is 20k lines).  Packing channels
into one ``[d, d, nb]`` array turns each matrix product into a single
broadcast-multiply + reduce pair — the algebra dims are leading (static,
tiny), the data dim stays minormost, so TPU tiling is unaffected and XLA
fuses the chains exactly like the scalar form.

Used inside the d ≥ 4 scan composes (parallel/pskf.py, ops/btd.py); the
d ≤ 3 hot paths keep the tuple form (measured best).  Cholesky-style
sequential pivots stay unrolled over static indices (slices of the packed
array); everything else is vectorized.

Conventions: matrix ``[d, d, *rest]`` (row, col, data...), vector
``[d, *rest]``.  All functions are autodiff-transparent; ``guarded``
variants are NaN-free-under-autodiff at exactly-singular inputs (the
double-``where`` pattern), mirroring chmat's semantics.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "pack_mat",
    "unpack_mat",
    "pack_vec",
    "unpack_vec",
    "amm",
    "amv",
    "amt",
    "asym",
    "achol",
    "achol_psd",
    "atri_inv_lower",
    "ainv_pd",
    "ainv_ipl",
    "alogdet_ipl",
    "avdot",
    "aquad_form",
    "aeye",
]


def pack_mat(flat: Sequence[jnp.ndarray], d: int) -> jnp.ndarray:
    """Row-major flat tuple of ``d²`` channels → ``[d, d, *rest]``."""
    return jnp.stack(list(flat)).reshape((d, d) + flat[0].shape)


def unpack_mat(a: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """``[d, d, *rest]`` → row-major flat tuple of ``d²`` channels."""
    d = a.shape[0]
    return tuple(a[i, j] for i in range(d) for j in range(d))


def pack_vec(flat: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(list(flat))


def unpack_vec(v: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    return tuple(v[i] for i in range(v.shape[0]))


def amm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``A @ B`` over the leading axes: ``[i,k,...] × [k,j,...] → [i,j,...]``."""
    return jnp.sum(a[:, :, None] * b[None, :, :], axis=1)


def amv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``A v``: ``[i,k,...] × [k,...] → [i,...]``."""
    return jnp.sum(a * v[None, :], axis=1)


def amt(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(a, 0, 1)


def asym(a: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (a + jnp.swapaxes(a, 0, 1))


def aeye(d: int, like: jnp.ndarray) -> jnp.ndarray:
    """Identity channel matrix broadcast over ``like``'s shape."""
    eye = jnp.eye(d, dtype=like.dtype).reshape((d, d) + (1,) * like.ndim)
    return jnp.broadcast_to(eye, (d, d) + like.shape)


def _assemble(rows, d):
    """List-of-lists of ``[*rest]`` entries → ``[d, d, *rest]``."""
    return jnp.stack([jnp.stack(r) for r in rows])


def achol(a: jnp.ndarray) -> jnp.ndarray:
    """Unrolled lower Cholesky of a PD ``[d, d, *rest]`` channel matrix."""
    d = a.shape[0]
    if d == 1:
        return jnp.sqrt(a)
    zero = jnp.zeros_like(a[0, 0])
    l = [[zero] * d for _ in range(d)]
    for j in range(d):
        s = a[j, j] - sum(l[j][k] * l[j][k] for k in range(j))
        l[j][j] = jnp.sqrt(s)
        inv = 1.0 / l[j][j]
        for i in range(j + 1, d):
            t = a[i, j] - sum(l[i][k] * l[j][k] for k in range(j))
            l[i][j] = t * inv
    return _assemble(l, d)


def achol_psd(a: jnp.ndarray) -> jnp.ndarray:
    """Guarded lower Cholesky for PSD channel matrices: zero pivots give
    zero columns, double-``where``d so gradients stay finite at exact
    singularity (chmat.mchol_psd semantics)."""
    d = a.shape[0]
    zero = jnp.zeros_like(a[0, 0])
    l = [[zero] * d for _ in range(d)]
    for j in range(d):
        s = a[j, j] - sum(l[j][k] * l[j][k] for k in range(j))
        ok = s > 0
        s_safe = jnp.where(ok, s, 1.0)
        ljj = jnp.where(ok, jnp.sqrt(s_safe), 0.0)
        l[j][j] = ljj
        denom = jnp.where(ok, ljj, 1.0)
        for i in range(j + 1, d):
            t = a[i, j] - sum(l[i][k] * l[j][k] for k in range(j))
            l[i][j] = jnp.where(ok, t / denom, 0.0)
    return _assemble(l, d)


def atri_inv_lower(l: jnp.ndarray, *, guarded: bool = False) -> jnp.ndarray:
    """``L⁻¹`` of a lower-triangular channel matrix (unrolled forward
    substitution; ``guarded=True`` maps zero pivots to zero rows)."""
    d = l.shape[0]
    zero = jnp.zeros_like(l[0, 0])
    recip = []
    for i in range(d):
        if guarded:
            ok = jnp.abs(l[i, i]) > 0
            safe = jnp.where(ok, l[i, i], 1.0)
            recip.append(jnp.where(ok, 1.0 / safe, 0.0))
        else:
            recip.append(1.0 / l[i, i])
    inv = [[zero] * d for _ in range(d)]
    for j in range(d):
        inv[j][j] = recip[j]
        for i in range(j + 1, d):
            s = sum(l[i, k] * inv[k][j] for k in range(j, i))
            inv[i][j] = -s * recip[i]
    return _assemble(inv, d)


def ainv_pd(a: jnp.ndarray, *, guarded: bool = False) -> jnp.ndarray:
    """Inverse of a symmetric PD channel matrix: ``A⁻¹ = L⁻ᵀ L⁻¹``."""
    li = atri_inv_lower(achol_psd(a) if guarded else achol(a), guarded=guarded)
    return amm(amt(li), li)


def ainv_ipl(p: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """``(I + P·Λ)⁻¹`` for PSD ``P``, PSD (possibly singular) ``Λ`` via
    Woodbury with ``U = chol(Λ)`` (chmat.inv_ipl semantics, any d):

        ``(I + P U Uᵀ)⁻¹ = I − P U (I + Uᵀ P U)⁻¹ Uᵀ``.
    """
    u = achol_psd(lam)
    pu = amm(p, u)
    m = aeye(p.shape[0], p[0, 0]) + amm(amt(u), pu)
    m_inv = ainv_pd(m, guarded=True)
    return aeye(p.shape[0], p[0, 0]) - amm(pu, amm(m_inv, amt(u)))


def alogdet_ipl(p: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """``log|I + P·Λ|`` for PSD ``P``, PSD ``Λ`` — any static d via
    ``det(I + PUUᵀ) = det(I + UᵀPU)`` and the Cholesky-diagonal log-det
    (chmat.logdet_ipl semantics; ``I + UᵀPU ⪰ I`` so the unguarded pivot
    sqrt is safe)."""
    u = achol_psd(lam)
    m = aeye(p.shape[0], p[0, 0]) + amm(amt(u), amm(p, u))
    lm = achol(m)
    d = p.shape[0]
    return 2.0 * sum(jnp.log(lm[i, i]) for i in range(d))


def avdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``aᵀ b`` over the leading channel axis: ``[d, ...] × [d, ...] → [...]``."""
    return jnp.sum(a * b, axis=0)


def aquad_form(v: jnp.ndarray, a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``vᵀ A w`` on channel operands."""
    return avdot(v, amv(a, w))
