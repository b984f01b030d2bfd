"""Small dense linear-algebra helpers shared across the library.

These are the JAX equivalents of the helpers in the reference's
``markovflow/utils.py`` (block_diag :76, kronecker_product :107) plus a few
numerically defensive wrappers.  All functions are batched over arbitrary
leading dimensions and jit-friendly (static shapes only).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def transpose_last(x: jnp.ndarray) -> jnp.ndarray:
    """Swap the last two axes (batched matrix transpose)."""
    return jnp.swapaxes(x, -1, -2)


def symmetrize(x: jnp.ndarray) -> jnp.ndarray:
    """Return the symmetric part ``(x + xᵀ)/2`` over the last two axes."""
    return 0.5 * (x + transpose_last(x))


def cholesky_with_jitter(x: jnp.ndarray, jitter: float | None = None) -> jnp.ndarray:
    """Cholesky of a PSD matrix with a diagonal jitter for stability.

    Mirrors the reference's jitter pattern (markovflow/kernels/sde_kernel.py:333).
    """
    from ..config import default_jitter

    if jitter is None:
        jitter = default_jitter()
    d = x.shape[-1]
    eye = jnp.eye(d, dtype=x.dtype)
    return jnp.linalg.cholesky(x + jitter * eye)


def solve_psd(a: jnp.ndarray, b: jnp.ndarray, chol: jnp.ndarray | None = None) -> jnp.ndarray:
    """Solve ``a x = b`` for symmetric positive-definite ``a`` via Cholesky."""
    l = jnp.linalg.cholesky(a) if chol is None else chol
    return cho_solve(l, b)


def cho_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``(L Lᵀ) x = b`` given a lower Cholesky factor ``L``.

    Leading batch dims broadcast.
    """
    y = tri_solve(l, b)
    return tri_solve(l, y, transpose=True)


def _broadcast_batch(a: jnp.ndarray, b: jnp.ndarray):
    """Broadcast the leading (batch) dims of two stacks of matrices."""
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    return (
        jnp.broadcast_to(a, batch + a.shape[-2:]),
        jnp.broadcast_to(b, batch + b.shape[-2:]),
    )


def tri_solve(l: jnp.ndarray, b: jnp.ndarray, *, transpose: bool = False) -> jnp.ndarray:
    """Solve ``L x = b`` (or ``Lᵀ x = b``) for lower-triangular ``L``.

    Unlike raw ``lax.linalg.triangular_solve``, leading batch dims broadcast.
    ``d == 1`` blocks short-circuit to a divide, and ``d ≤ 8`` uses unrolled
    forward/backward substitution on scalar channels: the XLA
    TriangularSolve expansion on stacks of tiny blocks is a while-loop per
    call (profiled at ~100 ms/step in the spatio-temporal d=6 predict path)
    and the ``[N,d,d]`` operands tile-pad up to 28×.
    """
    if l.shape[-1] == 1 and b.shape[-2] == 1:
        return b / l[..., :1, :1]
    if _unroll_dim_ok(l.shape[-1], l.shape[:-2], b.shape[:-2]):
        return _tri_solve_unrolled(l, b, transpose=transpose)
    l, b = _broadcast_batch(l, b)
    return lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=transpose
    )


def _tri_solve_unrolled(l: jnp.ndarray, b: jnp.ndarray, *, transpose: bool) -> jnp.ndarray:
    """Unrolled substitution for lower-triangular ``L`` (static small d).

    Row ``i`` of the solution is computed as a ``[..., cols]`` slab, so the
    whole solve is O(d²) fusible elementwise ops regardless of batch shape.
    """
    d = l.shape[-1]
    rows = [b[..., i, :] for i in range(d)]  # each [..., cols]

    def lij(i, j):
        return l[..., i, j][..., None]

    x = [None] * d
    if transpose:
        # Lᵀ x = b: backward substitution, coefficient Lᵀ[i,k] = L[k,i]
        for i in range(d - 1, -1, -1):
            s = rows[i]
            for k in range(i + 1, d):
                s = s - lij(k, i) * x[k]
            x[i] = s / lij(i, i)
    else:
        for i in range(d):
            s = rows[i]
            for k in range(i):
                s = s - lij(i, k) * x[k]
            x[i] = s / lij(i, i)
    return jnp.stack(x, axis=-2)


#: unrolled scalar-channel ceiling for chol/matmul: beyond this the
#: O(d³) unrolled expression graph stops paying for itself
_UNROLL_MAX_DIM = 8

#: TPU-only ceiling for genuinely long stacks: XLA's Cholesky /
#: TriangularSolve custom calls process stacked tiny blocks essentially
#: sequentially on TPU (~2.5 µs per 14×14 f64 block, measured — 0.7 s for
#: one [10k,14,14] inverse), so reference-scale state dims (spatio-temporal
#: M_space=7 × Matern32 → d=14) stay unrolled there.  Off-TPU the LAPACK
#: batched kernels are fine and the wider graphs would only bloat CPU
#: compile times (the round-3 d=6 natgrad lesson), hence the backend gate
#: in ``_unroll_dim_ok``.
_UNROLL_MAX_DIM_LONG = 16

#: minimum number of stacked blocks before the unrolled forms engage.
#: The unroll is a LONG-grid TPU optimization (tile padding + while-loop
#: lowering of tiny-block custom calls, see chol_psd/matmul_small notes);
#: for short stacks it is pure compile-time liability — XLA:CPU's passes
#: go superlinear on the transposed (reverse-AD) unrolled graphs
#: (measured: grad of two matmul_small calls on [79,6,6] = 4k-line HLO,
#: 110 s compile; the identical dense-@ graph compiles in 6 s).  Matches
#: parallel/pskf.py::CH_THRESHOLD.  Single blocks (no stacked leading
#: dims — e.g. per-step operands inside lax.scan bodies, which trace
#: once) stay unrolled: the graphs are tiny and the dense alternative is
#: a per-iteration custom call on TPU.
_UNROLL_MIN_BLOCKS = 4096


def _unroll_pays(*batch_shapes) -> bool:
    """True when the unrolled scalar-channel form should engage for
    operands with the given (static) leading batch shapes."""
    batch = jnp.broadcast_shapes(*batch_shapes)
    n = 1
    for s in batch:
        n *= int(s)
    return n == 1 or n >= _UNROLL_MIN_BLOCKS


def _unroll_dim_ok(d: int, *batch_shapes) -> bool:
    """Unrolled-form dispatch combining the two ceilings: ``d ≤ 8``
    wherever ``_unroll_pays``; ``8 < d ≤ 16`` only on TPU and only for
    long stacks (no singleton exception — the wider graphs are a pure
    compile liability off the custom-call cliff)."""
    if d <= _UNROLL_MAX_DIM:
        return _unroll_pays(*batch_shapes)
    if d > _UNROLL_MAX_DIM_LONG or jax.default_backend() != "tpu":
        return False
    batch = jnp.broadcast_shapes(*batch_shapes)
    n = 1
    for s in batch:
        n *= int(s)
    return n >= _UNROLL_MIN_BLOCKS


def chol_psd(x: jnp.ndarray) -> jnp.ndarray:
    """Cholesky with small-``d`` fast paths.

    ``d == 1`` short-circuits to ``sqrt``; ``2 ≤ d ≤ 8`` uses an unrolled
    scalar-channel Cholesky.  The XLA ``Cholesky`` custom call on stacks of
    tiny blocks is catastrophically slow on TPU (measured 22 ms for
    ``f32[1e5,2,2]`` — half the GPR d=2 step), and ``[N,d,d]`` stacks
    tile-pad up to 64×; the unrolled form is pure VPU arithmetic on ``[N]``
    channels.  Non-PD inputs produce NaNs exactly like
    ``jnp.linalg.cholesky`` (callers mask zero blocks, see
    ``ssm_from_covariances``).
    """
    d = x.shape[-1]
    if d == 1:
        return jnp.sqrt(x)
    if _unroll_dim_ok(d, x.shape[:-2]):
        return _chol_unrolled(x)
    return jnp.linalg.cholesky(x)


def _chol_unrolled(x: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky–Crout on scalar channels (static ``d``).

    Symmetrizes the input like ``jnp.linalg.cholesky`` (lax ``cholesky``
    defaults to ``symmetrize_input=True``) — natgrad produces asymmetric
    precision blocks whose symmetric part is PD, and factoring the raw
    lower triangle NaNs where the XLA op succeeds.
    """
    d = x.shape[-1]
    c = [
        [0.5 * (x[..., i, j] + x[..., j, i]) if i != j else x[..., i, i] for j in range(d)]
        for i in range(d)
    ]
    l = [[None] * d for _ in range(d)]
    for j in range(d):
        s = c[j][j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        ljj = jnp.sqrt(s)
        l[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, d):
            s = c[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
    zero = jnp.zeros_like(c[0][0])
    rows = [
        jnp.stack([l[i][j] if j <= i else zero for j in range(d)], axis=-1)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=-2)


def matmul_small(
    a: jnp.ndarray, b: jnp.ndarray, *, max_unroll: int = _UNROLL_MAX_DIM
) -> jnp.ndarray:
    """Batched matmul over the last two axes, unrolled for tiny blocks.

    XLA lowers batched ``[N,d,d] @ [N,d,d]`` matmuls to convolution
    fusions that are bound by the 64× tile padding of the operands
    (~1 ms each at N=1e5, d=2 on v5e); the unrolled scalar-channel sum is
    ~10× faster.  Falls back to ``@`` beyond ``max_unroll``.

    ``max_unroll`` defaults to ``_UNROLL_MAX_DIM``: unrolling d=10+ blocks
    at every call site under ``jax.grad`` produced 170k-line HLO graphs
    (>30 min cold XLA compiles for the d=10 spatio-temporal ELBO).  Hot
    call sites on pairwise-joint ``2d×2d`` blocks (d ≤ 8 → size ≤ 16,
    e.g. ssm/conditionals.py) opt in with ``max_unroll=2*_UNROLL_MAX_DIM``
    — XLA's stack-matmul lowering is a while loop with f32→bf16x3
    emulation over padded operands (~8 ms per [20k,12,12] product on v5e).
    """
    m, k = a.shape[-2], a.shape[-1]
    k2, n = b.shape[-2], b.shape[-1]
    if max(m, k, n) > max_unroll or not _unroll_pays(a.shape[:-2], b.shape[:-2]):
        return a @ b
    rows = []
    for i in range(m):
        cols = []
        for j in range(n):
            s = a[..., i, 0] * b[..., 0, j]
            for p in range(1, k):
                s = s + a[..., i, p] * b[..., p, j]
            cols.append(s)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def matvec_small(
    a: jnp.ndarray, v: jnp.ndarray, *, max_unroll: int = _UNROLL_MAX_DIM
) -> jnp.ndarray:
    """Batched ``A v`` over the last axes, unrolled for tiny blocks.

    ``a: [..., m, k]``, ``v: [..., k]`` → ``[..., m]``.  The einsum/dot
    lowering of stack matvecs is the same while-loop MXU emulation as stack
    matmuls (see :func:`matmul_small`); the unrolled sum is fusible VPU work.
    Falls back to einsum beyond ``max_unroll`` (see :func:`matmul_small`
    for the compile-cost rationale; pairwise-block call sites opt in to
    ``2·_UNROLL_MAX_DIM``).
    """
    m, k = a.shape[-2], a.shape[-1]
    if max(m, k) > max_unroll or not _unroll_pays(a.shape[:-2], v.shape[:-1]):
        return jnp.einsum("...ij,...j->...i", a, v)
    rows = []
    for i in range(m):
        s = a[..., i, 0] * v[..., 0]
        for p in range(1, k):
            s = s + a[..., i, p] * v[..., p]
        rows.append(s)
    return jnp.stack(rows, axis=-1)


def solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a⁻¹ b`` with a scalar fast path for 1×1 systems.

    float64 systems solve via QR: TPU XLA implements Cholesky, QR, and
    triangular_solve for f64 but NOT LuDecomposition (``jnp.linalg.solve``
    / ``inv`` / ``slogdet`` abort the TPU compiler with "Only F32 and C64
    types are implemented in LuDecomposition").  The matrices here are tiny
    (d ≤ ~10), so QR's constant-factor cost is irrelevant.
    """
    d = a.shape[-1]
    if d == 1 and b.shape[-2] == 1:
        return b / a[..., :1, :1]
    if d == 2:
        return _solve2(a, b)
    if d == 3:
        return _solve3(a, b)
    if a.dtype == jnp.float64:
        return qr_solve(a, b)
    return jnp.linalg.solve(a, b)


def _solve2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 2×2 solve (adjugate).  Batched LU of tiny blocks is a
    custom call that dominates the whole filter on TPU (~30× slower than
    these elementwise products)."""
    a00, a01 = a[..., 0, 0], a[..., 0, 1]
    a10, a11 = a[..., 1, 0], a[..., 1, 1]
    det = (a00 * a11 - a01 * a10)[..., None, None]
    adj = jnp.stack(
        [jnp.stack([a11, -a01], axis=-1), jnp.stack([-a10, a00], axis=-1)], axis=-2
    )
    return matmul_small(adj, b) / det


def _solve3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3×3 solve via the cofactor adjugate."""
    c = jnp.cross(
        jnp.roll(a, -1, axis=-2), jnp.roll(a, -2, axis=-2), axis=-1
    )  # rows: cofactor rows of aᵀ
    det = jnp.sum(a[..., 0, :] * c[..., 0, :], axis=-1)[..., None, None]
    adj = jnp.swapaxes(c, -1, -2)
    return matmul_small(adj, b) / det


def qr_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``a x = b`` for general square ``a`` via Householder QR
    (TPU-supported in f64, unlike LU)."""
    q, r = jnp.linalg.qr(a)
    a_, b_ = _broadcast_batch(a, b)
    qtb = transpose_last(jnp.broadcast_to(q, a_.shape)) @ b_
    return lax.linalg.triangular_solve(
        jnp.broadcast_to(r, a_.shape), qtb, left_side=True, lower=False
    )


def inv_small(a: jnp.ndarray) -> jnp.ndarray:
    """``a⁻¹`` routed through :func:`solve_small` (LU-free under f64)."""
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    return solve_small(a, jnp.broadcast_to(eye, a.shape))


def logdet_pos(a: jnp.ndarray) -> jnp.ndarray:
    """``log det a`` for matrices with positive determinant.

    f64 uses ``Σ log |diag R|`` from QR (LU-free on TPU); other dtypes use
    ``slogdet``.  1×1 short-circuits to ``log``.
    """
    if a.shape[-1] == 1:
        return jnp.log(a[..., 0, 0])
    if a.dtype == jnp.float64:
        _, r = jnp.linalg.qr(a)
        return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(r, axis1=-2, axis2=-1))), axis=-1)
    return jnp.linalg.slogdet(a)[1]


def block_diag(matrices: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Batched block-diagonal concatenation of square matrices.

    Equivalent of markovflow/utils.py:76.  Each input has shape
    ``[..., dᵢ, dᵢ]`` with identical batch dims; output is
    ``[..., Σdᵢ, Σdᵢ]``.
    """
    if len(matrices) == 1:
        return matrices[0]
    rows = []
    dims = [m.shape[-1] for m in matrices]
    for i, m in enumerate(matrices):
        blocks = []
        for j, d in enumerate(dims):
            if i == j:
                blocks.append(m)
            else:
                shape = m.shape[:-2] + (m.shape[-2], d)
                blocks.append(jnp.zeros(shape, dtype=m.dtype))
        rows.append(jnp.concatenate(blocks, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def kron(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Kronecker product over the last two axes.

    Equivalent of markovflow/utils.py:107.
    """
    m, n = a.shape[-2], a.shape[-1]
    p, q = b.shape[-2], b.shape[-1]
    out = a[..., :, None, :, None] * b[..., None, :, None, :]
    return out.reshape(out.shape[:-4] + (m * p, n * q))


def mvn_logpdf(x: jnp.ndarray, mean: jnp.ndarray, chol_cov: jnp.ndarray) -> jnp.ndarray:
    """Multivariate normal log-density with a Cholesky-parameterized covariance.

    ``x, mean: [..., d]``, ``chol_cov: [..., d, d]`` → ``[...]``.
    """
    d = x.shape[-1]
    diff = (x - mean)[..., None]
    alpha = tri_solve(chol_cov, diff)[..., 0]
    maha = jnp.sum(alpha**2, axis=-1)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(chol_cov, axis1=-2, axis2=-1))), axis=-1)
    cst = d * jnp.log(2.0 * jnp.pi).astype(x.dtype)
    return -0.5 * (maha + log_det + cst)


def gaussian_kl(
    mean_q: jnp.ndarray,
    chol_q: jnp.ndarray,
    mean_p: jnp.ndarray,
    chol_p: jnp.ndarray,
) -> jnp.ndarray:
    """KL( N(mean_q, LqLqᵀ) ‖ N(mean_p, LpLpᵀ) ), batched over leading dims."""
    d = mean_q.shape[-1]
    lp_inv_lq = tri_solve(chol_p, chol_q)
    trace = jnp.sum(lp_inv_lq**2, axis=(-1, -2))
    diff = (mean_p - mean_q)[..., None]
    alpha = tri_solve(chol_p, diff)[..., 0]
    maha = jnp.sum(alpha**2, axis=-1)
    log_det_q = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_q, axis1=-2, axis2=-1))), axis=-1
    )
    log_det_p = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_p, axis1=-2, axis2=-1))), axis=-1
    )
    return 0.5 * (trace + maha - d + log_det_p - log_det_q)
