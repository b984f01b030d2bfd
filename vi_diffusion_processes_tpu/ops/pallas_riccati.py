"""Pallas TPU kernels for the scalar Riccati sweep of ``naturals_to_ssm``.

The hottest structured op in CVI-DP is the backward recursion

    ``D_k = kd_k − b2_k / D_{k+1}``,   k = N−1 … 0

(the UDU' pivot sweep of the block-tridiagonal precision,
ssm_gaussian_transformations.py:333-512 in the reference, executed there by
sequential C++ ``cholesky_band``).  The pure-XLA path
(:func:`~.btd.btd_udu_parallel_1d`) runs it as a two-level scheme built from
``associative_scan``s — ~log N HBM passes.  Here the two heavy phases are
fused Pallas kernels (one HBM round trip each, VMEM-resident state,
sequential depth ``l`` with ``nb``-lane vectorization), with the tiny
``nb``-step scalar boundary pass left to an XLA ``lax.scan`` between them
(Mosaic has no efficient scalar-dynamic lane addressing):

* kernel A — compose the preconditioned Möbius window maps,
* XLA    — sequential boundary carry over the ``nb`` window maps,
* kernel B — the exact within-window recursion from the boundary values.

Backward pass is analytic: with cotangent ``ḡ_k`` of ``D_k``,

    ``k̄d_k = ĝ_k``, ``b̄2_k = −ĝ_k/D_{k+1}``,
    ``ĝ_k = ḡ_k + ĝ_{k-1} · b2_{k-1}/D_k²``

— a forward affine recursion solved with the parallel
:func:`~.btd.affine_scan` (registered via ``jax.custom_vjp``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_scan import _seq_vmap

__all__ = ["riccati_d_sweep"]


def _compose_kernel(kdt_ref, b2t_ref, w_ref):
    """Window-map composition: W ← M_i @ W, i = l−1 … 0, vectorized over
    the ``nb`` windows (lanes).  ``w_ref: [8, nb]`` (4 channels used).

    The loop is a *static Python unroll* over rank-2 ``[1, nb]`` rows: the
    Mosaic layout pass aborts on rank-1 vector values and dynamic sublane
    indices (layout.h rank check), and the unroll also keeps the running
    2×2 map in vector registers instead of round-tripping VMEM."""
    l, nb = kdt_ref.shape
    one = jnp.ones((1, nb), kdt_ref.dtype)
    zero = jnp.zeros((1, nb), kdt_ref.dtype)
    w00, w01, w10, w11 = one, zero, zero, one
    for i in range(l - 1, -1, -1):
        a00 = kdt_ref[i : i + 1, :]
        a01 = -b2t_ref[i : i + 1, :]
        p00 = a00 * w00 + a01 * w10
        p01 = a00 * w01 + a01 * w11
        # second row of M_i is [1, 0] → new bottom row = old top row
        scale = jax.lax.rsqrt(p00**2 + p01**2 + w00**2 + w01**2 + 1e-30)
        w00, w01, w10, w11 = p00 * scale, p01 * scale, w00 * scale, w01 * scale
    w_ref[0:1, :] = w00
    w_ref[1:2, :] = w01
    w_ref[2:3, :] = w10
    w_ref[3:4, :] = w11
    w_ref[4:8, :] = jnp.zeros((4, nb), kdt_ref.dtype)


def _sweep_kernel(kdt_ref, b2t_ref, s_ref, dbnd_ref, out_ref):
    """Exact within-window recursion from the boundary values
    (``dbnd_ref: [1, nb]``), sequential in ``l``, vectorized over windows.
    Statically unrolled with rank-2 rows for the same Mosaic layout reason
    as :func:`_compose_kernel`."""
    l, nb = kdt_ref.shape
    d = dbnd_ref[0:1, :]
    for i in range(l - 1, -1, -1):
        d = kdt_ref[i : i + 1, :] - b2t_ref[i : i + 1, :] / d
        out_ref[i : i + 1, :] = d * s_ref[i : i + 1, :]


def _interpret() -> bool:
    # interpret mode lets the kernels run (slowly) off-TPU, e.g. in tests
    return jax.default_backend() != "tpu"


# unrolled custom batching: vmap of a raw pallas_call synthesizes an
# i64-constant batching index map under jax_enable_x64 that Mosaic cannot
# legalize, and sequential_vmap's lax.map makes XLA:CPU compile the whole
# interpret-mode kernel inside a while body (superlinear — see
# ops/pallas_scan.py::_seq_vmap, which unrolls batched launches instead).
@_seq_vmap
def _window_maps(kdt_blk, b2t_blk):
    l, nb = kdt_blk.shape
    return pl.pallas_call(
        _compose_kernel,
        out_shape=jax.ShapeDtypeStruct((8, nb), kdt_blk.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(kdt_blk, b2t_blk)


@_seq_vmap
def _window_sweep(kdt_blk, b2t_blk, s_blk, d_bnd):
    l, nb = kdt_blk.shape
    return pl.pallas_call(
        _sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((l, nb), kdt_blk.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(kdt_blk, b2t_blk, s_blk, d_bnd.reshape(1, -1))


@jax.custom_vjp
def riccati_d_sweep(kd: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """``D_k = kd_k − b2_k/D_{k+1}`` over flat 1-D inputs ``[N]``
    (``b2[N-1]`` must be 0) — fused Pallas path with the diagonal
    preconditioning of :func:`~.btd.btd_udu_parallel_1d`."""
    return _riccati_fwd(kd, b2)[0]


def _riccati_fwd(kd, b2):
    n = kd.shape[-1]
    # lane-aligned window count; sequential depth = l (in-kernel) + nb (XLA)
    nb = 128 * max(1, min(4, n // (128 * 128)))
    l = -(-n // nb)
    pad = nb * l - n

    # diagonal preconditioning (elementwise; XLA fuses):
    # s_k = √b2_k (fallback |kd|), D̃ = D/s, kd̃ = kd/s, b̃² = b2/(s·s₊)
    s = jnp.where(b2 > 0, jnp.sqrt(b2), jnp.abs(kd) + 1e-30)
    s_next = jnp.concatenate([s[1:], jnp.ones_like(s[:1])])
    kd_t = kd / s
    b2_t = b2 / (s * s_next)

    def blockify(x, pad_value):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), pad_value, x.dtype)])
        return x.reshape(nb, l).T  # [l, nb]

    kdt_blk = blockify(kd_t, 1.0)
    b2t_blk = blockify(b2_t, 0.0)
    w = _window_maps(kdt_blk, b2t_blk)  # [8, nb]

    # boundary pass: tiny sequential scan over the nb window maps
    def boundary(carry, wm):
        p, q = carry
        p2 = wm[0] * p + wm[1] * q
        q2 = wm[2] * p + wm[3] * q
        scale = jax.lax.rsqrt(p2**2 + q2**2 + 1e-30)
        return (p2 * scale, q2 * scale), (p, q)

    one = jnp.ones((), kd.dtype)
    zero = jnp.zeros((), kd.dtype)
    _, (hb0, hb1) = lax.scan(boundary, (one, zero), w[:4].T, reverse=True)
    d_bnd = jnp.where(hb1 == 0, jnp.inf, hb0 / jnp.where(hb1 == 0, 1.0, hb1))

    d_blk = _window_sweep(kdt_blk, b2t_blk, blockify(s, 1.0), d_bnd)
    d = d_blk.T.reshape(nb * l)[:n]
    return d, (b2, d)


def _riccati_bwd(res, g):
    from .btd import affine_scan

    b2, d = res
    d_next = jnp.concatenate([d[1:], jnp.ones_like(d[:1])])
    # total adjoint, forward in k (∂D_k/∂D_{k+1} = b2_k/D_{k+1}²):
    # ĝ_k = ḡ_k + ĝ_{k-1}·(b2_{k-1}/D_k²), ĝ_0 = ḡ_0
    coeff = (b2[:-1] / jnp.maximum(d[1:] ** 2, 1e-30))[..., None, None]
    ghat_rest = affine_scan(coeff, g[1:][..., None], g[0][None])[..., 0]
    ghat = jnp.concatenate([g[:1], ghat_rest])
    kd_bar = ghat
    b2_bar = -ghat / jnp.where(d_next == 0, jnp.ones_like(d_next), d_next)
    b2_bar = jnp.concatenate([b2_bar[:-1], jnp.zeros_like(b2_bar[-1:])])
    return kd_bar, b2_bar


riccati_d_sweep.defvjp(_riccati_fwd, _riccati_bwd)
