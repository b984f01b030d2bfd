"""Fully-fused Pallas TPU scans for the d=1 CVI-DP hot loop.

Profiling the packed natgrad step at T=100k showed ~90% of device time in
slice/pad/dynamic_update_slice plumbing from the XLA blocked scans (~4,000
tiny ops per step, ~1.5 µs fixed cost each; the arithmetic itself is ~0.2
ms).  The reference meets the same recursions with sequential C++
(banded_matrices cholesky/solve kernels,
ssm_gaussian_transformations.py:333-512); the TPU answer is to keep the
*whole* scan — window sweep, cross-window combine, boundary application —
inside one Pallas kernel so each sequential step costs VPU cycles instead
of an XLA op dispatch:

* phase A: per-window composition, sequential over the window length ``l``,
  vectorized across ``nb`` windows,
* phase B: scan ACROSS the windows in-register — Hillis–Steele over the
  lane axis plus a 3-step combine over the sublane axis (``pltpu.roll`` +
  iota masking); no XLA scan anywhere,
* phase C: the exact within-window recursion from the boundary values
  (1 div/mul per step instead of a map compose).

Windows are packed into full vregs as ``[8, L]`` rows (window ``w`` lives
at sublane ``w // L``, lane ``w % L``) — a ``[1, nb]`` row layout would
waste 7/8 of each vector register on sublane padding.

Because Mosaic has no float64, the f64-precision scans (the natural-
parameter algebra must stay ≈f64 — see models/cvi_dp.py::full_sites) run in
**double-float arithmetic**: each f64 operand is split into a (hi, lo) f32
pair and composed with error-compensated primitives (Dekker two_prod with
Veltkamp splitting, Knuth two_sum) — ~49-bit effective mantissa, ~4e-15
relative error, vs f64's 53 bits.  The projective normalization scale in
the Möbius sweep is plain f32: any common per-lane scale cancels in the
final ratio, so its rounding never reaches the result.

Kernels:
* :func:`riccati_d_sweep_df` — ``D_k = kd_k − b2_k / D_{k+1}`` on f64
  inputs (the UDU' pivot sweep), via preconditioned Möbius window maps.
* :func:`linear_recurrence` — ``x_k = t_k·x_{k∓1} + c_k`` forward/reverse,
  in plain f32 or double-float, for the bidiagonal mean solves and the
  forward marginal recursions.

Both are ``custom_vjp``-wrapped with analytic adjoints (the adjoint of a
linear recurrence is the transposed recurrence, run back through the same
kernel; the Riccati adjoint is the affine recursion of
ops/pallas_riccati.py:21-27).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["riccati_d_sweep_df", "linear_recurrence", "dist_q_1d_planes"]

SUB = 8  # f32 sublane tile

# vmap of a raw pallas_call synthesizes a batching index map whose constant
# operands trace as i64 under jax_enable_x64, which Mosaic refuses to
# legalize ("func.return (i32, i64, i64, i64)").  Every pallas_call below is
# therefore given a custom batching rule: one kernel launch per batch
# element, which is also the right schedule for these full-array VMEM
# kernels (no grid to batch over).  The loop is UNROLLED rather than routed
# through ``jax.custom_batching.sequential_vmap``: that helper lowers to a
# ``lax.map`` whose while-body is the whole kernel, and XLA:CPU's compile
# of the interpret-mode kernel inside a while body is superlinear (>10 min
# for ONE vmapped linear_recurrence at n=5000, measured) while the same
# kernel unrolled twice compiles in seconds.  Batch axes here are tiny
# (vmapped trajectories), so unrolling is also the faster device schedule.
def _seq_vmap(f):
    cf = jax.custom_batching.custom_vmap(f)

    @cf.def_vmap
    def _rule(axis_size, in_batched, *args):
        def take(x, batched, i):
            return x[i] if batched else x

        outs = [
            cf(*(take(a, b, i) for a, b in zip(args, in_batched)))
            for i in range(axis_size)
        ]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
        return stacked, jax.tree_util.tree_map(lambda _: True, stacked)

    return cf


# ------------------------------------------------------------------ df ops
# double-float (hi, lo) f32 arithmetic.  All operands are [8, L] rows.

_SPLIT = 4097.0  # 2^12 + 1 (Veltkamp split constant for f32)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _fast_two_sum(a, b):  # requires |a| >= |b| (normalized results)
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = a * _SPLIT
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _fast_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _fast_two_sum(p, e)


def df_scale(x, s):
    """df × plain-f32 (projective normalization; scale rounding cancels)."""
    p, e = _two_prod(x[0], s)
    e = e + x[1] * s
    return _fast_two_sum(p, e)


def df_div(x, y):
    """df / df via one Newton-corrected long division."""
    q0 = x[0] / y[0]
    r = df_sub(x, df_scale(y, q0))
    q1 = (r[0] + r[1]) / y[0]
    return _fast_two_sum(q0, q1)


def df_where(mask, x, y):
    return (jnp.where(mask, x[0], y[0]), jnp.where(mask, x[1], y[1]))


def df_abs(x):
    neg = x[0] < 0
    return (jnp.where(neg, -x[0], x[0]), jnp.where(neg, -x[1], x[1]))


def df_sqrt(x, guard):
    """√x for x ≥ 0 via one df Newton step; ``guard`` masks rows where the
    caller will discard the result (keeps the seeded division finite)."""
    q0 = jnp.sqrt(jnp.where(guard, x[0], 1.0))
    r = df_div(x, (q0, jnp.zeros_like(q0)))
    return df_scale(df_add((q0, jnp.zeros_like(q0)), r), jnp.asarray(0.5, q0.dtype))


def _f64_to_df(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _df_to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


# ------------------------------------------------------------- layout utils
def _pick_shape(n: int) -> Tuple[int, int]:
    """(nb, l): nb = SUB·L windows of length l = ceil(n / nb)."""
    nb = 2048 if n >= 32768 else 512
    l = -(-n // nb)
    return nb, l


def _blockify(x, nb, l, pad_value):
    """[n] → [l, 8, L]: row i, sublane s, lane m = element (s·L + m)·l + i
    (window w = s·L + m owns the contiguous chunk [w·l, (w+1)·l))."""
    n = x.shape[0]
    pad = nb * l - n
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), pad_value, x.dtype)])
    return x.reshape(nb, l).T.reshape(l, SUB, nb // SUB)


def _unblockify(blk, n):
    l = blk.shape[0]
    return blk.reshape(l, -1).T.reshape(-1)[:n]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll(r, shift, axis):
    """Circular shift (``shift`` may be negative).  ``pltpu.roll`` on TPU;
    ``jnp.roll`` under interpret mode (the Mosaic primitive has no
    interpreter lowering)."""
    if _interpret():
        return jnp.roll(r, shift, axis)
    # under x64 a Python-int shift traces as i64; tpu.dynamic_rotate is i32
    return pltpu.roll(r, shift=jnp.int32(shift % r.shape[axis]), axis=axis)


def _win_shift(rows, sh, fill, *, toward_start):
    """Shift each ``[8, L]`` row by ``sh`` positions in WINDOW order
    (w = sublane·L + lane), filling vacated windows with the per-channel
    ``fill`` constants.  Window-order shifts decompose into a lane shift
    (sh < L, sh a power of two dividing L) or a pure sublane shift
    (sh = k·L).  ``toward_start=True`` brings window ``w+sh`` to ``w``."""
    s8, L = rows[0].shape
    sgn = -1 if toward_start else 1
    if sh < L:
        lane = lax.broadcasted_iota(jnp.int32, (s8, L), 1)
        sub = lax.broadcasted_iota(jnp.int32, (s8, L), 0)
        rolled = tuple(_roll(r, sgn * sh, 1) for r in rows)
        if toward_start:
            # lanes ≥ L−sh take the next sublane's wrapped values
            carry = tuple(_roll(r, -1, 0) for r in rolled)
            edge = lane >= L - sh
            out = tuple(jnp.where(edge, c, r) for r, c in zip(rolled, carry))
            # windows past the end: last sublane's edge lanes
            invalid = jnp.logical_and(edge, sub == s8 - 1)
        else:
            carry = tuple(_roll(r, 1, 0) for r in rolled)
            edge = lane < sh
            out = tuple(jnp.where(edge, c, r) for r, c in zip(rolled, carry))
            invalid = jnp.logical_and(edge, sub == 0)
        return tuple(
            jnp.where(invalid, jnp.asarray(f, r.dtype), r)
            for r, f in zip(out, fill)
        )
    # sublane-level shift: sh = k·L
    k = sh // L
    sub = lax.broadcasted_iota(jnp.int32, (s8, L), 0)
    rolled = tuple(_roll(r, sgn * k, 0) for r in rows)
    invalid = (sub >= s8 - k) if toward_start else (sub < k)
    return tuple(
        jnp.where(invalid, jnp.asarray(f, r.dtype), r) for r, f in zip(rolled, fill)
    )


# ======================================================== riccati (Möbius)
def _riccati_kernel(kdh_ref, kdl_ref, b2h_ref, b2l_ref, outh_ref, outl_ref):
    """Fused D-sweep: window Möbius maps (A), window-order suffix scan of
    the maps (B), exact within-window recursion (C).  All values are
    rank-2 ``[8, L]`` (Mosaic rejects rank-1 vectors and dynamic sublane
    indices — every loop is a static unroll)."""
    l = kdh_ref.shape[0]
    s8, L = kdh_ref.shape[1], kdh_ref.shape[2]
    nb = s8 * L
    fdt = jnp.float32
    one = jnp.ones((s8, L), fdt)
    zero = jnp.zeros((s8, L), fdt)

    def row(rh, rl, i):
        return (rh[i], rl[i])

    # ---- phase A: W ← M_i ∘ W, i = l−1 … 0 (suffix map of the window).
    # M_i = [[kd_i, −b2_i], [1, 0]]: the new bottom row is the old top row.
    w00, w01 = (one, zero), (zero, zero)
    w10, w11 = (zero, zero), (one, zero)
    for i in range(l - 1, -1, -1):
        kd = row(kdh_ref, kdl_ref, i)
        mb2 = row(b2h_ref, b2l_ref, i)  # already −b2
        p00 = df_add(df_mul(kd, w00), df_mul(mb2, w10))
        p01 = df_add(df_mul(kd, w01), df_mul(mb2, w11))
        scale = lax.rsqrt(
            p00[0] ** 2 + p01[0] ** 2 + w00[0] ** 2 + w01[0] ** 2 + 1e-30
        )
        w10 = df_scale(w00, scale)
        w11 = df_scale(w01, scale)
        w00 = df_scale(p00, scale)
        w01 = df_scale(p01, scale)

    # ---- phase B: inclusive suffix S_w = W_w ∘ W_{w+1} ∘ … (matrix
    # product, earlier window = left factor), Hillis–Steele in window order
    sh = 1
    while sh < nb:
        sr = _win_shift(
            (w00[0], w00[1], w01[0], w01[1], w10[0], w10[1], w11[0], w11[1]),
            sh,
            (1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0),
            toward_start=True,
        )
        s00, s01 = (sr[0], sr[1]), (sr[2], sr[3])
        s10, s11 = (sr[4], sr[5]), (sr[6], sr[7])
        n00 = df_add(df_mul(w00, s00), df_mul(w01, s10))
        n01 = df_add(df_mul(w00, s01), df_mul(w01, s11))
        n10 = df_add(df_mul(w10, s00), df_mul(w11, s10))
        n11 = df_add(df_mul(w10, s01), df_mul(w11, s11))
        scale = lax.rsqrt(
            n00[0] ** 2 + n01[0] ** 2 + n10[0] ** 2 + n11[0] ** 2 + 1e-30
        )
        w00, w01 = df_scale(n00, scale), df_scale(n01, scale)
        w10, w11 = df_scale(n10, scale), df_scale(n11, scale)
        sh *= 2

    # boundary D entering window w from the right = first-column ratio of
    # S_{w+1} (identity for the last window, where the guarded select keeps
    # the division finite; b2 = 0 at the true final element resets the
    # recursion there, so the placeholder never reaches a real D).
    t00h, t00l, t10h, t10l = _win_shift(
        (w00[0], w00[1], w10[0], w10[1]), 1, (1.0, 0.0, 0.0, 0.0), toward_start=True
    )
    degenerate = t10h == 0.0
    t10 = df_where(degenerate, (one, zero), (t10h, t10l))
    d = df_div(df_where(degenerate, (one, zero), (t00h, t00l)), t10)

    # ---- phase C: exact within-window recursion from the boundary value
    for i in range(l - 1, -1, -1):
        kd = row(kdh_ref, kdl_ref, i)
        mb2 = row(b2h_ref, b2l_ref, i)
        d = df_add(kd, df_div(mb2, d))  # kd − b2/D (b2 pre-negated)
        outh_ref[i] = d[0]
        outl_ref[i] = d[1]


@_seq_vmap
def _ric_call(kdh_b, kdl_b, nb2h_b, nb2l_b):
    return pl.pallas_call(
        _riccati_kernel,
        out_shape=[jax.ShapeDtypeStruct(kdh_b.shape, jnp.float32)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=_interpret(),
    )(kdh_b, kdl_b, nb2h_b, nb2l_b)


@jax.custom_vjp
def riccati_d_sweep_df(kd: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """``D_k = kd_k − b2_k/D_{k+1}`` on float64 ``[N]`` inputs
    (``b2[N-1] = 0``), via the fused double-float Pallas kernel.

    Same contract as the f64 dispatch of :func:`~.btd.riccati_d_scalar`;
    ~4e-15 relative error vs the exact f64 recursion.
    """
    return _ric_fwd(kd, b2)[0]


def _ric_fwd(kd, b2):
    n = kd.shape[-1]
    nb, l = _pick_shape(n)

    # diagonal preconditioning in f64 (keeps the df window products O(1))
    s = jnp.where(b2 > 0, jnp.sqrt(b2), jnp.abs(kd) + 1e-300)
    s_next = jnp.concatenate([s[1:], jnp.ones_like(s[:1])])
    kd_t = kd / s
    b2_t = b2 / (s * s_next)

    kdh, kdl = _f64_to_df(kd_t)
    nb2h, nb2l = _f64_to_df(-b2_t)
    blocks = [
        _blockify(kdh, nb, l, 1.0),
        _blockify(kdl, nb, l, 0.0),
        _blockify(nb2h, nb, l, 0.0),
        _blockify(nb2l, nb, l, 0.0),
    ]
    outh, outl = _ric_call(*blocks)
    d = _df_to_f64(_unblockify(outh, n), _unblockify(outl, n)) * s
    return d, (b2, d)


def _ric_bwd(res, g):
    # identical adjoint to ops/pallas_riccati.py:155-168, routed through
    # the fused linear-recurrence kernel
    b2, d = res
    coeff = b2[:-1] / jnp.maximum(d[1:] ** 2, 1e-300)
    ghat_rest = linear_recurrence(coeff, g[1:], g[0])
    ghat = jnp.concatenate([g[:1], ghat_rest])
    d_next = jnp.concatenate([d[1:], jnp.ones_like(d[:1])])
    b2_bar = -ghat / jnp.where(d_next == 0, jnp.ones_like(d_next), d_next)
    b2_bar = jnp.concatenate([b2_bar[:-1], jnp.zeros_like(b2_bar[-1:])])
    return ghat, b2_bar


riccati_d_sweep_df.defvjp(_ric_fwd, _ric_bwd)


# =================================================== linear recurrence
def _linrec_kernel_df(th_ref, tl_ref, ch_ref, cl_ref, outh_ref, outl_ref, *, reverse):
    """df kernel body: affine window maps (A), window-order exclusive
    combine (B), within-window recursion (C).  Compose is the affine value
    map x ↦ A·x + B with the current window as the OUTER factor."""
    l, s8, L = th_ref.shape
    nb = s8 * L
    fdt = jnp.float32
    one = (jnp.ones((s8, L), fdt), jnp.zeros((s8, L), fdt))
    zero = (jnp.zeros((s8, L), fdt), jnp.zeros((s8, L), fdt))
    order = range(l - 1, -1, -1) if reverse else range(l)

    a, b = one, zero
    for i in order:
        t = (th_ref[i], tl_ref[i])
        c = (ch_ref[i], cl_ref[i])
        a = df_mul(t, a)
        b = df_add(df_mul(t, b), c)

    sh = 1
    while sh < nb:
        sah, sal, sbh, sbl = _win_shift(
            (a[0], a[1], b[0], b[1]), sh, (1.0, 0.0, 0.0, 0.0), toward_start=reverse
        )
        sa, sb = (sah, sal), (sbh, sbl)
        b = df_add(df_mul(a, sb), b)
        a = df_mul(a, sa)
        sh *= 2
    bnd = _win_shift((b[0], b[1]), 1, (0.0, 0.0), toward_start=reverse)
    x = (bnd[0], bnd[1])

    for i in order:
        x = df_add(df_mul((th_ref[i], tl_ref[i]), x), (ch_ref[i], cl_ref[i]))
        outh_ref[i] = x[0]
        outl_ref[i] = x[1]


def _linrec_kernel_f32(t_ref, c_ref, out_ref, *, reverse):
    l = t_ref.shape[0]
    s8, L = t_ref.shape[1], t_ref.shape[2]
    nb = s8 * L
    one = jnp.ones((s8, L), t_ref.dtype)
    zero = jnp.zeros((s8, L), t_ref.dtype)
    order = range(l - 1, -1, -1) if reverse else range(l)

    a, b = one, zero
    for i in order:
        t = t_ref[i]
        a = t * a
        b = t * b + c_ref[i]
    sh = 1
    while sh < nb:
        sa, sb = _win_shift((a, b), sh, (1.0, 0.0), toward_start=reverse)
        b = a * sb + b
        a = a * sa
        sh *= 2
    (x,) = _win_shift((b,), 1, (0.0,), toward_start=reverse)
    for i in order:
        x = t_ref[i] * x + c_ref[i]
        out_ref[i] = x


@functools.lru_cache(maxsize=None)
def _linrec_call_df(reverse):
    @_seq_vmap
    def call(th_b, tl_b, ch_b, cl_b):
        return pl.pallas_call(
            functools.partial(_linrec_kernel_df, reverse=reverse),
            out_shape=[jax.ShapeDtypeStruct(th_b.shape, jnp.float32)] * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            interpret=_interpret(),
        )(th_b, tl_b, ch_b, cl_b)

    return call


@functools.lru_cache(maxsize=None)
def _linrec_call_f32(reverse):
    @_seq_vmap
    def call(t_b, c_b):
        return pl.pallas_call(
            functools.partial(_linrec_kernel_f32, reverse=reverse),
            out_shape=jax.ShapeDtypeStruct(t_b.shape, t_b.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(t_b, c_b)

    return call


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear_recurrence(t: jnp.ndarray, c: jnp.ndarray, x0, reverse: bool = False):
    """``x_k = t_k·x_{k−1} + c_k`` (forward; ``x_{-1} = x0``) or
    ``x_k = t_k·x_{k+1} + c_k`` (reverse; ``x_N = x0``) over ``[N]``
    arrays, fully fused on TPU.  float64 inputs run in double-float;
    float32 natively.  Returns ``x [N]`` in the input dtype.

    Pallas fast path behind :func:`~.btd.scalar_affine_all` (the bidiagonal
    mean solves of ``naturals_to_ssm_params``) and the packed marginal
    recursions (models/cvi_dp_packed.py::_marginals_1d).
    """
    return _linrec_fwd(t, c, x0, reverse)[0]


def _linrec_fwd(t, c, x0, reverse):
    n = t.shape[0]
    nb, l = _pick_shape(n)
    # fold the boundary value into the recurrence's first element
    if reverse:
        c = c.at[-1].add(t[-1] * x0)
    else:
        c = c.at[0].add(t[0] * x0)

    if t.dtype == jnp.float64:
        th, tl = _f64_to_df(t)
        ch, cl = _f64_to_df(c)
        blocks = [
            _blockify(th, nb, l, 0.0),
            _blockify(tl, nb, l, 0.0),
            _blockify(ch, nb, l, 0.0),
            _blockify(cl, nb, l, 0.0),
        ]
        outh, outl = _linrec_call_df(reverse)(*blocks)
        x = _df_to_f64(_unblockify(outh, n), _unblockify(outl, n))
    else:
        blocks = [_blockify(t, nb, l, 0.0), _blockify(c, nb, l, 0.0)]
        out = _linrec_call_f32(reverse)(*blocks)
        x = _unblockify(out, n)
    return x, (t, x, x0)


def _linrec_bwd(reverse, res, g):
    """Adjoint: the transposed recurrence in the opposite direction.  For
    forward ``x_k = t_k x_{k−1} + c_k``: ``c̄_k = ĝ_k`` with
    ``ĝ_k = g_k + t_{k+1} ĝ_{k+1}``, ``t̄_k = ĝ_k·x_{k−1}``,
    ``x̄0 = t_0 ĝ_0`` (mirrored for reverse)."""
    t, x, x0 = res
    if reverse:
        t_shift = jnp.concatenate([jnp.zeros_like(t[:1]), t[:-1]])
        ghat = linear_recurrence(t_shift, g, jnp.zeros((), t.dtype), False)
        x_next = jnp.concatenate([x[1:], jnp.reshape(x0, (1,)).astype(t.dtype)])
        t_bar = ghat * x_next
        x0_bar = t[-1] * ghat[-1]
    else:
        t_shift = jnp.concatenate([t[1:], jnp.zeros_like(t[:1])])
        ghat = linear_recurrence(t_shift, g, jnp.zeros((), t.dtype), True)
        x_prev = jnp.concatenate([jnp.reshape(x0, (1,)).astype(t.dtype), x[:-1]])
        t_bar = ghat * x_prev
        x0_bar = t[0] * ghat[0]
    return t_bar, ghat, x0_bar


linear_recurrence.defvjp(_linrec_fwd, _linrec_bwd)


# ============================================== fused d=1 dist_q mega-kernel
def _dist_q_kernel(
    kdh_ref, kdl_ref, ksh_ref, ksl_ref, n1h_ref, n1l_ref,
    covs_ref, a_ref, w_ref, mu_ref, v_ref,
    uh_s, ul_s, wh_s, wl_s, cvh_s, cvl_s,
    sh_s, sl_s, kth_s, ktl_s, bth_s, btl_s,
):
    """The whole ``naturals → SSM params → marginals`` chain for d = 1 in
    ONE kernel (five chained recurrences), replacing five separate pallas
    calls whose HBM round-trips + ``_blockify`` relayouts dominated the
    CVI-DP step's device time (~95 µs/step of reshape+copy at T=100k).

    Inputs are the RAW df naturals channels (``kd = −2·θ_diag``,
    ``ks = −θ_sub`` zero-padded to [N], ``θ_mean``); the diagonal
    preconditioning of ``_ric_fwd`` (``D = s·D_t``) happens in-kernel in
    double-float — any positive ``s`` preserves the algebra exactly, the
    unscalings ``u = ks/(s₊·D_t₊)`` and ``covs = 1/(s·D_t)`` use the same
    in-kernel ``s``.  Outputs are the f32 quantities the packed model
    consumes.  Sequence:

    0. ``s = √(ks²)`` (or ``|kd|`` where ks = 0), ``kd_t = kd/s``,
       ``−b2_t = −ks²/(s·s₊)`` into df scratch,
    1. Riccati pivot sweep ``D_k = kd_k − b2_k/D_{k+1}`` (phases A/B/C of
       :func:`riccati_d_sweep_df`), emitting ``u_k = ks_k/(s₊·D_t_{k+1})``
       (df scratch; ``a = −u``) and ``covs = 1/(s·D_t)`` along phase C,
    2. reverse bidiagonal solve ``z_k = −u_k·z_{k+1} + θ_k`` and
       ``w = covs·z`` (df scratch; ``b = w[1:]`` outside),
    3. forward mean solve ``μ_k = −u_{k−1}·μ_{k−1} + w_k`` (exact df —
       the separate f32 marginal-mean recurrence becomes redundant),
    4. forward f32 variance recurrence ``v_k = u²_{k−1}·v_{k−1} + covs_k``.
    """
    l, s8, L = kdh_ref.shape
    nb = s8 * L
    fdt = jnp.float32
    one = jnp.ones((s8, L), fdt)
    zero = jnp.zeros((s8, L), fdt)
    one_df = (one, zero)

    def row(rh, rl, i):
        return (rh[i], rl[i])

    # ---- phase 0: diagonal preconditioner s and the scaled channels
    for i in range(l):
        ks = row(ksh_ref, ksl_ref, i)
        b2 = df_mul(ks, ks)
        nondeg = b2[0] > 0
        s = df_where(nondeg, df_sqrt(b2, nondeg), df_abs(row(kdh_ref, kdl_ref, i)))
        sh_s[i] = s[0]
        sl_s[i] = s[1]
    # s₊ boundary row: next window's first s (identity fill past the end)
    snbh, snbl = _win_shift((sh_s[0], sl_s[0]), 1, (1.0, 0.0), toward_start=True)

    def s_next(i):
        if i == l - 1:
            return (snbh, snbl)
        return (sh_s[i + 1], sl_s[i + 1])

    for i in range(l):
        s = (sh_s[i], sl_s[i])
        kt = df_div(row(kdh_ref, kdl_ref, i), s)
        kth_s[i] = kt[0]
        ktl_s[i] = kt[1]
        ks = row(ksh_ref, ksl_ref, i)
        bt = df_div(df_mul(ks, ks), df_mul(s, s_next(i)))
        bth_s[i] = -bt[0]
        btl_s[i] = -bt[1]

    # ---- phase R-A: window Möbius suffix maps (as _riccati_kernel)
    w00, w01 = one_df, (zero, zero)
    w10, w11 = (zero, zero), one_df
    for i in range(l - 1, -1, -1):
        kd = row(kth_s, ktl_s, i)
        mb2 = row(bth_s, btl_s, i)
        p00 = df_add(df_mul(kd, w00), df_mul(mb2, w10))
        p01 = df_add(df_mul(kd, w01), df_mul(mb2, w11))
        scale = lax.rsqrt(
            p00[0] ** 2 + p01[0] ** 2 + w00[0] ** 2 + w01[0] ** 2 + 1e-30
        )
        w10 = df_scale(w00, scale)
        w11 = df_scale(w01, scale)
        w00 = df_scale(p00, scale)
        w01 = df_scale(p01, scale)

    # ---- phase R-B: window-order suffix composition (Hillis–Steele)
    sh = 1
    while sh < nb:
        sr = _win_shift(
            (w00[0], w00[1], w01[0], w01[1], w10[0], w10[1], w11[0], w11[1]),
            sh,
            (1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0),
            toward_start=True,
        )
        s00, s01 = (sr[0], sr[1]), (sr[2], sr[3])
        s10, s11 = (sr[4], sr[5]), (sr[6], sr[7])
        n00 = df_add(df_mul(w00, s00), df_mul(w01, s10))
        n01 = df_add(df_mul(w00, s01), df_mul(w01, s11))
        n10 = df_add(df_mul(w10, s00), df_mul(w11, s10))
        n11 = df_add(df_mul(w10, s01), df_mul(w11, s11))
        scale = lax.rsqrt(
            n00[0] ** 2 + n01[0] ** 2 + n10[0] ** 2 + n11[0] ** 2 + 1e-30
        )
        w00, w01 = df_scale(n00, scale), df_scale(n01, scale)
        w10, w11 = df_scale(n10, scale), df_scale(n11, scale)
        sh *= 2

    t00h, t00l, t10h, t10l = _win_shift(
        (w00[0], w00[1], w10[0], w10[1]), 1, (1.0, 0.0, 0.0, 0.0), toward_start=True
    )
    degenerate = t10h == 0.0
    t10 = df_where(degenerate, one_df, (t10h, t10l))
    d = df_div(df_where(degenerate, one_df, (t00h, t00l)), t10)

    # ---- phase R-C: exact pivot recursion, emitting u, a, covs
    rec = df_div(one_df, d)  # 1/D_t_{i+1} entering position i
    for i in range(l - 1, -1, -1):
        u = df_mul(row(ksh_ref, ksl_ref, i), df_div(rec, s_next(i)))
        uh_s[i] = u[0]
        ul_s[i] = u[1]
        a_ref[i] = -(u[0] + u[1])
        d = df_add(row(kth_s, ktl_s, i), df_mul(row(bth_s, btl_s, i), rec))
        rec = df_div(one_df, d)
        cov = df_div(rec, (sh_s[i], sl_s[i]))
        cvh_s[i] = cov[0]
        cvl_s[i] = cov[1]
        covs_ref[i] = cov[0] + cov[1]

    # ---- phase Z: reverse solve z = −u·z₊ + θ; w = covs·z
    az, bz = one_df, (zero, zero)
    for i in range(l - 1, -1, -1):
        t = (-uh_s[i], -ul_s[i])
        az = df_mul(t, az)
        bz = df_add(df_mul(t, bz), row(n1h_ref, n1l_ref, i))
    sh = 1
    while sh < nb:
        sah, sal, sbh, sbl = _win_shift(
            (az[0], az[1], bz[0], bz[1]), sh, (1.0, 0.0, 0.0, 0.0), toward_start=True
        )
        bz = df_add(df_mul(az, (sbh, sbl)), bz)
        az = df_mul(az, (sah, sal))
        sh *= 2
    bnd = _win_shift((bz[0], bz[1]), 1, (0.0, 0.0), toward_start=True)
    x = (bnd[0], bnd[1])
    for i in range(l - 1, -1, -1):
        t = (-uh_s[i], -ul_s[i])
        x = df_add(df_mul(t, x), row(n1h_ref, n1l_ref, i))
        wv = df_mul((cvh_s[i], cvl_s[i]), x)
        wh_s[i] = wv[0]
        wl_s[i] = wv[1]
        w_ref[i] = wv[0] + wv[1]

    # window-boundary row of u shifted one window toward the end: position
    # i = 0 of window w needs u at position l−1 of window w−1
    ubh, ubl = _win_shift((uh_s[l - 1], ul_s[l - 1]), 1, (0.0, 0.0), toward_start=False)

    def tprime(i):  # t'_p = −u_{p−1} (t'_0 = 0 globally via the fill)
        if i == 0:
            return (-ubh, -ubl)
        return (-uh_s[i - 1], -ul_s[i - 1])

    # ---- phase M: forward mean solve μ = t'·μ₋ + w (exact df)
    am, bm = one_df, (zero, zero)
    for i in range(l):
        t = tprime(i)
        am = df_mul(t, am)
        bm = df_add(df_mul(t, bm), (wh_s[i], wl_s[i]))
    sh = 1
    while sh < nb:
        sah, sal, sbh, sbl = _win_shift(
            (am[0], am[1], bm[0], bm[1]), sh, (1.0, 0.0, 0.0, 0.0), toward_start=False
        )
        bm = df_add(df_mul(am, (sbh, sbl)), bm)
        am = df_mul(am, (sah, sal))
        sh *= 2
    bnd = _win_shift((bm[0], bm[1]), 1, (0.0, 0.0), toward_start=False)
    x = (bnd[0], bnd[1])
    for i in range(l):
        t = tprime(i)
        x = df_add(df_mul(t, x), (wh_s[i], wl_s[i]))
        mu_ref[i] = x[0] + x[1]

    # ---- phase V: forward f32 variance recurrence v = u²₋·v₋ + covs
    aubsq = (ubh + ubl) ** 2

    def t2(i):
        if i == 0:
            return aubsq
        au = uh_s[i - 1] + ul_s[i - 1]
        return au * au

    av, bv = one, zero
    for i in range(l):
        t = t2(i)
        av = t * av
        bv = t * bv + (cvh_s[i] + cvl_s[i])
    sh = 1
    while sh < nb:
        sa, sb = _win_shift((av, bv), sh, (1.0, 0.0), toward_start=False)
        bv = av * sb + bv
        av = av * sa
        sh *= 2
    (xv,) = _win_shift((bv,), 1, (0.0,), toward_start=False)
    for i in range(l):
        xv = t2(i) * xv + (cvh_s[i] + cvl_s[i])
        v_ref[i] = xv


@_seq_vmap
def _dist_q_call(*blocks):
    plane = jax.ShapeDtypeStruct(blocks[0].shape, jnp.float32)
    return pl.pallas_call(
        _dist_q_kernel,
        out_shape=[plane] * 5,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[pltpu.VMEM(blocks[0].shape, jnp.float32)] * 12,
        interpret=_interpret(),
    )(*blocks)


def dist_q_1d_planes(nat1: jnp.ndarray, nat2d: jnp.ndarray, nat2s: jnp.ndarray):
    """Fused forward of the packed d=1 ``dist_q`` chain
    (models/cvi_dp_packed.py::_dist_q_1d): float64 naturals in, float32
    ``(a [N−1], b [N−1], qv [N−1], mu0, p0v, means [N], vars [N])`` out.

    Mirrors ssm/transforms.py::naturals_to_ssm_params +
    state_space_model marginals on scalar channels; means are computed in
    double-float (the separate f32 mean recurrence of ``_marginals_1d`` is
    subsumed exactly).
    """
    n = nat1.shape[0]
    nb, l = _pick_shape(n)

    kd = -2.0 * nat2d
    ks = jnp.concatenate([-nat2s, jnp.zeros_like(kd[:1])])

    kdh, kdl = _f64_to_df(kd)
    ksh, ksl = _f64_to_df(ks)
    n1h, n1l = _f64_to_df(nat1)
    blocks = [
        _blockify(kdh, nb, l, 1.0),
        _blockify(kdl, nb, l, 0.0),
        _blockify(ksh, nb, l, 0.0),
        _blockify(ksl, nb, l, 0.0),
        _blockify(n1h, nb, l, 0.0),
        _blockify(n1l, nb, l, 0.0),
    ]
    covs_b, a_b, w_b, mu_b, v_b = _dist_q_call(*blocks)
    covs = _unblockify(covs_b, n)
    a = _unblockify(a_b, n)[: n - 1]
    w = _unblockify(w_b, n)
    means = _unblockify(mu_b, n)
    varis = _unblockify(v_b, n)
    return a, w[1:], covs[1:], means[0], covs[0], means, varis
