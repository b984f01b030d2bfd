"""Blocked associative scan for rank-1 channels — the TPU-fast form.

``lax.associative_scan`` lowers to a log-depth tree of stride-2 ``slice`` /
``pad`` ops.  On TPU those are cross-lane relayouts: profiling the CVI-DP
packed step at T=100k showed 40 of 44.6 ms of device time in slice+pad from
the scan trees, with ~2 ms of actual arithmetic.  This module computes the
same inclusive (prefix/suffix) scan with

1. one reshape of ``[T]`` into ``num_blocks`` contiguous windows ``[l, nb]``
   (window = column; one transpose, no strided access),
2. a vectorized ``lax.scan`` of length ``l`` over the window axis — each
   step combines ``nb`` lanes elementwise (no slicing),
3. an exclusive cross-window combine of the ``nb`` window aggregates (tiny
   ``lax.associative_scan``),
4. one elementwise combine broadcasting the window prefix into phase-1's
   collected per-position prefixes.

Semantics match ``lax.associative_scan(fn, elems, reverse=...)`` exactly
(same operand convention, verified element-for-element in
``tests/unit/test_blocked_scan.py``); ``fn`` must be associative and the
caller supplies its identity element.  Cost: sequential depth ``l = T/nb``
with full VPU-lane utilization, instead of ``2·log₂T`` full-array relayouts.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
from jax import lax, tree_util

__all__ = ["blocked_assoc_scan", "blocked_assoc_scan_packed"]


def _apply(fn, a, b):
    out = fn(a, b)
    return tuple(out) if isinstance(out, (tuple, list)) else (out,)


#: default window count — tuned on v5e: larger nb ⇒ fewer sequential scan
#: iterations (the per-iteration dynamic-slice overhead dominates), at the
#: cost of a slightly larger cross-window pass
DEFAULT_NUM_BLOCKS = 4096


#: windows above this trigger a recursive (two-level) cross-window pass:
#: ``lax.associative_scan`` instantiates the combine ~2·log₂(nb) times plus
#: per-level slice/pad trees, which dominates *compile* time for large
#: combine bodies (d ≥ 4 channel algebra).  Recursing once replaces the
#: 4096-leaf tree with a 64-step vectorized scan + a 64-leaf tree.
_CROSS_RECURSE_ABOVE = 128


def blocked_assoc_scan(
    fn: Callable,
    elems: Sequence[jnp.ndarray],
    identity: Sequence,
    *,
    reverse: bool = False,
    num_blocks: int = None,
    cross_recurse: bool = None,
) -> Tuple[jnp.ndarray, ...]:
    """Inclusive associative scan over the leading axis of rank-1 channels.

    ``fn(a, b)`` combines two channel tuples with ``a`` the cumulatively
    combined LATER segment for reverse scans / EARLIER segment for forward
    scans and ``b`` the adjacent element — exactly
    ``lax.associative_scan``'s operand convention.  ``identity`` is ``fn``'s
    neutral element (scalars, one per channel).  ``reverse=True`` computes
    suffix compositions natively (a reverse ``lax.scan`` — no full-array
    flips).
    """
    elems = tuple(elems)
    n = elems[0].shape[0]
    if n == 0:
        return elems
    if (
        len(elems) > 1
        and all(e.ndim == 1 for e in elems)
        and len({e.dtype for e in elems}) == 1
    ):
        # Same-dtype rank-1 channel tuples ride the packed [C, T] scan: the
        # tuple form costs one slice + one dynamic-update-slice PER CHANNEL
        # per scan step (~1.6 µs apiece on v5e — the d=2 channelized filter
        # carries 16 channels, and its scan was 1.07 of the 1.4 ms Poisson
        # CVI device step), the packed form exactly one of each.  The
        # row-unpack/stack wrapper fuses into the compose arithmetic.
        c = len(elems)

        def fn_packed(x, y):
            out = _apply(
                fn, tuple(x[i] for i in range(c)), tuple(y[i] for i in range(c))
            )
            return jnp.stack(jnp.broadcast_arrays(*out))

        # cross pass: keep the tuple form's associative tree (the d ≤ 3
        # composes are small — a recursed cross pass costs ~64 sequential
        # [C, 64] scan steps ≈ 0.2 ms/scan on v5e, the [C, nb] tree ~50 µs;
        # recursion only pays when the compose body dominates compile time)
        packed = blocked_assoc_scan_packed(
            fn_packed,
            jnp.stack(elems),
            identity,
            reverse=reverse,
            num_blocks=num_blocks,
            cross_recurse=False if cross_recurse is None else cross_recurse,
        )
        return tuple(packed[i] for i in range(c))
    if num_blocks is None:
        num_blocks = DEFAULT_NUM_BLOCKS

    nb = max(1, min(num_blocks, n))
    l = -(-n // nb)
    pad = nb * l - n

    rests = tuple(e.shape[1:] for e in elems)

    def ident_block(i, e, rest, lead):
        return jnp.broadcast_to(jnp.asarray(i, e.dtype), (lead,) + rest)

    cols = []
    for e, i, rest in zip(elems, identity, rests):
        # identity padding at the tail is inert for forward prefixes and,
        # because fn(acc, identity) = acc, also for reverse suffixes
        ep = (
            jnp.concatenate([e, ident_block(i, e, rest, pad)]) if pad else e
        )
        # window w = contiguous chunk [w*l, (w+1)*l); lay out as [l, nb, ...]
        # so each scan step combines one row (all windows in parallel)
        cols.append(jnp.moveaxis(ep.reshape((nb, l) + rest), 0, 1))

    ident_rows = tuple(
        ident_block(i, e, rest, nb)
        for i, e, rest in zip(identity, elems, rests)
    )

    def step(carry, row):
        new = _apply(fn, carry, row)
        return new, new

    def cross(agg):
        """Inclusive scan of the nb window aggregates."""
        if cross_recurse and nb > _CROSS_RECURSE_ABOVE:
            return blocked_assoc_scan(
                fn, agg, identity, reverse=reverse, num_blocks=64, cross_recurse=False
            )
        return lax.associative_scan(
            lambda a, b: _apply(fn, a, b), agg, reverse=reverse
        )

    if reverse:
        # carry = suffix accumulated over LATER rows; fn(carry, row)
        agg, within = lax.scan(step, ident_rows, tuple(cols), reverse=True)
        # exclusive suffix of the LATER windows (tiny: nb elements)
        incl = cross(agg)
        boundary = tuple(
            jnp.concatenate([a[1:], ident_block(iv, a, rest, 1)])
            for iv, a, rest in zip(identity, incl, rests)
        )
        # suffix over k..N = fn(later windows, within-window suffix)
    else:
        agg, within = lax.scan(step, ident_rows, tuple(cols))
        # exclusive prefix of the EARLIER windows
        incl = cross(agg)
        boundary = tuple(
            jnp.concatenate([ident_block(iv, a, rest, 1), a[:-1]])
            for iv, a, rest in zip(identity, incl, rests)
        )
    out_rows = _apply(fn, tuple(a[None] for a in boundary), within)

    out = tuple(
        jnp.moveaxis(o, 1, 0).reshape((nb * l,) + rest)
        for o, rest in zip(out_rows, rests)
    )
    return tuple(o[:n] for o in out)


def blocked_assoc_scan_packed(
    fn: Callable,
    elems: jnp.ndarray,
    identity: Sequence,
    *,
    reverse: bool = False,
    num_blocks: int = None,
    cross_recurse: bool = True,
    cross_seq: bool = False,
) -> jnp.ndarray:
    """Inclusive associative scan over the LAST axis of ONE packed ``[C, T]``
    array (channel axis leading, data axis minormost).

    Many-channel composes (the d ≥ 4 filter/smoother/UDU elements carry
    ``C = O(d²)`` channels) pay a per-scan-step toll in the tuple form:
    ``lax.scan`` slices each xs channel and updates each ys channel with its
    own dynamic-(update-)slice — profiling the d=4 GPR grad at N=100k showed
    ~17k ``dynamic_update_slice`` + ~28k sibling tiny ops per step (~1.6 µs
    apiece on v5e), dwarfing the arithmetic.  Packing every channel into one
    array makes it ONE slice + ONE update per step.

    ``fn(a, b) -> [C, ...]`` must follow ``lax.associative_scan``'s operand
    convention, treat axis 0 as the channel axis, and broadcast over any
    trailing data shape (the boundary combine passes ``[C, 1, nb]`` against
    ``[C, l, nb]``).  ``identity`` is a length-C sequence of scalars.

    ``cross_seq=True`` runs the cross-window pass as a *sequential*
    ``lax.scan`` over the ``nb`` aggregates, so ``fn`` is instantiated only
    three times in the whole graph (window scan, cross pass, boundary
    combine).  The default recursive/associative cross pass instantiates it
    ~16×, which OOMs the remote TPU compiler when the compose body is the
    unrolled d > 8 channel algebra (d=14: compile-helper SIGKILL even for
    the UDU' alone, measured).  Pair with a smaller ``num_blocks`` (the
    cross pass is ``nb`` sequential steps of a tiny compose).
    """
    c, n = elems.shape
    if n == 0:
        return elems
    if num_blocks is None:
        num_blocks = DEFAULT_NUM_BLOCKS

    nb = max(1, min(num_blocks, n))
    l = -(-n // nb)
    pad = nb * l - n

    ident_col = jnp.asarray(list(identity), elems.dtype).reshape(c, 1)
    ep = (
        jnp.concatenate([elems, jnp.broadcast_to(ident_col, (c, pad))], axis=-1)
        if pad
        else elems
    )
    # window w = contiguous chunk [w*l, (w+1)*l); scan over within-window
    # position, combining all nb windows per step on a single [C, nb] row
    xs = jnp.moveaxis(ep.reshape(c, nb, l), -1, 0)  # [l, C, nb]
    ident_rows = jnp.broadcast_to(ident_col, (c, nb))

    def step(carry, row):
        new = fn(carry, row)
        return new, new

    def cross(agg):
        if cross_seq:
            if nb > 64:
                # Two-level cross pass: recursing once replaces nb fully
                # SEQUENTIAL compose steps on [C, 1]-shaped operands (the
                # unrolled d > 8 channel algebra runs ~300 µs per scalar
                # step on v5e — 512 of them were 0.9 s of the d=12 spatio
                # site step) with a √nb-lane-vectorized window scan plus a
                # √nb-length scalar tail.  Costs 2 extra instantiations of
                # ``fn`` (5 total) — far below the ~16 of the recursive
                # tree pass that OOMed the remote TPU compiler at d = 14.
                sub_nb = max(8, int(nb**0.5))
                return blocked_assoc_scan_packed(
                    fn, agg, identity, reverse=reverse,
                    num_blocks=sub_nb, cross_recurse=False, cross_seq=True,
                )
            agg_t = jnp.moveaxis(agg, -1, 0)  # [nb, C]

            def step_c(carry, row):
                new = fn(carry, row)
                return new, new

            _, incl_t = lax.scan(step_c, ident_col[:, 0], agg_t, reverse=reverse)
            return jnp.moveaxis(incl_t, 0, -1)
        if cross_recurse and nb > _CROSS_RECURSE_ABOVE:
            return blocked_assoc_scan_packed(
                fn, agg, identity, reverse=reverse, num_blocks=64, cross_recurse=False
            )
        # axis must be nonnegative: lax.rev rejects negative dims under reverse
        return lax.associative_scan(fn, agg, reverse=reverse, axis=agg.ndim - 1)

    agg, within = lax.scan(step, ident_rows, xs, reverse=reverse)
    incl = cross(agg)
    if reverse:
        boundary = jnp.concatenate([incl[:, 1:], ident_col], axis=-1)
    else:
        boundary = jnp.concatenate([ident_col, incl[:, :-1]], axis=-1)
    within_t = jnp.moveaxis(within, 0, 1)  # [C, l, nb]
    out = fn(boundary[:, None, :], within_t)  # broadcast over l
    out = jnp.moveaxis(out, -1, 1).reshape(c, nb * l)
    return out[:, :n]
