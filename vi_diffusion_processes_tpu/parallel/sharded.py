"""Time-axis-sharded filtering/smoothing over a device mesh.

The reference is single-process (SURVEY.md §2.4); its only scaling mechanism
is the O(N) sequential banded recursion.  Here the *time axis itself* is
sharded over a ``jax.sharding.Mesh`` axis so grids beyond one chip's HBM
(≥1M steps) filter/smooth in parallel across ICI.

Design: the associative scans in :mod:`.pskf` are the only O(N) pieces; all
element construction is embarrassingly parallel (XLA partitions it
automatically under jit).  Each scan becomes the classic three-phase
distributed scan, written explicitly with ``shard_map`` so the collective
pattern is guaranteed (one ``all_gather`` of per-chunk aggregates — D tiny
elements — instead of whatever auto-SPMD makes of a log-depth slice
network):

1. every device runs a *local* ``lax.associative_scan`` over its contiguous
   time chunk;
2. the per-chunk aggregates (one element each) are ``all_gather``-ed and
   scanned redundantly on every device — O(D) work on d×d blocks, free;
3. each device folds its exclusive prefix (forward) / suffix (reverse) into
   its local results — elementwise, fully vectorized.

Chunks compose exactly because filter/smoother elements form an associative
semigroup with a two-sided identity (A=I, rest 0) — also used to pad N+1 up
to a multiple of the mesh axis size.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved to jax.shard_map in newer releases
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..ssm.state_space_model import StateSpaceModel
from .pskf import (
    FilterResult,
    SmootherResult,
    _filter_compose,
    _make_filter_elements,
    _smoother_compose,
    _solve,
)
from ..utils.linalg import symmetrize, transpose_last

__all__ = [
    "sharded_associative_scan",
    "time_sharded_filter",
    "time_sharded_smoother",
    "time_sharded_filter_smoother",
]


def _pad_leading(tree, target: int, identity_tree):
    """Pad each leaf's leading axis to ``target`` with identity elements."""
    def pad(leaf, ident):
        n = leaf.shape[0]
        if n == target:
            return leaf
        fill = jnp.broadcast_to(ident, (target - n,) + leaf.shape[1:])
        return jnp.concatenate([leaf, fill], axis=0)

    return jax.tree_util.tree_map(pad, tree, identity_tree)


def _local_combine(fn, elems, axis_name: str, reverse: bool):
    """Phases 1-3 on one device (runs inside shard_map)."""
    local = lax.associative_scan(fn, elems, reverse=reverse)
    take = (lambda x: x[0]) if reverse else (lambda x: x[-1])
    edge = jax.tree_util.tree_map(take, local)
    totals = jax.tree_util.tree_map(
        lambda x: lax.all_gather(x, axis_name, axis=0), edge
    )  # [D, ...]
    agg = lax.associative_scan(fn, totals, reverse=reverse)
    i = lax.axis_index(axis_name)
    n_dev = lax.psum(1, axis_name)
    if reverse:
        # suffix of strictly-later chunks; device D-1 keeps local results.
        # Operand convention matches lax.associative_scan(reverse=True):
        # fn(later_aggregate, earlier_element).
        sel = jnp.minimum(i + 1, n_dev - 1)
        suffix = jax.tree_util.tree_map(lambda x: x[sel], agg)
        combined = fn(suffix, local)
        combined = _smap_where(i == n_dev - 1, local, combined)
    else:
        sel = jnp.maximum(i - 1, 0)
        prefix = jax.tree_util.tree_map(lambda x: x[sel], agg)
        combined = fn(prefix, local)
        combined = _smap_where(i == 0, local, combined)
    return combined


def _smap_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def sharded_associative_scan(
    fn, elems, mesh: Mesh, axis: str, identity_tree, reverse: bool = False
):
    """Inclusive associative scan over the leading (time) axis, distributed
    over mesh axis ``axis``.

    ``fn`` must follow the :func:`lax.associative_scan` operand convention of
    the call being replaced (forward: ``fn(earlier_agg, later_elem)``;
    reverse as used by :func:`.pskf.parallel_smoother`:
    ``fn(later_suffix, earlier_elem)``).  ``identity_tree`` supplies a
    two-sided identity element (leaf shapes = element shapes without the
    leading time axis) used to pad the time length to a multiple of the mesh
    axis size; padded positions compose transparently and are stripped from
    the result.
    """
    n_dev = mesh.shape[axis]
    if n_dev == 1:
        return lax.associative_scan(fn, elems, reverse=reverse)
    leaves = jax.tree_util.tree_leaves(elems)
    n = leaves[0].shape[0]
    target = -(-n // n_dev) * n_dev
    padded = _pad_leading(elems, target, identity_tree)

    spec = jax.tree_util.tree_map(lambda _: P(axis), padded)
    run = _shard_map(
        partial(_local_combine, fn, axis_name=axis, reverse=reverse),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )
    out = run(padded)
    return jax.tree_util.tree_map(lambda x: x[:n], out)


def _filter_identity(d: int, trailing_shape, dtype):
    eye = jnp.eye(d, dtype=dtype)
    mat = jnp.broadcast_to(eye, trailing_shape + (d, d))
    zmat = jnp.zeros(trailing_shape + (d, d), dtype)
    zvec = jnp.zeros(trailing_shape + (d,), dtype)
    return (mat, zvec, zmat, zvec, zmat)


def _smoother_identity(d: int, trailing_shape, dtype):
    eye = jnp.eye(d, dtype=dtype)
    mat = jnp.broadcast_to(eye, trailing_shape + (d, d))
    return (mat, jnp.zeros(trailing_shape + (d,), dtype), jnp.zeros(trailing_shape + (d, d), dtype))


def time_sharded_filter(
    ssm: StateSpaceModel, nat1: jnp.ndarray, nat2_prec: jnp.ndarray, mesh: Mesh, axis: str
) -> FilterResult:
    """:func:`.pskf.parallel_filter` with the O(N) scan sharded over
    ``mesh.shape[axis]`` devices along the time axis."""
    elems = _make_filter_elements(ssm, nat1, nat2_prec)
    d = ssm.state_dim
    trailing = elems[0].shape[1:-2]
    ident = _filter_identity(d, trailing, elems[0].dtype)
    _, b_cum, c_cum, _, _ = sharded_associative_scan(
        _filter_compose, elems, mesh, axis, ident
    )
    f_means = jnp.moveaxis(b_cum, 0, -2)
    f_covs = jnp.moveaxis(c_cum, 0, -3)

    # one-step-ahead prediction: elementwise + a 1-element halo shift that
    # XLA lowers to a single boundary ppermute under the same sharding
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


def time_sharded_smoother(
    ssm: StateSpaceModel, filt: FilterResult, mesh: Mesh, axis: str
) -> SmootherResult:
    """:func:`.pskf.parallel_smoother` with the reverse scan sharded along
    the time axis (suffix aggregates travel backward over ICI)."""
    a_t = jnp.moveaxis(ssm.state_transitions, -3, 0)
    b_t = jnp.moveaxis(ssm.state_offsets, -2, 0)
    fm_t = jnp.moveaxis(filt.means, -2, 0)
    fc_t = jnp.moveaxis(filt.covs, -3, 0)
    pc_next = jnp.moveaxis(filt.pred_covs, -3, 0)[1:]

    e_k = transpose_last(_solve(pc_next, a_t @ fc_t[:-1]))
    g_k = fm_t[:-1] - jnp.einsum(
        "...ij,...j->...i", e_k, jnp.einsum("...ij,...j->...i", a_t, fm_t[:-1]) + b_t
    )
    l_k = symmetrize(fc_t[:-1] - e_k @ a_t @ fc_t[:-1])
    e_last = jnp.zeros_like(fc_t[-1])
    elems = (
        jnp.concatenate([e_k, e_last[None]], axis=0),
        jnp.concatenate([g_k, fm_t[-1][None]], axis=0),
        jnp.concatenate([l_k, fc_t[-1][None]], axis=0),
    )
    d = ssm.state_dim
    ident = _smoother_identity(d, elems[0].shape[1:-2], elems[0].dtype)
    _, g_cum, l_cum = sharded_associative_scan(
        _smoother_compose, elems, mesh, axis, ident, reverse=True
    )
    return SmootherResult(
        means=jnp.moveaxis(g_cum, 0, -2),
        covs=jnp.moveaxis(l_cum, 0, -3),
        gains=jnp.moveaxis(e_k, 0, -3),
    )


def time_sharded_filter_smoother(
    ssm: StateSpaceModel, nat1: jnp.ndarray, nat2_prec: jnp.ndarray, mesh: Mesh, axis: str
) -> Tuple[FilterResult, SmootherResult]:
    filt = time_sharded_filter(ssm, nat1, nat2_prec, mesh, axis)
    return filt, time_sharded_smoother(ssm, filt, mesh, axis)
