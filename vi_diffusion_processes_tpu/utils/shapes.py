"""Shape/grid helpers (JAX equivalents of markovflow/utils.py:88-157)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_delta_time(time_points: jnp.ndarray) -> jnp.ndarray:
    """Convert a sorted time grid ``[..., N+1]`` into deltas ``[..., N]``.

    The reference asserts Δt ≥ 0 (markovflow/utils.py:88).  Under jit the
    values are symbolic and the caller is responsible for sorted grids; on
    concrete (eager) inputs an unsorted grid raises ``ValueError`` just like
    the reference's ``tf.debugging.assert_non_negative``.
    """
    deltas = time_points[..., 1:] - time_points[..., :-1]
    if not isinstance(deltas, jax.core.Tracer):
        import numpy as np

        if deltas.size and float(np.min(np.asarray(deltas))) < 0.0:
            raise ValueError("time_points must be non-decreasing (Δt ≥ 0).")
    return deltas


def augment_matrix(matrix: jnp.ndarray, extra_dim: int) -> jnp.ndarray:
    """Pad the last axis with zero columns (markovflow/utils.py:139)."""
    if extra_dim == 0:
        return matrix
    pad = [(0, 0)] * (matrix.ndim - 1) + [(0, extra_dim)]
    return jnp.pad(matrix, pad)


def augment_square_matrix(matrix: jnp.ndarray, extra_dim: int, fill_zeros: bool = False) -> jnp.ndarray:
    """Embed a square matrix into a larger one, identity (or zero) padded.

    Equivalent of markovflow/utils.py:117: used by StackKernel to equalize
    state dims across a stack of kernels.
    """
    if extra_dim == 0:
        return matrix
    d = matrix.shape[-1]
    pad = [(0, 0)] * (matrix.ndim - 2) + [(0, extra_dim), (0, extra_dim)]
    out = jnp.pad(matrix, pad)
    if not fill_zeros:
        eye_pad = jnp.zeros((d + extra_dim,), dtype=matrix.dtype).at[d:].set(1.0)
        out = out + jnp.diag(eye_pad)
    return out
