"""Eager-time parameter validation for kernel/likelihood constructors.

Mirrors the reference's constructor checks (markovflow/kernels/matern.py:521-526
``_validate_lengthscale_and_variance`` + the gpflow ``positive()`` transform
guards): invalid concrete hyperparameters raise ``ValueError`` at construction.

Pytree models here are rebuilt with tracer leaves inside every ``jit`` /
``vmap`` / ``grad`` trace and on ``tree_unflatten``, where the values are
symbolic — validation silently skips non-concrete leaves, so the checks cost
nothing under transformation and fire only on real user inputs.
"""
from __future__ import annotations

import jax
import numpy as np

__all__ = ["check_positive"]


def check_positive(value, name: str) -> None:
    """Raise ``ValueError`` unless every element of a *concrete* ``value`` is
    strictly positive.  Tracers (jit/vmap/grad) and ``None`` are skipped."""
    if value is None or isinstance(value, jax.core.Tracer):
        return
    try:
        arr = np.asarray(value)
    except Exception:
        return
    if arr.dtype.kind not in "fiu":
        return
    if not np.all(arr > 0):
        raise ValueError(f"{name} must be positive.")
