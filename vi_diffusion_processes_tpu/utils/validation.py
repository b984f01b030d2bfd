"""Eager-time parameter validation for kernel/likelihood constructors.

Mirrors the reference's constructor checks (markovflow/kernels/matern.py:521-526
``_validate_lengthscale_and_variance`` + the gpflow ``positive()`` transform
guards): invalid concrete hyperparameters raise ``ValueError`` at construction.

Pytree models here are rebuilt with tracer leaves inside every ``jit`` /
``vmap`` / ``grad`` trace, where the values are symbolic — validation
silently skips non-concrete leaves, so the checks cost nothing under
transformation and fire only on real user inputs.

Classes with ``__post_init__`` guards must be declared with
:func:`validated_dataclass` instead of ``flax.struct.dataclass``: flax
registers pytree *unflattening through the constructor*, and unflattening
routinely rebuilds these classes with concrete non-positive leaves that are
not user inputs — ``optax``'s zero-initialized moment trees (``opt.init``),
``jax.grad`` cotangent pytrees, and jitted-function outputs all flow through
``tree_unflatten``.  ``validated_dataclass`` registers an unflatten that
bypasses ``__init__``/``__post_init__`` entirely, so the guards fire only on
genuine construction (and eager ``.replace``).
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np

__all__ = ["check_positive", "validated_dataclass"]


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


def validated_dataclass(clz):
    """``flax.struct.dataclass`` variant whose pytree unflatten bypasses
    ``__init__``/``__post_init__`` (see module docstring for why).

    Matches flax's surface: frozen dataclass, ``.replace``, pytree
    registration with attribute key paths, and flax serialization state
    (checkpoint round trips).  Only the unflatten path differs: it rebuilds
    instances with ``object.__new__`` + ``object.__setattr__`` so that
    internal reconstructions (optax moment trees, grad cotangents, jit
    outputs) never run constructor validation.
    """
    from flax import serialization

    if "_flax_dataclass" in clz.__dict__:
        return clz
    data_clz = dataclasses.dataclass(frozen=True)(clz)
    data_fields, meta_fields = [], []
    for f in dataclasses.fields(data_clz):
        (data_fields if f.metadata.get("pytree_node", True) else meta_fields).append(f.name)

    def replace(self, **updates):
        """Returns a new object replacing the specified fields with new values."""
        return dataclasses.replace(self, **updates)

    data_clz.replace = replace

    def flatten_with_keys(x):
        children = [(jax.tree_util.GetAttrKey(n), getattr(x, n)) for n in data_fields]
        return children, tuple(getattr(x, n) for n in meta_fields)

    def flatten(x):
        return [getattr(x, n) for n in data_fields], tuple(
            getattr(x, n) for n in meta_fields
        )

    def unflatten(meta, children):
        obj = object.__new__(data_clz)
        for n, v in zip(data_fields, children):
            object.__setattr__(obj, n, v)
        for n, v in zip(meta_fields, meta):
            object.__setattr__(obj, n, v)
        return obj

    jax.tree_util.register_pytree_with_keys(data_clz, flatten_with_keys, unflatten, flatten)

    def to_state_dict(x):
        return {n: serialization.to_state_dict(getattr(x, n)) for n in data_fields}

    def from_state_dict(x, state):
        state = dict(state)
        updates = {}
        for n in data_fields:
            if n not in state:
                raise ValueError(
                    f"Missing field {n} in state dict while restoring {clz.__name__}"
                )
            updates[n] = serialization.from_state_dict(getattr(x, n), state.pop(n), name=n)
        if state:
            raise ValueError(
                f"Unknown field(s) {','.join(state)} in state dict while "
                f"restoring {clz.__name__}"
            )
        # Rebuild with the same constructor bypass as unflatten: restored
        # state is an internal reconstruction, not user input — e.g. a
        # serialized optax moment tree holds zero-valued kernel-shaped
        # leaves that would trip the positivity guards under ``.replace``.
        obj = object.__new__(data_clz)
        for n in data_fields:
            object.__setattr__(obj, n, updates[n])
        for n in meta_fields:
            object.__setattr__(obj, n, getattr(x, n))
        return obj

    serialization.register_serialization_state(data_clz, to_state_dict, from_state_dict)
    data_clz._flax_dataclass = True
    return data_clz
