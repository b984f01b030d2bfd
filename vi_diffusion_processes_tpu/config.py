"""Global configuration for the TPU-native framework.

The reference (Markovflow fork) inherits its float policy from gpflow's
``default_float()`` (float64 everywhere, see SURVEY.md §5).  On TPU, float64
is emulated and slow, so we make the default dtype configurable:

* tests / parity runs: ``set_default_float(jnp.float64)`` (with x64 enabled)
* TPU production / benchmarks: float32 (with ``jax.lax.Precision.HIGHEST``
  matmuls, which on TPU means fp32-accurulated 3-pass bf16 products).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_DEFAULT_FLOAT = None


def default_float():
    """Return the library default float dtype.

    If unset, resolves to float64 when x64 is enabled, else float32.
    """
    if _DEFAULT_FLOAT is not None:
        return _DEFAULT_FLOAT
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def set_default_float(dtype) -> None:
    global _DEFAULT_FLOAT
    _DEFAULT_FLOAT = dtype


def default_jitter() -> float:
    """Diagonal jitter used when factorizing near-singular covariances.

    Mirrors the reference's jitter on covariance diagonals
    (markovflow/kernels/sde_kernel.py:122-131).
    """
    return 1e-10 if default_float() == jnp.float64 else 1e-6


#: Large-but-finite stand-in for infinity, mirroring markovflow/base.py:46.
APPROX_INF = 1e10
