"""Global configuration for the TPU-native framework.

The reference (Markovflow fork) inherits its float policy from gpflow's
``default_float()`` (float64 everywhere, see SURVEY.md §5).  On TPU, float64
is emulated and slow, so we make the default dtype configurable:

* tests / parity runs: ``set_default_float(jnp.float64)`` (with x64 enabled)
* TPU production / benchmarks: float32 (with ``jax.lax.Precision.HIGHEST``
  matmuls, which on TPU means fp32-accurulated 3-pass bf16 products).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# State-space recursions are matmul-precision-critical: transitions are
# A ≈ I − εF with ε = Δt/ℓ often below bfloat16's 2⁻⁸ epsilon, so TPU's
# default bf16 matmul precision rounds A to I and silently corrupts every
# filter/smoother/covariance recursion (measured: GPR log-lik = NaN at a
# 100k grid in f32 under the default, correct under HIGHEST).  Every matmul
# in this library is a tiny d≤10 block where the MXU's bf16 speedup is
# irrelevant, so the package default is full-f32 products.  Opt out (e.g.
# for large custom emission/MLP layers in the same program) with
# VI_DP_TPU_ALLOW_BF16_MATMUL=1 and scope HIGHEST locally instead.
if not os.environ.get("VI_DP_TPU_ALLOW_BF16_MATMUL"):
    jax.config.update("jax_default_matmul_precision", "highest")

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
