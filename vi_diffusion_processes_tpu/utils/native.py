"""ctypes bindings for the native host-side kernels (native/btd_kernels.cpp).

The shared library is built on demand with ``make`` (g++); every entry point
has a NumPy fallback so the library remains optional.  These kernels are the
host-runtime counterpart of the reference's ``banded_matrices`` C++ op set
(SURVEY.md §2.1) — used for verification oracles and fast host-side data
generation, while the TPU compute path stays in XLA.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "load_native",
    "native_available",
    "btd_cholesky_native",
    "btd_blocks_of_inverse_native",
    "euler_maruyama_1d_native",
]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

DRIFT_TYPES = {"ou": 0, "dw": 1, "benes": 2, "sine": 3, "sqrt": 4}


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    lib_path = os.path.join(_NATIVE_DIR, "libbtd.so")
    if not os.path.exists(lib_path):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None

    dptr = ctypes.POINTER(ctypes.c_double)
    lib.btd_cholesky.restype = ctypes.c_int
    lib.btd_cholesky.argtypes = [dptr, dptr, ctypes.c_int64, ctypes.c_int, dptr, dptr]
    lib.btd_blocks_of_inverse.restype = None
    lib.btd_blocks_of_inverse.argtypes = [dptr, dptr, ctypes.c_int64, ctypes.c_int, dptr, dptr]
    lib.euler_maruyama_1d.restype = None
    lib.euler_maruyama_1d.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        dptr, ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_uint64, dptr,
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def _as_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def btd_cholesky_native(diag: np.ndarray, sub: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Block-tridiagonal Cholesky on the host (C++ fast path, NumPy fallback)."""
    diag = np.ascontiguousarray(diag, dtype=np.float64)
    sub = np.ascontiguousarray(sub, dtype=np.float64)
    n, d = diag.shape[0], diag.shape[-1]
    lib = load_native()
    if lib is not None:
        ldiag = np.empty_like(diag)
        lsub = np.empty_like(sub)
        rc = lib.btd_cholesky(_as_ptr(diag), _as_ptr(sub), n, d, _as_ptr(ldiag), _as_ptr(lsub))
        if rc != 0:
            raise np.linalg.LinAlgError("btd_cholesky: matrix not positive definite")
        return ldiag, lsub
    # NumPy fallback
    ldiag = np.empty_like(diag)
    lsub = np.empty_like(sub)
    ldiag[0] = np.linalg.cholesky(diag[0])
    for k in range(n - 1):
        c = np.linalg.solve_triangular if False else None
        ck = np.linalg.solve(ldiag[k], sub[k].T).T  # lower-tri solve via generic solve
        lsub[k] = ck
        ldiag[k + 1] = np.linalg.cholesky(diag[k + 1] - ck @ ck.T)
    return ldiag, lsub


def btd_blocks_of_inverse_native(ldiag: np.ndarray, lsub: np.ndarray):
    """In-band blocks of (L Lᵀ)⁻¹ (Takahashi) on the host."""
    ldiag = np.ascontiguousarray(ldiag, dtype=np.float64)
    lsub = np.ascontiguousarray(lsub, dtype=np.float64)
    n, d = ldiag.shape[0], ldiag.shape[-1]
    lib = load_native()
    sdiag = np.empty_like(ldiag)
    ssub = np.empty_like(lsub)
    if lib is not None:
        lib.btd_blocks_of_inverse(_as_ptr(ldiag), _as_ptr(lsub), n, d, _as_ptr(sdiag), _as_ptr(ssub))
        return sdiag, ssub
    sig_next = None
    for k in range(n - 1, -1, -1):
        linv = np.linalg.inv(ldiag[k])
        base = linv.T @ linv
        if k < n - 1:
            g = -np.linalg.inv(ldiag[k]).T @ lsub[k].T
            cross = g @ sig_next
            ssub[k] = cross.T
            base = base + cross @ g.T
        sdiag[k] = base
        sig_next = sdiag[k]
    return sdiag, ssub


def euler_maruyama_1d_native(
    drift: str, params: Tuple[float, ...], sqrt_q: float,
    x0: np.ndarray, num_steps: int, dt: float, seed: int,
) -> np.ndarray:
    """Batched scalar Euler–Maruyama on the host (C++ fast path)."""
    x0 = np.ascontiguousarray(x0, dtype=np.float64).reshape(-1)
    b = x0.shape[0]
    p0 = params[0] if len(params) > 0 else 0.0
    p1 = params[1] if len(params) > 1 else 0.0
    lib = load_native()
    out = np.empty((b, num_steps), dtype=np.float64)
    if lib is not None:
        lib.euler_maruyama_1d(
            DRIFT_TYPES[drift], p0, p1, sqrt_q, _as_ptr(x0), b, num_steps, dt,
            np.uint64(seed), _as_ptr(out),
        )
        return out
    rng = np.random.default_rng(seed)
    fns = {
        "ou": lambda x: -p0 * x,
        "dw": lambda x: p0 * x * (p1 - x**2),
        "benes": lambda x: p0 * np.tanh(x),
        "sine": lambda x: np.sin(x - p0),
        "sqrt": lambda x: np.sqrt(p0 * np.abs(x)),
    }
    f = fns[drift]
    x = x0.copy()
    out[:, 0] = x
    sdt = np.sqrt(dt) * sqrt_q
    for k in range(1, num_steps):
        x = x + f(x) * dt + sdt * rng.standard_normal(b)
        out[:, k] = x
    return out
