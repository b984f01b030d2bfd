from .linalg import (
    block_diag,
    cholesky_with_jitter,
    kron,
    solve_psd,
    symmetrize,
    transpose_last,
)
from .shapes import augment_matrix, augment_square_matrix, to_delta_time

__all__ = [
    "block_diag",
    "cholesky_with_jitter",
    "kron",
    "solve_psd",
    "symmetrize",
    "transpose_last",
    "augment_matrix",
    "augment_square_matrix",
    "to_delta_time",
]
