"""BTD linear algebra vs dense NumPy oracles.

Mirrors the reference's tests/unit/test_block_tri_diag.py:46-120 strategy.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.ops.btd import (
    BTD,
    btd_blocks_of_inverse,
    btd_cholesky,
    btd_chol_solve_vec,
    btd_from_dense,
    btd_logdet_from_chol,
    btd_matvec,
    btd_solve_sym_vec,
    btd_to_dense,
    btd_tri_solve_vec,
    btd_udu,
)

N, D = 6, 3


@pytest.fixture
def sym_btd(rng, batch_shape):
    """A random symmetric positive-definite BTD matrix (+ its dense form)."""
    # build as A Aᵀ + c·I restricted to the band, via an SPD dense matrix
    # constructed from a random SSM-like precision to guarantee PD in-band
    diag = rng.normal(size=batch_shape + (N, D, D))
    diag = diag @ np.swapaxes(diag, -1, -2) + 2 * D * np.eye(D)
    sub = 0.3 * rng.normal(size=batch_shape + (N - 1, D, D))
    m = BTD(diag=jnp.asarray(diag), sub=jnp.asarray(sub))
    return m, np.asarray(btd_to_dense(m))


def test_to_from_dense_roundtrip(sym_btd):
    m, dense = sym_btd
    m2 = btd_from_dense(jnp.asarray(dense), N, D)
    np.testing.assert_allclose(m2.diag, m.diag, rtol=1e-12)
    np.testing.assert_allclose(m2.sub, m.sub, rtol=1e-12)


def test_matvec(sym_btd, rng, batch_shape):
    m, dense = sym_btd
    x = rng.normal(size=batch_shape + (N, D))
    got = btd_matvec(m, jnp.asarray(x))
    want = np.einsum("...ij,...j->...i", dense, x.reshape(batch_shape + (N * D,)))
    np.testing.assert_allclose(got.reshape(batch_shape + (N * D,)), want, rtol=1e-10)


def test_cholesky_vs_dense(sym_btd):
    m, dense = sym_btd
    l = btd_cholesky(m)
    want = np.linalg.cholesky(dense)
    got = np.asarray(btd_to_dense(l, symmetric=False))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_logdet(sym_btd):
    m, dense = sym_btd
    l = btd_cholesky(m)
    got = btd_logdet_from_chol(l)
    want = np.linalg.slogdet(dense)[1]
    np.testing.assert_allclose(got, want, rtol=1e-10)


@pytest.mark.parametrize("transpose", [False, True])
def test_tri_solve(sym_btd, rng, batch_shape, transpose):
    m, dense = sym_btd
    l = btd_cholesky(m)
    l_dense = np.asarray(btd_to_dense(l, symmetric=False))
    rhs = rng.normal(size=batch_shape + (N, D))
    got = btd_tri_solve_vec(l, jnp.asarray(rhs), transpose=transpose)
    a = np.swapaxes(l_dense, -1, -2) if transpose else l_dense
    want = np.linalg.solve(a, rhs.reshape(batch_shape + (N * D,))[..., None])[..., 0]
    np.testing.assert_allclose(
        got.reshape(batch_shape + (N * D,)), want, rtol=1e-8, atol=1e-10
    )


def test_chol_solve(sym_btd, rng, batch_shape):
    m, dense = sym_btd
    l = btd_cholesky(m)
    rhs = rng.normal(size=batch_shape + (N, D))
    got = btd_chol_solve_vec(l, jnp.asarray(rhs))
    want = np.linalg.solve(dense, rhs.reshape(batch_shape + (N * D,))[..., None])[..., 0]
    np.testing.assert_allclose(
        got.reshape(batch_shape + (N * D,)), want, rtol=1e-7, atol=1e-9
    )


def test_blocks_of_inverse(sym_btd):
    """Takahashi recursion vs dense inverse (block_tri_diag.py:318 analogue)."""
    m, dense = sym_btd
    l = btd_cholesky(m)
    inv_blocks = btd_blocks_of_inverse(l)
    want = np.linalg.inv(dense)
    want_btd = btd_from_dense(jnp.asarray(want), N, D)
    np.testing.assert_allclose(inv_blocks.diag, want_btd.diag, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(inv_blocks.sub, want_btd.sub, rtol=1e-7, atol=1e-9)


def test_udu(sym_btd):
    """K = U D Uᵀ with unit upper block-bidiagonal U (block_tri_diag.py:442)."""
    m, dense = sym_btd
    d_blocks, u_super = btd_udu(m)
    big = N * D
    u = np.zeros(m.diag.shape[:-3] + (big, big)) + np.eye(big)
    dd = np.zeros(m.diag.shape[:-3] + (big, big))
    for k in range(N):
        dd[..., k * D : (k + 1) * D, k * D : (k + 1) * D] = d_blocks[..., k, :, :]
        if k < N - 1:
            u[..., k * D : (k + 1) * D, (k + 1) * D : (k + 2) * D] = u_super[..., k, :, :]
    recon = u @ dd @ np.swapaxes(u, -1, -2)
    np.testing.assert_allclose(recon, dense, rtol=1e-7, atol=1e-9)


def test_solve_sym(sym_btd, rng, batch_shape):
    m, dense = sym_btd
    rhs = rng.normal(size=batch_shape + (N, D))
    got = btd_solve_sym_vec(m, jnp.asarray(rhs))
    want = np.linalg.solve(dense, rhs.reshape(batch_shape + (N * D,))[..., None])[..., 0]
    np.testing.assert_allclose(
        got.reshape(batch_shape + (N * D,)), want, rtol=1e-7, atol=1e-9
    )


def test_qr_solve_inv_logdet_match_numpy(rng):
    """LU-free helpers (TPU f64 has no LuDecomposition) == NumPy LU results."""
    from vi_diffusion_processes_tpu.utils.linalg import inv_small, logdet_pos, qr_solve, solve_small

    a = jnp.asarray(rng.normal(size=(3, 4, 4))) + 4 * jnp.eye(4)
    b = jnp.asarray(rng.normal(size=(3, 4, 2)))
    np.testing.assert_allclose(qr_solve(a, b), np.linalg.solve(np.asarray(a), np.asarray(b)), rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(solve_small(a, b), np.linalg.solve(np.asarray(a), np.asarray(b)), rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(inv_small(a), np.linalg.inv(np.asarray(a)), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(logdet_pos(a), np.linalg.slogdet(np.asarray(a))[1], rtol=1e-12)
    # broadcasting: unbatched matrix vs batched rhs
    a1 = a[0]
    np.testing.assert_allclose(
        qr_solve(a1, b), np.linalg.solve(np.asarray(a1), np.asarray(b)), rtol=1e-11, atol=1e-12
    )
