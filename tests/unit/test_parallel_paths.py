"""Parallel (associative-scan) fast paths vs sequential references."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from vi_diffusion_processes_tpu.ops.btd import (
    BTD,
    affine_scan,
    btd_udu,
    btd_udu_parallel_1d,
)
from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel
from vi_diffusion_processes_tpu.ssm.transforms import (
    naturals_to_ssm_params,
    ssm_to_naturals,
)

from ..tools.oracles import random_ssm_params


def test_mobius_udu_matches_sequential(rng):
    n = 50
    diag = (rng.normal(size=(n,)) ** 2 + 2.0)[:, None, None]
    sub = 0.4 * rng.normal(size=(n - 1,))[:, None, None]
    k = BTD(diag=jnp.asarray(diag), sub=jnp.asarray(sub))
    d_seq, u_seq = btd_udu(k)
    d_par, u_par = btd_udu_parallel_1d(k)
    np.testing.assert_allclose(d_par, d_seq, rtol=1e-9)
    np.testing.assert_allclose(u_par, u_seq, rtol=1e-9)


def test_affine_scan_forward(rng):
    n, d = 20, 3
    t = 0.5 * rng.normal(size=(n, d, d))
    c = rng.normal(size=(n, d))
    x0 = rng.normal(size=(d,))
    got = affine_scan(jnp.asarray(t), jnp.asarray(c), jnp.asarray(x0))
    x = x0
    want = []
    for k in range(n):
        x = t[k] @ x + c[k]
        want.append(x)
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-9)


def test_affine_scan_reverse(rng):
    n, d = 20, 3
    t = 0.5 * rng.normal(size=(n, d, d))
    c = rng.normal(size=(n, d))
    xn = rng.normal(size=(d,))
    got = affine_scan(jnp.asarray(t), jnp.asarray(c), jnp.asarray(xn), reverse=True)
    want = np.zeros((n, d))
    x = xn
    for k in range(n - 1, -1, -1):
        x = t[k] @ x + c[k]
        want[k] = x
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_naturals_roundtrip_d1(rng):
    """The d=1 Möbius fast path inside naturals_to_ssm_params."""
    params = random_ssm_params(rng, (), 40, 1)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    thetas = ssm_to_naturals(ssm)
    a_s, offsets, chol_p0, chol_qs, mu0 = naturals_to_ssm_params(*thetas)
    np.testing.assert_allclose(a_s, ssm.state_transitions, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(offsets, ssm.state_offsets, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(mu0, ssm.initial_mean, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(chol_qs, ssm.chol_process_covariances, rtol=1e-7)


@pytest.mark.parametrize("d,n", [(2, 17), (5, 64), (14, 300)])
def test_dense_parallel_udu_matches_sequential(rng, d, n):
    """Schur-segment associative-scan UDU' (the d > 8 TPU route,
    ops/btd.py::btd_udu_parallel_dense) ≡ the sequential backward recursion
    (block_tri_diag.py:442-534 equivalent) to f64 association noise."""
    from vi_diffusion_processes_tpu.ops.btd import btd_udu_parallel_dense

    h = rng.normal(size=(n, d, d)) * 0.3
    diag = jnp.asarray(np.einsum("nij,nkj->nik", h, h) + (d + 1.0) * np.eye(d))
    sub = jnp.asarray(rng.normal(size=(n - 1, d, d)) * 0.2)
    k = BTD(diag=diag, sub=sub)
    d_seq, u_seq = btd_udu(k)
    d_par, u_par = btd_udu_parallel_dense(k)
    np.testing.assert_allclose(d_par, d_seq, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(u_par, u_seq, rtol=1e-9, atol=1e-12)


def test_dense_parallel_udu_gradients_match(rng):
    """Autodiff through the parallel UDU agrees with the sequential path."""
    from vi_diffusion_processes_tpu.ops.btd import btd_udu_parallel_dense

    d, n = 4, 23
    h = rng.normal(size=(n, d, d)) * 0.3
    diag = jnp.asarray(np.einsum("nij,nkj->nik", h, h) + (d + 1.0) * np.eye(d))
    sub = jnp.asarray(rng.normal(size=(n - 1, d, d)) * 0.2)

    def loss(fn, dg, sb):
        db, us = fn(BTD(diag=dg, sub=sb))
        # well-conditioned functional: log of the (PD) diagonal pivots plus
        # Frobenius terms — log|D_ij| of near-zero off-diagonals would
        # amplify f64 association noise into O(1) gradient differences
        diag_piv = jnp.diagonal(db, axis1=-2, axis2=-1)
        return jnp.sum(jnp.log(diag_piv)) + 0.1 * jnp.sum(db**2) + jnp.sum(us**2)

    g_seq = jax.grad(lambda dg, sb: loss(btd_udu, dg, sb), argnums=(0, 1))(diag, sub)
    g_par = jax.grad(
        lambda dg, sb: loss(btd_udu_parallel_dense, dg, sb), argnums=(0, 1)
    )(diag, sub)
    # diag lives on the symmetric-PD manifold: the implementations differ in
    # how they extend off it (the Schur-segment form symmetrizes interior
    # quantities), so only the symmetrized cotangent is comparable
    sym = lambda g: 0.5 * (g + np.swapaxes(np.asarray(g), -1, -2))
    np.testing.assert_allclose(sym(g_par[0]), sym(g_seq[0]), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(g_par[1], g_seq[1], rtol=1e-8, atol=1e-10)
