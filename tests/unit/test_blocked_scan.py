"""blocked_assoc_scan ≡ lax.associative_scan, element for element.

The blocked layout (ops/blocked_scan.py) exists because the stride-2
slice/pad tree of ``lax.associative_scan`` dominates TPU device time on
long rank-1 scans; semantics must be identical for every combine used in
the library (Möbius/Riccati, affine, affine-Gaussian marginals), forward
and reverse, for divisible and ragged lengths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from vi_diffusion_processes_tpu.ops.blocked_scan import blocked_assoc_scan


def _affine(e1, e2):
    a1, b1 = e1
    a2, b2 = e2
    return a2 * a1, a2 * b1 + b2


def _marginal(e1, e2):
    a1, b1, q1 = e1
    a2, b2, q2 = e2
    return a2 * a1, a2 * b1 + b2, a2 * q1 * a2 + q2


def _mobius(a, b):
    a00, a01, a10, a11 = a
    b00, b01, b10, b11 = b
    p00 = b00 * a00 + b01 * a10
    p01 = b00 * a01 + b01 * a11
    p10 = b10 * a00 + b11 * a10
    p11 = b10 * a01 + b11 * a11
    s = jax.lax.rsqrt(p00**2 + p01**2 + p10**2 + p11**2 + 1e-300)
    return p00 * s, p01 * s, p10 * s, p11 * s


CASES = {
    "affine": (_affine, (1.0, 0.0), 2),
    "marginal": (_marginal, (1.0, 0.0, 0.0), 3),
}


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("n", [1, 7, 64, 1000, 5003])
@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("num_blocks", [1, 8, 37])
def test_matches_lax(name, n, reverse, num_blocks):
    fn, ident, k = CASES[name]
    rng = np.random.default_rng(0)
    elems = tuple(
        jnp.asarray(rng.uniform(0.5, 1.1, n)) for _ in range(k)
    )  # contractive-ish to avoid overflow
    ref = lax.associative_scan(fn, elems, reverse=reverse)
    out = blocked_assoc_scan(fn, elems, ident, reverse=reverse, num_blocks=num_blocks)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("n", [5003, 8192])
def test_mobius_ratio_matches(n):
    """The Riccati use: only the projective ratio c00/c10 must agree (the
    normalized Möbius compose is associative only up to scale)."""
    rng = np.random.default_rng(1)
    kd = jnp.asarray(rng.uniform(2.1, 3.0, n))
    b2 = jnp.asarray(rng.uniform(0.0, 0.09, n))
    elems = (kd, -b2, jnp.ones_like(kd), jnp.zeros_like(kd))
    r00, _, r10, _ = lax.associative_scan(_mobius, elems, reverse=True)
    o00, _, o10, _ = blocked_assoc_scan(
        _mobius, elems, (1.0, 0.0, 0.0, 1.0), reverse=True, num_blocks=64
    )
    np.testing.assert_allclose(o00 / o10, r00 / r10, rtol=1e-11)


def test_gradients_flow():
    n = 4099

    def loss_blocked(a, b):
        ca, cb = blocked_assoc_scan(_affine, (a, b), (1.0, 0.0), num_blocks=32)
        return jnp.sum(cb) + jnp.sum(ca)

    def loss_lax(a, b):
        ca, cb = lax.associative_scan(_affine, (a, b))
        return jnp.sum(cb) + jnp.sum(ca)

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0.9, 1.0, n))
    b = jnp.asarray(rng.uniform(-0.1, 0.1, n))
    g1 = jax.grad(loss_blocked, argnums=(0, 1))(a, b)
    g2 = jax.grad(loss_lax, argnums=(0, 1))(a, b)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-10)


def test_riccati_dispatch_blocked_equals_global():
    from vi_diffusion_processes_tpu.ops.btd import (
        _riccati_d_blocked,
        _riccati_d_global_scan,
    )

    rng = np.random.default_rng(3)
    n = 10_000
    kd = jnp.asarray(rng.uniform(2.1, 3.0, n))
    ks = jnp.asarray(rng.uniform(-0.3, 0.3, n - 1))
    b2 = jnp.concatenate([ks**2, jnp.zeros(1)])
    np.testing.assert_allclose(
        _riccati_d_blocked(kd, b2), _riccati_d_global_scan(kd, b2), rtol=1e-11
    )


@pytest.mark.parametrize("n", [4099, 5003])
def test_matrix_channels_match_lax(n):
    """Trailing-dim (matrix/vector) channels: the pskf filter compose on
    REAL filtering elements (random elements make the ``(I+CJ)⁻¹``
    composition ill-conditioned, where float association order — not the
    scan layout — dominates)."""
    from vi_diffusion_processes_tpu.kernels import Matern32
    from vi_diffusion_processes_tpu.parallel.pskf import (
        _filter_compose,
        _make_filter_elements,
    )

    rng = np.random.default_rng(5)
    t = jnp.linspace(0.0, 40.0, n)
    kern = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
    ssm = kern.state_space_model(t)
    nat1 = jnp.asarray(rng.normal(size=(n, 2)) * 0.1)
    prec = jnp.broadcast_to(0.3 * jnp.eye(2), (n, 2, 2))
    elems = _make_filter_elements(ssm, nat1, prec)

    ref = lax.associative_scan(_filter_compose, elems)
    d = 2
    eye = jnp.eye(d)
    zd = jnp.zeros((d,))
    zdd = jnp.zeros((d, d))
    out = blocked_assoc_scan(
        _filter_compose, elems, identity=(eye, zd, zdd, zd, zdd), num_blocks=64
    )
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=1e-8, atol=1e-9)


def test_smoother_compose_matrix_reverse_matches_lax():
    """Reverse suffix scan with matrix channels: the RTS smoother compose
    (inverse-free, stable for generic well-scaled elements)."""
    from vi_diffusion_processes_tpu.parallel.pskf import _smoother_compose

    n, d = 5003, 2
    rng = np.random.default_rng(6)
    e = jnp.asarray(rng.normal(size=(n, d, d)) * 0.08 + 0.5 * np.eye(d))
    g = jnp.asarray(rng.normal(size=(n, d)) * 0.1)
    # l must be symmetric (smoother covariances are; the compose
    # symmetrizes, so a non-symmetric l differs at the raw last element)
    s_half = rng.normal(size=(n, d, d)) * 0.2
    l = jnp.asarray(np.einsum("nij,nkj->nik", s_half, s_half))
    op = lambda a, b: _smoother_compose(a, b)
    ref = lax.associative_scan(op, (e, g, l), reverse=True)
    out = blocked_assoc_scan(
        op,
        (e, g, l),
        identity=(jnp.eye(d), jnp.zeros((d,)), jnp.zeros((d, d))),
        reverse=True,
        num_blocks=64,
    )
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=1e-9, atol=1e-11)


def test_filter_smoother_blocked_matches_small_path():
    """End-to-end: filter/smoother over a 5000-point grid (blocked path)
    equals the same computation with the scan threshold disabled."""
    from vi_diffusion_processes_tpu.kernels import Matern32
    from vi_diffusion_processes_tpu.parallel.pskf import filter_smoother_with_sites

    n = 5000
    rng = np.random.default_rng(7)
    t = jnp.linspace(0.0, 50.0, n)
    kern = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
    ssm = kern.state_space_model(t)
    nat1 = jnp.asarray(rng.normal(size=(n, 2)) * 0.1)
    prec = jnp.broadcast_to(0.3 * jnp.eye(2), (n, 2, 2))

    filt, smooth = filter_smoother_with_sites(ssm, nat1, prec)

    import vi_diffusion_processes_tpu.ops.blocked_scan as bs
    orig = bs.blocked_assoc_scan
    try:
        bs.blocked_assoc_scan = (
            lambda fn, elems, identity, reverse=False, num_blocks=None, cross_recurse=None:
            lax.associative_scan(fn, tuple(elems), reverse=reverse)
        )
        filt_ref, smooth_ref = filter_smoother_with_sites(ssm, nat1, prec)
    finally:
        bs.blocked_assoc_scan = orig

    np.testing.assert_allclose(smooth.means, smooth_ref.means, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(smooth.covs, smooth_ref.covs, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(filt.means, filt_ref.means, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("d", [2, 3, 4, 5, 8])
def test_btd_udu_parallel_ch_matches_sequential(d):
    """Matrix-LFT parallel UDU' ≡ the sequential block recursion (f64)."""
    from vi_diffusion_processes_tpu.ops.btd import BTD, btd_udu, btd_udu_parallel_ch

    rng = np.random.default_rng(11)
    n = 400
    # SpInGP-like precision: strongly diagonally dominant PD with
    # invertible sub-blocks
    half = rng.normal(size=(n, d, d)) * 0.3
    diag = jnp.asarray(
        np.einsum("nij,nkj->nik", half, half) + (3.0 + d) * np.eye(d)
    )
    sub = jnp.asarray(rng.normal(size=(n - 1, d, d)) * 0.5 + 0.8 * np.eye(d))
    k = BTD(diag=diag, sub=sub)
    d_ref, u_ref = btd_udu(k)
    d_ch, u_ch = btd_udu_parallel_ch(k)
    np.testing.assert_allclose(d_ch, d_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(u_ch, u_ref, rtol=1e-8, atol=1e-10)


def test_naturals_to_ssm_d2_parallel_dispatch():
    """naturals_to_ssm round-trip at d=2 through the parallel-LFT dispatch
    (N ≥ 4096) equals the sequential path."""
    from vi_diffusion_processes_tpu.kernels import Matern32
    from vi_diffusion_processes_tpu.ssm.transforms import (
        naturals_to_ssm_params,
        ssm_to_naturals,
    )
    from vi_diffusion_processes_tpu.ops import btd as btd_mod

    n = 5000
    t = jnp.linspace(0.0, 10.0, n)
    kern = Matern32(lengthscale=jnp.asarray(0.9), variance=jnp.asarray(1.1))
    ssm = kern.state_space_model(t)
    th1, thd, ths = ssm_to_naturals(ssm)

    a1, b1, p01, q1, m1 = naturals_to_ssm_params(th1, thd, ths)

    orig = btd_mod.btd_udu_parallel_ch
    btd_mod.btd_udu_parallel_ch = lambda k: btd_mod.btd_udu(k)
    try:
        a2, b2, p02, q2, m2 = naturals_to_ssm_params(th1, thd, ths)
    finally:
        btd_mod.btd_udu_parallel_ch = orig

    # Matern32 naturals are dt⁻³-conditioned (entries ~1e9); association-
    # order differences between the two paths show up as ~1e-5 relative
    # noise on the tiny recovered offsets — conditioning, not error
    np.testing.assert_allclose(a1, a2, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(q1, q2, rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("n", [150, 1000, 5003])
@pytest.mark.parametrize("reverse", [False, True])
def test_cross_recurse_matches_lax(name, n, reverse):
    """Two-level cross-window pass (cross_recurse=True, used for d ≥ 4
    channel scans) must be exactly associative-scan-equivalent."""
    fn, ident, width = CASES[name]
    rng = np.random.default_rng(5)
    elems = tuple(
        jnp.asarray(rng.uniform(0.5, 1.5, size=n)) for _ in range(width)
    )
    want = lax.associative_scan(lambda a, b: fn(a, b), elems, reverse=reverse)
    got = blocked_assoc_scan(
        fn, elems, identity=ident, reverse=reverse, num_blocks=512, cross_recurse=True
    )
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-12)
