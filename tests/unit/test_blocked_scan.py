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
