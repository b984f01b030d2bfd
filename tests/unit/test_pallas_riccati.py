"""Pallas Riccati sweep vs sequential oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.ops.pallas_riccati import riccati_d_sweep


def oracle(kd, b2):
    d = np.empty(len(kd))
    d[-1] = kd[-1]
    for k in range(len(kd) - 2, -1, -1):
        d[k] = kd[k] - b2[k] / d[k + 1]
    return d


def test_riccati_sweep_easy(rng):
    kd = np.full(1000, 2.0) + 0.1 * rng.random(1000)
    b2 = np.concatenate([np.full(999, 0.9), [0.0]])
    d = np.asarray(riccati_d_sweep(jnp.asarray(kd, jnp.float32), jnp.asarray(b2, jnp.float32)))
    np.testing.assert_allclose(d, oracle(kd, b2), rtol=2e-5)


def test_riccati_sweep_parabolic_f32():
    """The near-degenerate regime where the global scan tree fails in f32
    (prior-dominated fine grid): must stay positive and accurate."""
    n, a, qinv = 20_000, 0.9996, 12500.0
    kd = np.full(n, qinv * (1 + a * a))
    kd[-1] = qinv
    kd[50::500] += 25.0
    b2 = np.concatenate([np.full(n - 1, (qinv * a) ** 2), [0.0]])
    want = oracle(kd, b2)
    d = np.asarray(riccati_d_sweep(jnp.asarray(kd, jnp.float32), jnp.asarray(b2, jnp.float32)))
    assert (d > 0).all()
    np.testing.assert_allclose(d, want, rtol=2e-3)


def test_riccati_gradient_matches_fd():
    kd = jnp.asarray(np.full(512, 2.0))
    b2 = jnp.asarray(np.concatenate([np.full(511, 0.9), [0.0]]))

    def loss(kd_, b2_):
        return jnp.sum(jnp.log(riccati_d_sweep(kd_, b2_)))

    g_kd, g_b2 = jax.grad(loss, argnums=(0, 1))(kd, b2)
    eps = 1e-5
    for i in (0, 100, 511):
        fd = (loss(kd.at[i].add(eps), b2) - loss(kd.at[i].add(-eps), b2)) / (2 * eps)
        np.testing.assert_allclose(g_kd[i], fd, rtol=1e-4)
    for i in (0, 250):
        fd = (loss(kd, b2.at[i].add(eps)) - loss(kd, b2.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(g_b2[i], fd, rtol=1e-4)
