"""Native C++ host kernels vs the JAX/NumPy implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.ops.btd import (
    BTD,
    btd_blocks_of_inverse,
    btd_cholesky,
)
from vi_diffusion_processes_tpu.utils.native import (
    btd_blocks_of_inverse_native,
    btd_cholesky_native,
    euler_maruyama_1d_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)

N, D = 20, 3


@pytest.fixture
def sym(rng):
    diag = rng.normal(size=(N, D, D))
    diag = diag @ np.swapaxes(diag, -1, -2) + 2 * D * np.eye(D)
    sub = 0.3 * rng.normal(size=(N - 1, D, D))
    return diag, sub


def test_native_cholesky_matches_jax(sym):
    diag, sub = sym
    ld_n, ls_n = btd_cholesky_native(diag, sub)
    l = btd_cholesky(BTD(diag=jnp.asarray(diag), sub=jnp.asarray(sub)))
    np.testing.assert_allclose(ld_n, l.diag, rtol=1e-10)
    np.testing.assert_allclose(ls_n, l.sub, rtol=1e-10)


def test_native_sparse_inverse_matches_jax(sym):
    diag, sub = sym
    ld_n, ls_n = btd_cholesky_native(diag, sub)
    sd_n, ss_n = btd_blocks_of_inverse_native(ld_n, ls_n)
    l = btd_cholesky(BTD(diag=jnp.asarray(diag), sub=jnp.asarray(sub)))
    inv = btd_blocks_of_inverse(l)
    np.testing.assert_allclose(sd_n, inv.diag, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(ss_n, inv.sub, rtol=1e-8, atol=1e-10)


def test_native_cholesky_rejects_indefinite():
    diag = -np.eye(2)[None].repeat(3, axis=0)
    sub = np.zeros((2, 2, 2))
    with pytest.raises(np.linalg.LinAlgError):
        btd_cholesky_native(diag, sub)


def test_native_euler_maruyama_moments():
    """OU stationary moments from the native simulator."""
    out = euler_maruyama_1d_native(
        "ou", (1.0,), sqrt_q=np.sqrt(2.0), x0=np.zeros(256), num_steps=4000,
        dt=0.01, seed=7,
    )
    tail = out[:, 2000:]
    # stationary variance q/(2λ) = 1
    assert abs(tail.mean()) < 0.05
    np.testing.assert_allclose(tail.var(), 1.0, rtol=0.1)
