"""Parallel (associative-scan) fast paths vs sequential references."""
import jax.numpy as jnp
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
