"""Kernel unit tests: closed-form transitions vs expm, stationarity,
combinator Gram identities (mirrors tests/unit/test_matern.py etc.)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from vi_diffusion_processes_tpu.kernels.base import IndependentMultiOutput, Product, Sum
from vi_diffusion_processes_tpu.kernels.matern import (
    Matern12,
    Matern32,
    Matern52,
    OrnsteinUhlenbeck,
)
from vi_diffusion_processes_tpu.kernels.misc import (
    Constant,
    HarmonicOscillator,
    LatentExponentiallyGenerated,
)

ALL_KERNELS = {
    "m12": lambda: Matern12(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.3)),
    "m32": lambda: Matern32(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.3)),
    "m52": lambda: Matern52(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.3)),
    "ou": lambda: OrnsteinUhlenbeck(decay=jnp.asarray(1.2), diffusion=jnp.asarray(0.8)),
    "constant": lambda: Constant(variance=jnp.asarray(0.5)),
    "harmonic": lambda: HarmonicOscillator(variance=jnp.asarray(0.9), period=jnp.asarray(2.1)),
}


@pytest.fixture(params=list(ALL_KERNELS), ids=list(ALL_KERNELS))
def kernel(request):
    return ALL_KERNELS[request.param]()


def test_transitions_match_expm(kernel):
    """Closed-form A(Δt) must equal expm(FΔt)."""
    dts = jnp.asarray([0.1, 0.5, 2.3])
    a = kernel.state_transitions(jnp.zeros_like(dts), dts)
    f = np.asarray(kernel.feedback_matrix)
    for i, dt in enumerate(np.asarray(dts)):
        np.testing.assert_allclose(a[i], scipy.linalg.expm(f * dt), rtol=1e-10, atol=1e-12)


def test_stationarity(kernel):
    """Marginal covariances on any grid equal P∞; means equal state_mean."""
    t = jnp.asarray([0.0, 0.3, 1.0, 1.1, 4.0])
    ssm = kernel.state_space_model(t)
    means, covs = ssm.marginals()
    p_inf = kernel.steady_state_covariance
    np.testing.assert_allclose(covs, jnp.broadcast_to(p_inf, covs.shape), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(means, 0.0, atol=1e-12)


def test_lyapunov(kernel):
    """P∞ must solve F P∞ + P∞ Fᵀ + LQLᵀ = 0 ⇔ d/dt[A P∞ Aᵀ]|₀ = −Q̇:
    equivalently Q(Δt) = P∞ − A P∞ Aᵀ must be PSD and → 0 as Δt → 0."""
    dts = jnp.asarray([1e-6, 0.5])
    _, q = kernel.transition_statistics(jnp.zeros_like(dts), dts)
    # Q(Δt) → 0 linearly with slope set by the spectral density (which grows
    # as λ^(2p+1)); normalize by the kernel's own scale
    scale = max(1.0, float(np.abs(np.asarray(kernel.steady_state_covariance)).max()))
    np.testing.assert_allclose(np.asarray(q[0]) / scale, 0.0, atol=1e-3)
    eigs = np.linalg.eigvalsh(np.asarray(q[1]))
    assert (eigs > -1e-10).all()


def test_leg_transitions():
    rng = np.random.default_rng(0)
    n = jnp.asarray(rng.normal(size=(3, 3)))
    r = jnp.asarray(rng.normal(size=(3, 3)))
    k = LatentExponentiallyGenerated(N=n, R=r)
    dts = jnp.asarray([0.2, 1.0])
    a = k.state_transitions(jnp.zeros_like(dts), dts)
    f = np.asarray(k.feedback_matrix)
    for i, dt in enumerate(np.asarray(dts)):
        np.testing.assert_allclose(a[i], scipy.linalg.expm(f * dt), rtol=1e-8, atol=1e-10)
    assert k.output_dim == 3


def _gram(kernel, t):
    """Output-space Gram matrix of a (single-output) kernel via its SSM."""
    from ..integration.test_gpr import dense_gram

    return dense_gram(kernel, t)[1]


def test_sum_gram():
    t = np.asarray([0.0, 0.4, 1.0, 2.5])
    k1 = ALL_KERNELS["m12"]()
    k2 = ALL_KERNELS["m32"]()
    gram = _gram(Sum(kernels=(k1, k2)), t)
    np.testing.assert_allclose(gram, _gram(k1, t) + _gram(k2, t), rtol=1e-8, atol=1e-10)


def test_product_gram():
    t = np.asarray([0.0, 0.4, 1.0, 2.5])
    k1 = ALL_KERNELS["m12"]()
    k2 = ALL_KERNELS["m32"]()
    gram = _gram(Product(kernels=(k1, k2)), t)
    np.testing.assert_allclose(gram, _gram(k1, t) * _gram(k2, t), rtol=1e-8, atol=1e-10)


def test_independent_multi_output_shapes():
    t = jnp.asarray([0.0, 0.5, 1.0])
    k = IndependentMultiOutput(kernels=(ALL_KERNELS["m12"](), ALL_KERNELS["m32"]()))
    assert k.output_dim == 2
    assert k.state_dim == 3
    h = k.generate_emission_model(t).emission_matrix
    assert h.shape == (3, 2, 3)
    np.testing.assert_allclose(h[0], np.array([[1.0, 0, 0], [0, 1.0, 0]]))


def test_kernel_add_mul_operators():
    k1, k2 = ALL_KERNELS["m12"](), ALL_KERNELS["m32"]()
    assert isinstance(k1 + k2, Sum)
    assert isinstance(k1 * k2, Product)
