"""f-covariance oracle tests: the SSM-implied output-space Gram matrix must
equal the kernel's closed-form covariance function at arbitrary time points
(mirrors tests/integration/test_f_covariance.py, which checks markovflow
kernels against GPflow's analytic forms; here the analytic forms are inlined).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.base import Product, Sum
from vi_diffusion_processes_tpu.kernels.matern import (
    Matern12,
    Matern32,
    Matern52,
    OrnsteinUhlenbeck,
)
from vi_diffusion_processes_tpu.kernels.misc import Constant, HarmonicOscillator

from ..integration.test_gpr import dense_gram

L, V = 0.9, 1.4


def k_m12(r):
    return V * np.exp(-np.abs(r) / L)


def k_m32(r):
    a = np.sqrt(3.0) * np.abs(r) / L
    return V * (1.0 + a) * np.exp(-a)


def k_m52(r):
    a = np.sqrt(5.0) * np.abs(r) / L
    return V * (1.0 + a + a * a / 3.0) * np.exp(-a)


def k_ou(r):
    # decay λ=1.2, diffusion q=0.8: stationary cov q/(2λ), exp(−λ|r|) decay
    return (0.8 / 2.4) * np.exp(-1.2 * np.abs(r))


def k_const(r):
    return 0.5 * np.ones_like(r)


def k_harmonic(r):
    return 0.9 * np.cos(2.0 * np.pi * r / 2.1)


CASES = {
    "m12": (lambda: Matern12(lengthscale=jnp.asarray(L), variance=jnp.asarray(V)), k_m12),
    "m32": (lambda: Matern32(lengthscale=jnp.asarray(L), variance=jnp.asarray(V)), k_m32),
    "m52": (lambda: Matern52(lengthscale=jnp.asarray(L), variance=jnp.asarray(V)), k_m52),
    "ou": (
        lambda: OrnsteinUhlenbeck(decay=jnp.asarray(1.2), diffusion=jnp.asarray(0.8)),
        k_ou,
    ),
    "constant": (lambda: Constant(variance=jnp.asarray(0.5)), k_const),
    "harmonic": (
        lambda: HarmonicOscillator(variance=jnp.asarray(0.9), period=jnp.asarray(2.1)),
        k_harmonic,
    ),
}


def _time_points(n=9, seed=1234):
    rng = np.random.default_rng(seed)
    return np.sort(rng.uniform(0.0, 4.0, size=n))


def _check(kernel, k_fn, t):
    mean, gram = dense_gram(kernel, t)
    r = t[:, None] - t[None, :]
    np.testing.assert_allclose(gram, k_fn(r), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(mean, 0.0, atol=1e-9)


@pytest.mark.parametrize("name", list(CASES))
def test_primitive_f_covariance(name):
    make, k_fn = CASES[name]
    _check(make(), k_fn, _time_points())


@pytest.mark.parametrize(
    "names",
    [("constant", "m12"), ("m12", "m32"), ("constant", "m12", "m32", "m52")],
    ids=lambda ns: "+".join(ns),
)
def test_sum_f_covariance(names):
    t = _time_points()
    kernel = Sum(kernels=tuple(CASES[n][0]() for n in names))

    def k_fn(r):
        return sum(CASES[n][1](r) for n in names)

    _check(kernel, k_fn, t)


@pytest.mark.parametrize(
    "names",
    [("constant", "m12"), ("m12", "m32"), ("m32", "harmonic")],
    ids=lambda ns: "*".join(ns),
)
def test_product_f_covariance(names):
    t = _time_points()
    kernel = Product(kernels=tuple(CASES[n][0]() for n in names))

    def k_fn(r):
        out = np.ones_like(r) * 1.0
        for n in names:
            out = out * CASES[n][1](r)
        return out

    _check(kernel, k_fn, t)
