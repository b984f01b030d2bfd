"""Constructor-validation tests.

Mirrors the reference's tests/unit/test_matern_assertions.py: non-positive
concrete hyperparameters raise ``ValueError`` at construction, while
traced (jit/vmap/grad) construction is never blocked.
"""
import jax
import jax.numpy as jnp
import pytest

from vi_diffusion_processes_tpu.kernels.matern import (
    Matern12,
    Matern32,
    Matern52,
    OrnsteinUhlenbeck,
)
from vi_diffusion_processes_tpu.kernels.misc import Constant, HarmonicOscillator
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian

MATERNS = [Matern12, Matern32, Matern52]


@pytest.mark.parametrize("cls", MATERNS)
def test_matern_zero_lengthscale_raises(cls):
    with pytest.raises(ValueError, match="lengthscale must be positive"):
        cls(lengthscale=jnp.asarray(0.0), variance=jnp.asarray(1.0))


@pytest.mark.parametrize("cls", MATERNS)
def test_matern_negative_variance_raises(cls):
    with pytest.raises(ValueError, match="variance must be positive"):
        cls(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(-1.0))


def test_ou_nonpositive_params_raise():
    with pytest.raises(ValueError, match="decay must be positive"):
        OrnsteinUhlenbeck(decay=jnp.asarray(0.0), diffusion=jnp.asarray(1.0))
    with pytest.raises(ValueError, match="diffusion must be positive"):
        OrnsteinUhlenbeck(decay=jnp.asarray(1.0), diffusion=jnp.asarray(-2.0))


def test_constant_and_harmonic_validation():
    with pytest.raises(ValueError, match="variance must be positive"):
        Constant(variance=jnp.asarray(0.0))
    with pytest.raises(ValueError, match="period must be positive"):
        HarmonicOscillator(variance=jnp.asarray(1.0), period=jnp.asarray(0.0))


def test_gaussian_likelihood_validation():
    with pytest.raises(ValueError, match="variance must be positive"):
        Gaussian(variance=jnp.asarray(-0.1))


def test_validation_skips_tracers():
    """Rebuilding pytrees with tracer leaves inside jit/grad must not raise
    even when the traced value would be invalid at runtime — the guard only
    fires on concrete user inputs."""

    def gram_diag(ls):
        k = Matern32(lengthscale=ls, variance=jnp.asarray(1.0))
        a = k.state_transitions(None, jnp.asarray([0.5]))
        return jnp.sum(a)

    out = jax.jit(gram_diag)(jnp.asarray(2.0))
    g = jax.grad(gram_diag)(jnp.asarray(2.0))
    assert jnp.isfinite(out) and jnp.isfinite(g)
    # vmap over a batch that contains a non-positive entry: traced, no raise
    batched = jax.vmap(gram_diag)(jnp.asarray([1.0, 2.0]))
    assert batched.shape == (2,)


def test_to_delta_time_unsorted_raises():
    """Eager unsorted grids raise; traced grids don't (markovflow/utils.py:88
    ``assert_non_negative`` parity, tests/unit parity of the reference's
    ``test_to_delta_time_positive_difference``)."""
    from vi_diffusion_processes_tpu.utils.shapes import to_delta_time

    with pytest.raises(ValueError, match="non-decreasing"):
        to_delta_time(jnp.asarray([0.0, 2.0, 1.0]))
    out = to_delta_time(jnp.asarray([0.0, 1.0, 2.5]))
    assert out.shape == (2,)
    # traced: no raise even for an unsorted concrete operand
    jitted = jax.jit(to_delta_time)(jnp.asarray([0.0, 2.0, 1.0]))
    assert jitted.shape == (2,)


def test_validation_survives_tree_map():
    k = Matern52(lengthscale=jnp.asarray(1.5), variance=jnp.asarray(0.7))
    k2 = jax.tree_util.tree_map(lambda x: x * 2, k)
    assert float(k2.lengthscale) == pytest.approx(3.0)


def test_validation_skips_internal_reconstruction():
    """optax moment trees (zeros), grad cotangents (sign-free), and jit
    outputs all rebuild the kernel pytree with concrete values that are not
    user inputs — unflatten must bypass the constructor guards.  Regression
    test for the gpr_regression example breaking at ``opt.init(kernel)``."""
    import optax

    k = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))

    # optax init: zero-valued kernel-shaped trees
    opt = optax.adam(0.05)
    state = opt.init(k)

    # grad: cotangent pytree with negative entries
    def loss(kk):
        a = kk.state_transitions(None, jnp.asarray([0.5, 1.0]))
        return jnp.sum((a - 1.0) ** 2)

    g = jax.grad(loss)(k)
    updates, state = opt.update(g, state)
    k2 = optax.apply_updates(k, updates)  # unflatten with arbitrary signs
    assert jnp.isfinite(k2.lengthscale)

    # jit whose *output* is a kernel pytree carrying a non-positive leaf
    neg = jax.jit(lambda kk: jax.tree_util.tree_map(lambda x: -x, kk))(k)
    assert float(neg.lengthscale) == -1.0

    # flax serialization round trip still works through the custom node
    from flax import serialization

    restored = serialization.from_state_dict(k, serialization.to_state_dict(k2))
    assert float(restored.lengthscale) == pytest.approx(float(k2.lengthscale))

    # ... while genuine construction still validates
    with pytest.raises(ValueError, match="lengthscale must be positive"):
        Matern32(lengthscale=jnp.asarray(-1.0), variance=jnp.asarray(1.0))
    with pytest.raises(ValueError, match="variance must be positive"):
        k.replace(variance=jnp.asarray(0.0))


def test_from_state_dict_restores_optimizer_state():
    """Restoring a flax-serialized optax state (zero-valued kernel-shaped
    moment trees) must not re-run constructor positivity guards."""
    import optax
    from flax import serialization

    from vi_diffusion_processes_tpu.kernels.matern import Matern32

    k = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
    opt = optax.adam(0.05)
    state = opt.init(k)  # mu/nu trees are all-zero Matern32 instances
    blob = serialization.to_state_dict(state)
    restored = serialization.from_state_dict(state, blob)
    mu = restored[0].mu
    assert float(mu.lengthscale) == 0.0 and float(mu.variance) == 0.0
