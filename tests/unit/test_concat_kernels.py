"""ConcatKernel family (Sum / IndependentMultiOutput / FactorAnalysis):
state-space structure and output-space Gram tests.

Mirrors the reference's tests/unit/test_concat_kernels.py (280 LoC): the
concatenated state space must behave exactly like independent child
processes stacked block-diagonally, and each subclass's emission model
must mix the children the documented way (sde_kernel.py:540-941).
Here the anchors are independent recomputations — per-child SSM marginals
and dense joint covariances — not the concat code itself.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.base import IndependentMultiOutput, Sum
from vi_diffusion_processes_tpu.kernels.composite import FactorAnalysisKernel
from vi_diffusion_processes_tpu.kernels.matern import Matern12, Matern32, Matern52
from vi_diffusion_processes_tpu.kernels.misc import Constant
from vi_diffusion_processes_tpu.utils.linalg import block_diag

from ..tools.oracles import dense_joint_from_ssm
from .test_f_covariance import k_m12

L, V = 0.9, 1.4


def _children(spec):
    mk = {
        "c": lambda: Constant(variance=jnp.asarray(0.5)),
        "m12": lambda: Matern12(lengthscale=jnp.asarray(L), variance=jnp.asarray(V)),
        "m32": lambda: Matern32(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(0.8)),
        "m52": lambda: Matern52(lengthscale=jnp.asarray(1.3), variance=jnp.asarray(1.1)),
    }
    return tuple(mk[s]() for s in spec)


CHILD_SPECS = [("c",), ("m12",), ("m32", "m32"), ("c", "m12", "m32"),
               ("c", "m12", "m32", "m52")]


@pytest.fixture(params=CHILD_SPECS, ids=["+".join(s) for s in CHILD_SPECS])
def kernels(request):
    return _children(request.param)


@pytest.fixture(params=[Sum, IndependentMultiOutput], ids=["sum", "imo"])
def concat(request, kernels):
    return request.param(kernels=kernels)


def _time_points(rng, batch_shape, n=7):
    t = 4.0 * rng.random(batch_shape + (n,))
    return jnp.asarray(np.sort(t, axis=-1))


def test_state_space_structure(rng, batch_shape, concat):
    """Initial/steady-state/feedback/transition operators are the block-diag
    stack of the children's (reference test_concat_kernels.py:132-183)."""
    t = _time_points(rng, batch_shape)
    dts = jnp.diff(t, axis=-1)
    ks = concat.kernels
    assert concat.state_dim == sum(k.state_dim for k in ks)
    np.testing.assert_allclose(
        concat.initial_covariance(t[..., :1]),
        block_diag([k.initial_covariance(t[..., :1]) for k in ks]), atol=1e-12)
    np.testing.assert_allclose(
        concat.steady_state_covariance,
        block_diag([k.steady_state_covariance for k in ks]), atol=1e-12)
    np.testing.assert_allclose(
        concat.feedback_matrix,
        block_diag([k.feedback_matrix for k in ks]), atol=1e-12)
    np.testing.assert_allclose(
        concat.state_transitions(t[..., :-1], dts),
        block_diag([k.state_transitions(t[..., :-1], dts) for k in ks]), atol=1e-12)
    np.testing.assert_allclose(
        concat.process_covariances(t[..., :-1], dts),
        block_diag([k.process_covariances(t[..., :-1], dts) for k in ks]), atol=1e-12)
    np.testing.assert_allclose(
        concat.initial_mean(batch_shape),
        jnp.concatenate([k.initial_mean(batch_shape) for k in ks], axis=-1), atol=1e-12)


def test_concat_marginals_equal_independent_children(rng, batch_shape, concat):
    """Prior SSM marginals of the concat kernel == each child's own SSM
    marginals, stacked — the children really evolve independently."""
    t = _time_points(rng, batch_shape)
    means, covs = concat.state_space_model(t).marginals()
    offset = 0
    for k in concat.kernels:
        d = k.state_dim
        mk, ck = k.state_space_model(t).marginals()
        np.testing.assert_allclose(means[..., offset:offset + d], mk, atol=1e-9)
        np.testing.assert_allclose(
            covs[..., offset:offset + d, offset:offset + d], ck, atol=1e-9)
        # cross-covariance between distinct children is exactly zero
        np.testing.assert_allclose(covs[..., offset:offset + d, :offset], 0.0, atol=1e-9)
        offset += d


def test_sum_emission_concatenates(rng, kernels):
    t = _time_points(rng, ())
    h = Sum(kernels=kernels).generate_emission_model(t).emission_matrix
    expected = jnp.concatenate(
        [k.generate_emission_model(t).emission_matrix for k in kernels], axis=-1)
    np.testing.assert_allclose(h, expected, atol=1e-12)
    assert h.shape == (len(t), 1, sum(k.state_dim for k in kernels))


def test_imo_emission_zero_pad_structure(rng):
    """IMO emission is block-diagonal: output i reads only child i's state
    (reference test_concat_kernels.py:210-226)."""
    t = _time_points(rng, ())
    ks = _children(("m32", "m32"))
    h = IndependentMultiOutput(kernels=ks).generate_emission_model(t).emission_matrix
    child_h = ks[0].generate_emission_model(t).emission_matrix  # [n, 1, 2]
    zero = jnp.zeros_like(child_h)
    expected = jnp.concatenate(
        [jnp.concatenate([child_h, zero], axis=-1),
         jnp.concatenate([zero, child_h], axis=-1)], axis=-2)
    np.testing.assert_allclose(h, expected, atol=1e-12)


def _dense_f_joint(kernel, t):
    """Full output-space joint covariance [n*out, n*out] via the dense SSM."""
    ssm = kernel.state_space_model(t)
    params = {
        "initial_mean": np.asarray(ssm.initial_mean),
        "chol_initial_covariance": np.asarray(ssm.chol_initial_covariance),
        "state_transitions": np.asarray(ssm.state_transitions),
        "state_offsets": np.asarray(ssm.state_offsets),
        "chol_process_covariances": np.asarray(ssm.chol_process_covariances),
    }
    _, cov = dense_joint_from_ssm(params)
    h = np.asarray(kernel.generate_emission_model(t).emission_matrix)  # [n, out, d]
    n, out, d = h.shape
    big_h = np.zeros((n * out, n * d))
    for k in range(n):
        big_h[k * out:(k + 1) * out, k * d:(k + 1) * d] = h[k]
    return big_h @ cov @ big_h.T


def test_imo_gram_is_blockdiag_of_child_grams(rng):
    """The IMO output Gram has zero cross-output blocks and each output's
    block equals the child's closed-form stationary covariance."""
    t = _time_points(rng, (), n=6)
    ks = _children(("m12", "m32"))
    joint = _dense_f_joint(IndependentMultiOutput(kernels=ks), t)
    n = len(t)
    tt = np.asarray(t)
    r = tt[:, None] - tt[None, :]
    # outputs interleave per time step: index (time k, output i) = k*2 + i
    k00 = joint[0::2, 0::2]
    k11 = joint[1::2, 1::2]
    k01 = joint[0::2, 1::2]
    np.testing.assert_allclose(k00, k_m12(r), atol=1e-8)
    # child m32 here uses L=0.7, V=0.8 (see _children)
    a = np.sqrt(3.0) * np.abs(r) / 0.7
    np.testing.assert_allclose(k11, 0.8 * (1.0 + a) * np.exp(-a), atol=1e-8)
    np.testing.assert_allclose(k01, np.zeros((n, n)), atol=1e-10)


def test_factor_analysis_emission_is_weighted_imo(rng):
    """FA emission == weight_fn(t) @ loading @ block-diag child emissions
    (reference test_concat_kernels.py:246-272)."""
    t = _time_points(rng, ())
    ks = _children(("m32", "m32"))
    seed = rng.random((2, 2))

    def weight_fn(times):
        x = jnp.einsum("t,ik->tik", times, jnp.asarray(seed))
        return x - jnp.round(x)

    fak = FactorAnalysisKernel.create(weight_fn, ks, output_dim=2)
    h = fak.generate_emission_model(t).emission_matrix
    inner = IndependentMultiOutput(kernels=ks).generate_emission_model(t).emission_matrix
    expected = np.asarray(weight_fn(t)) @ np.asarray(inner)
    np.testing.assert_allclose(h, expected, atol=1e-12)
    # and the SSM it rides on is the latent IMO stack
    assert fak.state_dim == 4
    ssm = fak.state_space_model(t)
    assert ssm.state_dim == 4


def test_sum_gram_matches_sum_of_children(rng):
    """Sum kernel's output Gram == elementwise sum of the children's
    closed-form Grams (m12 + m32 case, independent anchor)."""
    t = _time_points(rng, (), n=6)
    ks = _children(("m12", "m32"))
    joint = _dense_f_joint(Sum(kernels=ks), t)
    tt = np.asarray(t)
    r = tt[:, None] - tt[None, :]
    a = np.sqrt(3.0) * np.abs(r) / 0.7
    np.testing.assert_allclose(joint, k_m12(r) + 0.8 * (1.0 + a) * np.exp(-a), atol=1e-8)
