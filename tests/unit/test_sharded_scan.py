"""Time-axis-sharded filter/smoother == unsharded parallel filter/smoother.

The distributed three-phase scan (parallel/sharded.py) must reproduce
pskf.py exactly (same compose functions, different grouping) on the
8-virtual-device CPU mesh, including identity-element padding when the grid
length does not divide the mesh axis."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vi_diffusion_processes_tpu.parallel.pskf import (
    filter_smoother_with_sites,
    parallel_filter,
    site_log_normalizer,
)
from vi_diffusion_processes_tpu.parallel.sharded import (
    time_sharded_filter,
    time_sharded_filter_smoother,
)
from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel

from tests.tools.oracles import random_ssm_params


def _mesh(n=None):
    devs = jax.devices()
    n = n or len(devs)
    return Mesh(np.asarray(devs[:n]), ("t",))


def _random_case(rng, n_transitions, d):
    p = random_ssm_params(rng, (), n_transitions, d)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in p.items()})
    nat1 = jnp.asarray(rng.normal(size=(n_transitions + 1, d)))
    half = rng.normal(size=(n_transitions + 1, d, d)) * 0.4
    nat2 = jnp.asarray(half @ np.swapaxes(half, -1, -2)) + 0.1 * jnp.eye(d)
    return ssm, nat1, nat2


@pytest.mark.parametrize("n_transitions,d", [(36, 2), (63, 1), (16, 3)])
def test_sharded_filter_smoother_matches_unsharded(rng, n_transitions, d):
    ssm, nat1, nat2 = _random_case(rng, n_transitions, d)
    mesh = _mesh(8)
    filt_ref, smooth_ref = filter_smoother_with_sites(ssm, nat1, nat2)
    filt, smooth = jax.jit(
        lambda s, n1, n2: time_sharded_filter_smoother(s, n1, n2, mesh, "t")
    )(ssm, nat1, nat2)
    np.testing.assert_allclose(filt.means, filt_ref.means, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(filt.covs, filt_ref.covs, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(smooth.means, smooth_ref.means, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(smooth.covs, smooth_ref.covs, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(smooth.gains, smooth_ref.gains, rtol=1e-8, atol=1e-10)


def test_sharded_log_normalizer_matches(rng):
    ssm, nat1, nat2 = _random_case(rng, 40, 2)
    mesh = _mesh(8)
    filt_ref = parallel_filter(ssm, nat1, nat2)
    filt = time_sharded_filter(ssm, nat1, nat2, mesh, "t")
    np.testing.assert_allclose(
        site_log_normalizer(filt, nat1, nat2),
        site_log_normalizer(filt_ref, nat1, nat2),
        rtol=1e-10,
    )


def test_sharded_scan_single_device_fallback(rng):
    ssm, nat1, nat2 = _random_case(rng, 10, 2)
    mesh = _mesh(1)
    filt_ref, smooth_ref = filter_smoother_with_sites(ssm, nat1, nat2)
    filt, smooth = time_sharded_filter_smoother(ssm, nat1, nat2, mesh, "t")
    np.testing.assert_allclose(filt.means, filt_ref.means, rtol=1e-12)
    np.testing.assert_allclose(smooth.means, smooth_ref.means, rtol=1e-12)
