"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver dry-runs the real
multi-chip path separately) with float64 enabled for 1e-6 parity against
dense NumPy oracles — mirroring the reference's float64-everywhere policy
(gpflow default_float, SURVEY.md §5).

The surrounding environment boots the axon TPU tunnel via sitecustomize,
which force-sets ``jax_platforms="axon,cpu"`` with ``jax.config.update``
(overriding any JAX_PLATFORMS env var).  Undo that here and clear any
initialized backends so tests compile locally on CPU instead of round-
tripping every compile through the TPU tunnel.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# silence XLA:CPU AOT-cache feature-mismatch warnings (cache entries written
# under the axon env claim tuning pseudo-features the loader warns about)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # drop any backend the axon sitecustomize may have initialized
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover
    pass

jax.config.update("jax_enable_x64", True)
# persistent compilation cache: CPU test compiles dominate runtime otherwise.
# Repo-local so it survives across sessions (/tmp does not) — cold-cache
# suites recompile ~10 minutes of XLA programs, warm ones take ~3.
_cache_dir = os.environ.get(
    "JAX_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax"),
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

#: fixed seed, mirroring the reference's with_tf_random_seed (tests/conftest.py:22)
SEED = 71892305


@pytest.fixture
def rng():
    return np.random.default_rng(SEED)


@pytest.fixture
def key():
    return jax.random.PRNGKey(SEED)


@pytest.fixture(params=[(), (3,), (2, 1)], ids=["batch[]", "batch[3]", "batch[2,1]"])
def batch_shape(request):
    """Shape-grid testing style of the reference (tests/conftest.py:39-43)."""
    return request.param


@pytest.fixture(params=[1, 2, 3], ids=["d1", "d2", "d3"])
def state_dim(request):
    """d=2 included deliberately: the adjugate/channelized fast paths have
    dedicated d=2 code (ops/chmat.py) that the endpoints don't exercise."""
    return request.param


@pytest.fixture(params=[1, 5], ids=["n1", "n5"])
def num_transitions(request):
    return request.param


@pytest.fixture(params=[1, 2], ids=["out1", "out2"])
def output_dim(request):
    """Observation-space dimension axis of the reference's fixture grid
    (tests/conftest.py:46-48)."""
    return request.param


# --------------------------------------------------------------- heavy tier
#: Compile-heavy tests (≥ ~20 s each on this 1-CPU box, warm cache — the
#: suite's cost is death-by-many-30s-XLA:CPU-compiles, not one bomb).
#: Auto-marked ``heavy`` so the development loop can run the quick
#: partition ``-m "not slow and not heavy"`` (~15 min warm) while the full
#: ``pytest tests/`` remains the green-at-HEAD gate.  Measured via
#: ``--durations=40`` (2026-08-21, warm cache; see README "Test suite").
_HEAVY_TESTS = {
    "test_fused_dist_q_gradients_route_through_xla",
    "test_sharded_log_normalizer_matches",
    "test_packed_ch_step_matches_generic",
    "test_riccati_df_gradients_match_fd",
    "test_trainer_packed_d2_converges",
    "test_cvi_dp_elbo_trace_matches_golden",
    "test_vmap_routes_through_sequential_batching",
    "test_dispatch_equivalence_on_cpu_paths",
    "test_dispatch_end_to_end_equivalence",
    "test_channel_filter_smoother_normalizer",
    "test_gpr_loglik_and_grads_match_golden",
    "test_channel_filter_d10_matches_generic",
    "test_sparse_pep_gaussian_improves",
    "test_batched_learning_trace_matches_golden",
    "test_packed_step_matches_generic",
    "test_dense_parallel_udu_matches_sequential",
    "test_fused_dist_q_matches_xla_composition",
    "test_linear_recurrence_gradients_match_fd",
    "test_vgp_reaches_gpr_across_grid",
    "test_iwvi_samples_and_expectations",
    "test_filter_smoother_blocked_matches_small_path",
    "test_dense_parallel_udu_gradients_match",
    "test_natgrad_with_momentum_converges",
    "test_checkpoint_roundtrip",
    "test_naturals_to_ssm_d2_parallel_dispatch",
    "test_batched_packed_matches_generic",
    "test_matrix_channels_match_lax",
    "test_time_sharded_packed_natgrad_step_exact",
    "test_packed_site_step_matches_generic",
    "test_packed_spatio_step_matches_generic",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _HEAVY_TESTS:
            item.add_marker(pytest.mark.heavy)
