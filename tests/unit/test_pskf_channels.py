"""Channelized (structure-of-scalars) pskf paths ≡ the generic array paths.

The channel representation (ops/chmat.py + pskf `_parallel_filter_ch` /
`_parallel_smoother_ch` / `site_log_normalizer_ch`) exists purely for TPU
layout reasons (a [N,d,d] stack pads 256× and fragments fusions); the math
must match the generic [N,d,d] implementations to f64 association-order
noise.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import vi_diffusion_processes_tpu.parallel.pskf as pskf
from vi_diffusion_processes_tpu.kernels import Matern12, Matern32, Matern52


@pytest.fixture
def low_threshold(monkeypatch):
    monkeypatch.setattr(pskf, "CH_THRESHOLD", 16)


def _case(kern, n, seed):
    rng = np.random.default_rng(seed)
    t = jnp.linspace(0.0, 8.0, n)
    ssm = kern.state_space_model(t)
    d = ssm.state_dim
    nat1 = jnp.asarray(rng.normal(size=(n, d)) * 0.2)
    half = rng.normal(size=(n, d, d)) * 0.3
    prec = jnp.asarray(np.einsum("nij,nkj->nik", half, half) + 0.1 * np.eye(d))
    return ssm, nat1, prec


KERNELS = [
    Matern12(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.2)),
    Matern32(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.2)),
    Matern52(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.2)),
    # d ≥ 4: kernel sums — the PD-Cholesky-routed channel algebra
    # (markovflow/kernels/sde_kernel.py:660 workloads)
    Matern52(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.2))
    + Matern12(lengthscale=jnp.asarray(1.4), variance=jnp.asarray(0.5)),
    Matern52(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.2))
    + Matern32(lengthscale=jnp.asarray(1.4), variance=jnp.asarray(0.5)),
]
KERNEL_IDS = ["d1", "d2", "d3", "d4-sum", "d5-sum"]


@pytest.mark.parametrize("kern", KERNELS, ids=KERNEL_IDS)
def test_channel_filter_smoother_normalizer(low_threshold, kern):
    n = 301
    ssm, nat1, prec = _case(kern, n, 0)

    filt_ch = pskf._parallel_filter_ch(ssm, nat1, prec)
    elems = pskf._make_filter_elements(ssm, nat1, prec)
    from jax import lax

    _, b_cum, c_cum, _, _ = lax.associative_scan(pskf._filter_compose, elems)
    f_means = jnp.moveaxis(b_cum, 0, -2)
    f_covs = jnp.moveaxis(c_cum, 0, -3)

    np.testing.assert_allclose(filt_ch.means, f_means, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(filt_ch.covs, f_covs, rtol=1e-8, atol=1e-11)

    # generic filter dispatches through the channel path under the low
    # threshold; compare against the generic smoother instead
    smooth_ch = pskf._parallel_smoother_ch(ssm, filt_ch)

    # generic smoother with the channel dispatch bypassed
    import vi_diffusion_processes_tpu.parallel.pskf as mod

    orig = mod.CH_THRESHOLD
    mod.CH_THRESHOLD = 10**9
    try:
        smooth_ref = pskf.parallel_smoother(ssm, filt_ch)
        logz_ref = pskf.site_log_normalizer(filt_ch, nat1, prec)
    finally:
        mod.CH_THRESHOLD = orig

    np.testing.assert_allclose(smooth_ch.means, smooth_ref.means, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(smooth_ch.covs, smooth_ref.covs, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(smooth_ch.gains, smooth_ref.gains, rtol=1e-8, atol=1e-10)

    logz_ch = pskf.site_log_normalizer_ch(filt_ch, nat1, prec)
    np.testing.assert_allclose(logz_ch, logz_ref, rtol=1e-9)


@pytest.mark.parametrize("kern", KERNELS, ids=KERNEL_IDS)
def test_dispatch_end_to_end_equivalence(kern):
    """filter_smoother_with_sites through the dispatch (threshold crossed)
    equals the generic path on the same inputs."""
    n = 5000
    ssm, nat1, prec = _case(kern, n, 1)

    filt_ch, smooth_ch = pskf.filter_smoother_with_sites(ssm, nat1, prec)

    orig = pskf.CH_THRESHOLD
    pskf.CH_THRESHOLD = 10**9
    try:
        filt_ref, smooth_ref = pskf.filter_smoother_with_sites(ssm, nat1, prec)
    finally:
        pskf.CH_THRESHOLD = orig

    np.testing.assert_allclose(filt_ch.means, filt_ref.means, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(smooth_ch.means, smooth_ref.means, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(smooth_ch.covs, smooth_ref.covs, rtol=1e-6, atol=1e-9)


def test_chmat_roundtrip_and_inverse():
    from vi_diffusion_processes_tpu.ops import chmat as cm

    rng = np.random.default_rng(2)
    for d in (1, 2, 3):
        x = jnp.asarray(rng.normal(size=(17, d, d)))
        np.testing.assert_array_equal(cm.ch_to_mat(cm.mat_to_ch(x)), x)
        spd = jnp.asarray(
            np.einsum("nij,nkj->nik", np.asarray(x), np.asarray(x)) + 0.5 * np.eye(d)
        )
        inv = cm.ch_to_mat(cm.minv(cm.mat_to_ch(spd)))
        np.testing.assert_allclose(inv, np.linalg.inv(spd), rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(
            cm.det(cm.mat_to_ch(spd)), np.linalg.det(spd), rtol=1e-9
        )


def test_chmat_pd_primitives_general_d():
    """General-d PD primitives: mchol / minv_pd / inv_ipl / logdet_* vs dense
    NumPy, and finite gradients through the guarded forms at Λ = 0."""
    import jax
    from vi_diffusion_processes_tpu.ops import chmat as cm

    rng = np.random.default_rng(3)
    for d in (1, 2, 3, 4, 5, 8):
        x = rng.normal(size=(11, d, d))
        spd = jnp.asarray(np.einsum("nij,nkj->nik", x, x) + 0.5 * np.eye(d))
        a = cm.mat_to_ch(spd)

        l = cm.ch_to_mat(cm.mchol(a))
        np.testing.assert_allclose(l, np.linalg.cholesky(spd), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            cm.ch_to_mat(cm.minv_pd(a)), np.linalg.inv(spd), rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            cm.logdet_pd(a), np.linalg.slogdet(spd)[1], rtol=1e-9
        )

        y = rng.normal(size=(11, d, d)) * 0.4
        lam_np = np.einsum("nij,nkj->nik", y, y)
        lam = cm.mat_to_ch(jnp.asarray(lam_np))
        ipl = np.eye(d) + np.asarray(spd) @ lam_np
        np.testing.assert_allclose(
            cm.ch_to_mat(cm.inv_ipl(a, lam)), np.linalg.inv(ipl), rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            cm.logdet_ipl(a, lam), np.linalg.slogdet(ipl)[1], rtol=1e-8
        )

        # guarded forms: finite value + gradient at exactly-singular Λ = 0
        def f(p_flat):
            p_ch = cm.mat_to_ch(p_flat)
            z = cm.mat_to_ch(jnp.zeros_like(p_flat))
            out = cm.inv_ipl(p_ch, z)
            return sum(jnp.sum(out[i][j]) for i in range(d) for j in range(d))

        g = jax.grad(f)(spd[:2])
        assert np.isfinite(np.asarray(g)).all()


def test_channel_filter_d10_matches_generic(low_threshold):
    """d > 8 channelized route (3-instantiation blocked scans,
    blocked_assoc_scan_packed cross_seq=True) ≡ the generic dense path —
    the reference-scale spatio-temporal regime (M_space × Matern → d > 8,
    docs/notebooks/spatio_temporal.py:19-28)."""
    kern = (
        Matern52(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.2))
        + Matern52(lengthscale=jnp.asarray(1.3), variance=jnp.asarray(0.6))
        + Matern52(lengthscale=jnp.asarray(0.4), variance=jnp.asarray(0.9))
        + Matern12(lengthscale=jnp.asarray(1.1), variance=jnp.asarray(0.4))
    )  # state_dim = 3 + 3 + 3 + 1 = 10
    n = 301
    ssm, nat1, prec = _case(kern, n, 3)
    assert ssm.state_dim == 10

    filt_ch = pskf._parallel_filter_ch(ssm, nat1, prec)
    smooth_ch = pskf._parallel_smoother_ch(ssm, filt_ch)
    logz_ch = pskf.site_log_normalizer_ch(filt_ch, nat1, prec)

    orig = pskf.CH_THRESHOLD
    pskf.CH_THRESHOLD = 10**9
    try:
        filt_ref, smooth_ref = pskf.filter_smoother_with_sites(ssm, nat1, prec)
        logz_ref = pskf.site_log_normalizer(filt_ref, nat1, prec)
    finally:
        pskf.CH_THRESHOLD = orig

    np.testing.assert_allclose(filt_ch.means, filt_ref.means, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(filt_ch.covs, filt_ref.covs, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(smooth_ch.means, smooth_ref.means, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(smooth_ch.covs, smooth_ref.covs, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(logz_ch, logz_ref, rtol=1e-8)
