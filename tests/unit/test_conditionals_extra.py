"""Cyclic-reduction conditionals + LEG finite distribution + checkpointing."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.kernels.misc import LatentExponentiallyGenerated
from vi_diffusion_processes_tpu.ssm.conditionals import (
    cyclic_reduction_conditional_statistics,
)

from ..tools.oracles import dense_joint_from_ssm


def test_cyclic_reduction_statistics(rng):
    """F, G, L must reproduce the two-sided conditional p(xᵉ|xᶜ₋, xᶜ₊):
    mean = −L⁻ᵀ(Fᵀxᶜ₋ + Gᵀxᶜ₊)-structured; check against the dense joint
    (reference tests exercise this routine the same way)."""
    kernel = Matern32(lengthscale=jnp.asarray(0.7), variance=jnp.asarray(1.1))
    # interleaved grids: e_0 < c_0 < e_1 < c_1 < e_2 < c_2
    explained = jnp.asarray([0.0, 1.0, 2.0])
    conditioning = jnp.asarray([0.5, 1.5, 2.5])
    f, g, l = cyclic_reduction_conditional_statistics(explained, conditioning, kernel)
    assert f.shape == (2, 2, 2)  # num_explained − 1
    assert g.shape == (3, 2, 2)  # num_conditioning
    assert l.shape == (3, 2, 2)  # num_explained
    # conditional covariance of the middle explained point given both
    # neighbours: T = (L Lᵀ)⁻¹ must match the dense Schur complement
    t_mid = np.linalg.inv(np.asarray(l[1] @ l[1].T))

    union = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 2.5])
    ssm = kernel.state_space_model(union)
    params = {
        "initial_mean": np.asarray(ssm.initial_mean),
        "chol_initial_covariance": np.asarray(ssm.chol_initial_covariance),
        "state_transitions": np.asarray(ssm.state_transitions),
        "state_offsets": np.asarray(ssm.state_offsets),
        "chol_process_covariances": np.asarray(ssm.chol_process_covariances),
    }
    _, cov = dense_joint_from_ssm(params)
    d = 2
    # explained point e_1 = union index 2; neighbours c_0 (idx 1), c_1 (idx 3)
    ii = slice(2 * d, 3 * d)
    jj = np.r_[1 * d : 2 * d, 3 * d : 4 * d]
    s_ii = cov[ii, ii]
    s_ij = cov[ii, :][:, jj]
    s_jj = cov[np.ix_(jj, jj)]
    want = s_ii - s_ij @ np.linalg.solve(s_jj, s_ij.T)
    np.testing.assert_allclose(t_mid, want, rtol=1e-6, atol=1e-9)


def test_leg_finite_distribution(rng):
    """LEG output covariance at lag 0 is I; decays with lag (reference
    tests/integration/test_leg_kernels.py pattern)."""
    n = jnp.asarray(rng.normal(size=(2, 2)))
    r = jnp.asarray(rng.normal(size=(2, 2)))
    k = LatentExponentiallyGenerated(N=n, R=r)
    t = jnp.asarray([0.0, 0.5, 3.0])
    ssm = k.state_space_model(t)
    means, covs = ssm.marginals()
    np.testing.assert_allclose(covs, np.broadcast_to(np.eye(2), (3, 2, 2)), atol=1e-8)
    # cross-covariance = A(Δ) P∞: contracts with the gap
    cross_small = np.asarray(ssm.subsequent_covariances(covs))[0]
    cross_large = np.asarray(ssm.subsequent_covariances(covs))[1]
    assert np.linalg.norm(cross_large) < np.linalg.norm(cross_small)


def test_checkpoint_roundtrip(tmp_path, rng):
    """orbax save/restore of a model pytree (utils/checkpoint.py)."""
    import jax

    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.cvi import CVIGaussianProcess
    from vi_diffusion_processes_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        save_npz_artifacts,
    )

    t = jnp.asarray(np.sort(rng.uniform(0, 3, 12)))
    y = jnp.asarray(rng.normal(size=(12, 1)))
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.0))
    model = CVIGaussianProcess.initialize(kernel, Gaussian(variance=jnp.asarray(0.1)), t, y)
    model = model.update_sites()

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, model)
    restored = restore_checkpoint(path, jax.tree_util.tree_map(jnp.zeros_like, model))
    np.testing.assert_allclose(restored.sites.nat1, model.sites.nat1, rtol=1e-12)
    np.testing.assert_allclose(float(restored.elbo()), float(model.elbo()), rtol=1e-12)

    save_npz_artifacts(str(tmp_path / "artifacts.npz"), sites_nat1=model.sites.nat1)
    loaded = np.load(tmp_path / "artifacts.npz")
    np.testing.assert_allclose(loaded["sites_nat1"], model.sites.nat1)


def test_serving_export_roundtrip(rng, tmp_path):
    """jax.export serving artifact: frozen GPR predict == live predict
    (utils/serving.py; no reference counterpart — TPU-native serving)."""
    import jax

    from vi_diffusion_processes_tpu.kernels.matern import Matern32
    from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression
    from vi_diffusion_processes_tpu.utils.serving import (
        export_jittable,
        load_artifact,
        save_artifact,
    )

    t = jnp.asarray(np.sort(rng.uniform(0, 3, 14)))
    y = jnp.asarray(rng.normal(size=(14, 1)))
    model = GaussianProcessRegression(
        kernel=Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.0)),
        time_points=t, observations=y, chol_obs_covariance=jnp.asarray([[0.3]]),
    )
    spec = jax.ShapeDtypeStruct((9,), t.dtype)
    artifact = export_jittable(lambda tn: model.posterior.predict_f(tn), spec)
    path = tmp_path / "gpr_predict.stablehlo"
    save_artifact(artifact, path)

    predict = load_artifact(path)
    t_new = jnp.linspace(0.2, 2.8, 9)
    f_mu, f_var = predict(t_new)
    ref_mu, ref_var = model.posterior.predict_f(t_new)
    np.testing.assert_allclose(f_mu, ref_mu, rtol=1e-12)
    np.testing.assert_allclose(f_var, ref_var, rtol=1e-12)


def test_pairwise_marginals_vs_dense(rng):
    """pairwise_marginals (conditionals.py:424-485): each consecutive-pair
    joint [m_k; m_{k+1}], [[P_k, C'],[C, P_{k+1}]] must match the dense
    joint covariance of the chain."""
    import jax.numpy as jnp
    from vi_diffusion_processes_tpu.ssm.conditionals import pairwise_marginals
    from vi_diffusion_processes_tpu.ssm.state_space_model import StateSpaceModel
    from ..tools.oracles import random_ssm_params

    n, d = 5, 2
    params = random_ssm_params(rng, (), n, d)
    ssm = StateSpaceModel(**{k: jnp.asarray(v) for k, v in params.items()})
    mean, cov = dense_joint_from_ssm(params)

    p0 = params["chol_initial_covariance"] @ params["chol_initial_covariance"].T
    jm, jc = pairwise_marginals(ssm, jnp.asarray(params["initial_mean"]), jnp.asarray(p0))
    assert jm.shape == (n + 2, 2 * d) and jc.shape == (n + 2, 2 * d, 2 * d)

    # interior entries k=1..n: joint of (x_{k-1}, x_k) — dense blocks
    for k in range(1, n + 1):
        i, j = (k - 1) * d, k * d
        np.testing.assert_allclose(jm[k, :d], mean[i : i + d], rtol=1e-9)
        np.testing.assert_allclose(jm[k, d:], mean[j : j + d], rtol=1e-9)
        np.testing.assert_allclose(jc[k, :d, :d], cov[i : i + d, i : i + d], rtol=1e-8)
        np.testing.assert_allclose(jc[k, d:, d:], cov[j : j + d, j : j + d], rtol=1e-8)
        np.testing.assert_allclose(jc[k, d:, :d], cov[j : j + d, i : i + d], rtol=1e-8, atol=1e-12)
    # boundary entries use the prior-extension convention: marginal blocks
    # on the diagonal, zero cross-covariance
    np.testing.assert_allclose(jc[0, :d, :d], p0, rtol=1e-9)
    np.testing.assert_allclose(jc[0, d:, :d], 0.0, atol=1e-14)
    np.testing.assert_allclose(jc[-1, d:, d:], p0, rtol=1e-9)
