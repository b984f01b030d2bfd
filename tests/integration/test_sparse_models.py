"""Sparse/EP model tests, following the reference equivalence patterns
(SURVEY.md §4): sparse model == dense model when Z == X, PEP exactness for
conjugate likelihoods, IWVI K→∞ consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.kernels.matern import Matern32
from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
from vi_diffusion_processes_tpu.likelihoods.pep import PEPGaussian
from vi_diffusion_processes_tpu.models.gpr import GaussianProcessRegression
from vi_diffusion_processes_tpu.models.iwvi import ImportanceWeightedVI
from vi_diffusion_processes_tpu.models.pep import PowerExpectationPropagation
from vi_diffusion_processes_tpu.models.sparse_cvi import SparseCVIGaussianProcess
from vi_diffusion_processes_tpu.models.svgp import SparseVariationalGaussianProcess
from vi_diffusion_processes_tpu.models.variational import VariationalGaussianProcess

NOISE = 0.1


@pytest.fixture
def data(rng):
    t = np.sort(rng.uniform(0, 4, size=24))
    y = (np.sin(2 * t) + 0.3 * rng.normal(size=24))[:, None]
    return jnp.asarray(t), jnp.asarray(y)


@pytest.fixture
def kernel():
    return Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.2))


def test_svgp_at_data_equals_vgp(data, kernel):
    """SVGP with Z == X has the same ELBO as VGP (same q)."""
    t, y = data
    lik = Gaussian(variance=jnp.asarray(NOISE))
    svgp = SparseVariationalGaussianProcess.initialize(kernel, lik, t)
    vgp = VariationalGaussianProcess.initialize(kernel, lik, t, y)
    # both initialized at the prior, same q ⇒ same ELBO
    np.testing.assert_allclose(svgp.elbo((t, y)), vgp.elbo(), rtol=1e-8)


def test_sparse_cvi_matches_gpr_when_dense(data, kernel):
    """SparseCVI with Z == X and lr=1: one site update reaches the exact
    posterior for a Gaussian likelihood (reference test pattern)."""
    t, y = data
    lik = Gaussian(variance=jnp.asarray(NOISE))
    model = SparseCVIGaussianProcess.initialize(kernel, lik, t, learning_rate=1.0)
    for _ in range(2):
        model = model.update_sites((t, y))
    gpr = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    np.testing.assert_allclose(
        model.classic_elbo((t, y)), gpr.log_likelihood(), rtol=1e-6
    )
    q_means, _ = model.dist_q.marginals()
    p_means, _ = gpr.posterior_state_space_model().marginals()
    np.testing.assert_allclose(q_means, p_means, rtol=1e-5, atol=1e-7)


def test_pep_gaussian_exact(data, kernel):
    """PEP with a Gaussian likelihood, α=1, lr=1: one update gives the exact
    sites, elbo == GPR log marginal."""
    t, y = data
    pep = PowerExpectationPropagation.initialize(
        kernel, PEPGaussian(base=Gaussian(variance=jnp.asarray(NOISE))),
        t, y, alpha=1.0, learning_rate=1.0,
    )
    pep = pep.update_sites()
    gpr = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    np.testing.assert_allclose(pep.elbo(), gpr.log_likelihood(), rtol=1e-7)
    # sites must be invariant under further updates (EP fixed point)
    pep2 = pep.update_sites()
    np.testing.assert_allclose(pep2.sites.nat1, pep.sites.nat1, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(pep2.sites.nat2, pep.sites.nat2, rtol=1e-6, atol=1e-8)


def test_pep_energy_matches_loglik_at_fixed_point(data, kernel):
    """At the conjugate fixed point the PEP energy equals log p(y)."""
    t, y = data
    pep = PowerExpectationPropagation.initialize(
        kernel, PEPGaussian(base=Gaussian(variance=jnp.asarray(NOISE))),
        t, y, alpha=1.0, learning_rate=1.0,
    )
    pep = pep.update_sites()
    gpr = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    np.testing.assert_allclose(pep.energy(), gpr.log_likelihood(), rtol=1e-6)


def test_iwvi_k1_matches_single_sample_elbo(data, kernel, key):
    """IWVI sanity: the IW-ELBO is finite and increases with K on average
    (iwvi.py equivalence: K=1 is the plain ELBO estimator)."""
    t, y = data
    lik = Gaussian(variance=jnp.asarray(NOISE))
    elbos = {}
    for k in (1, 64):
        model = ImportanceWeightedVI.initialize(kernel, lik, t, num_importance_samples=k)
        vals = [float(model.elbo((t, y), jax.random.fold_in(key, i))) for i in range(8)]
        elbos[k] = np.mean(vals)
    assert np.isfinite(elbos[1]) and np.isfinite(elbos[64])
    assert elbos[64] >= elbos[1] - 1.0  # IW bound tightens with K


def test_iwvi_bound_below_loglik(data, kernel, key):
    t, y = data
    lik = Gaussian(variance=jnp.asarray(NOISE))
    model = ImportanceWeightedVI.initialize(kernel, lik, t, num_importance_samples=128)
    gpr = GaussianProcessRegression(
        kernel=kernel, time_points=t, observations=y,
        chol_obs_covariance=jnp.asarray([[np.sqrt(NOISE)]]),
    )
    iw = np.mean([float(model.elbo((t, y), jax.random.fold_in(key, i))) for i in range(8)])
    assert iw <= float(gpr.log_likelihood()) + 0.5


def test_iwvi_samples_and_expectations(data, kernel, key):
    """IW posterior sampling + self-normalized expectations + DREGS grads
    (posterior.py:623-787, iwvi.py:143-173)."""
    t, y = data
    lik = Gaussian(variance=jnp.asarray(NOISE))
    model = ImportanceWeightedVI.initialize(kernel, lik, t, num_importance_samples=16)
    t_new = jnp.linspace(0.5, 3.5, 5)
    f = model.predict_f_samples(t_new, (t, y), key)
    assert f.shape == (16, 5, 1)
    ev = model.expected_value(t_new, (t, y), key)
    assert np.isfinite(np.asarray(ev)).all()
    g = jax.grad(lambda q: model.replace(dist_q=q).dregs_objective((t, y), key))(model.dist_q)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)


def test_svgp_trainable_inducing_points_through_ordered(data, kernel):
    """Train SVGP inducing points through the ``ordered()`` bijector — the
    reference's trainable-under-constraint path (sparse_variational.py:129,
    markovflow/base.py:27).  The unconstrained parameter moves freely under
    Adam; the constrained inducing points must stay strictly sorted at
    every step and the loss must improve."""
    import optax

    from vi_diffusion_processes_tpu.optim.bijectors import ordered, ordered_inverse

    t, y = data
    lik = Gaussian(variance=jnp.asarray(NOISE))
    z0 = jnp.linspace(float(t[0]), float(t[-1]), 8)
    base = SparseVariationalGaussianProcess.initialize(kernel, lik, z0)

    # round trip sanity
    np.testing.assert_allclose(ordered(ordered_inverse(z0)), z0, rtol=1e-10)

    def loss_fn(params):
        z = ordered(params["z_u"])
        model = base.replace(
            inducing_points=z, dist_q=base.kernel.state_space_model(z)
        )
        return model.loss((t, y))

    params = {"z_u": ordered_inverse(z0)}
    opt = optax.adam(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        val, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, val

    losses = []
    for _ in range(25):
        params, opt_state, val = step(params, opt_state)
        losses.append(float(val))
        z = ordered(params["z_u"])
        # strictly sorted after every update
        assert bool(jnp.all(jnp.diff(z) > 0)), "inducing points lost ordering"

    # the points actually moved and the objective improved
    assert not np.allclose(ordered(params["z_u"]), z0)
    assert losses[-1] < losses[0]
