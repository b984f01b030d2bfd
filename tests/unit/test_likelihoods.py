"""Likelihood classes vs dense numeric oracles.

Mirrors the reference's likelihood tests
(tests/integration/likelihoods/test_likelihoods.py:54-165: univariate ≡
MultivariateGaussian(dim=1), block-diag stacking additivity) and extends
them with brute-force trapezoid-quadrature oracles for every
``variational_expectations`` / ``predict_density`` / ``predict_mean_and_var``
implementation (closed-form and Gauss–Hermite-backed alike).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from vi_diffusion_processes_tpu.likelihoods import (
    Bernoulli,
    Gaussian,
    MultivariateGaussian,
    PEPGaussian,
    Poisson,
)

N = 7


@pytest.fixture
def fdata(rng):
    f_means = rng.normal(size=(N, 1)) * 0.8
    f_vars = rng.uniform(0.05, 0.6, size=(N, 1))
    return jnp.asarray(f_means), jnp.asarray(f_vars)


def _brute_ve(log_prob, f_means, f_vars, y, lo=-12.0, hi=12.0, n=20001):
    """Dense trapezoid oracle for E_{N(f;μ,S)}[log p(y|f)], per datum."""
    f = np.linspace(lo, hi, n)
    out = np.zeros(f_means.shape[0])
    for i in range(f_means.shape[0]):
        mu, s = float(f_means[i, 0]), float(f_vars[i, 0])
        w = scipy.stats.norm.pdf(f, mu, np.sqrt(s))
        out[i] = np.trapezoid(w * log_prob(f, float(y[i, 0])), f)
    return out


def _brute_pred_density(prob, f_means, f_vars, y, lo=-12.0, hi=12.0, n=20001):
    f = np.linspace(lo, hi, n)
    out = np.zeros(f_means.shape[0])
    for i in range(f_means.shape[0]):
        mu, s = float(f_means[i, 0]), float(f_vars[i, 0])
        w = scipy.stats.norm.pdf(f, mu, np.sqrt(s))
        out[i] = np.log(np.trapezoid(w * prob(f, float(y[i, 0])), f))
    return out


# ---------------------------------------------------------------- Gaussian
def test_gaussian_ve_matches_quadrature(rng, fdata):
    f_means, f_vars = fdata
    y = jnp.asarray(rng.normal(size=(N, 1)))
    lik = Gaussian(variance=jnp.asarray(0.3))
    got = lik.variational_expectations(f_means, f_vars, y)
    want = _brute_ve(
        lambda f, yy: scipy.stats.norm.logpdf(yy, f, np.sqrt(0.3)), f_means, f_vars, y
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gaussian_predict_density_analytic(rng, fdata):
    f_means, f_vars = fdata
    y = jnp.asarray(rng.normal(size=(N, 1)))
    lik = Gaussian(variance=jnp.asarray(0.3))
    got = lik.predict_density(f_means, f_vars, y)
    want = scipy.stats.norm.logpdf(
        np.asarray(y)[:, 0], np.asarray(f_means)[:, 0], np.sqrt(np.asarray(f_vars)[:, 0] + 0.3)
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_gaussian_predict_mean_and_var(fdata):
    f_means, f_vars = fdata
    lik = Gaussian(variance=jnp.asarray(0.3))
    m, v = lik.predict_mean_and_var(f_means, f_vars)
    np.testing.assert_allclose(m, f_means)
    np.testing.assert_allclose(v, np.asarray(f_vars) + 0.3)


# ----------------------------------------------------------------- Poisson
def test_poisson_ve_matches_quadrature(rng, fdata):
    f_means, f_vars = fdata
    y = jnp.asarray(rng.poisson(2.0, size=(N, 1)).astype(np.float64))
    lik = Poisson()
    got = lik.variational_expectations(f_means, f_vars, y)
    want = _brute_ve(
        lambda f, yy: scipy.stats.poisson.logpmf(yy, np.exp(f)), f_means, f_vars, y
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_poisson_binsize_scales_rate(rng, fdata):
    f_means, f_vars = fdata
    y = jnp.asarray(rng.poisson(2.0, size=(N, 1)).astype(np.float64))
    got = Poisson(binsize=2.5).variational_expectations(f_means, f_vars, y)
    # shifting f by log(binsize) in a unit-binsize Poisson is identical
    want = Poisson().variational_expectations(
        f_means + jnp.log(2.5), f_vars, y
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_poisson_predict_density_vs_quadrature(rng, fdata):
    f_means, f_vars = fdata
    y = jnp.asarray(rng.poisson(2.0, size=(N, 1)).astype(np.float64))
    lik = Poisson()
    got = lik.predict_density(f_means, f_vars, y)
    want = _brute_pred_density(
        lambda f, yy: scipy.stats.poisson.pmf(yy, np.exp(f)), f_means, f_vars, y
    )
    # Gauss–Hermite with 20 points vs dense trapezoid
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_poisson_predict_mean_and_var_lognormal(fdata):
    f_means, f_vars = fdata
    lik = Poisson()
    m, v = lik.predict_mean_and_var(f_means, f_vars)
    # E[y] = E[e^f] = exp(μ + S/2); Var[y] = E[e^f] + Var[e^f] (lognormal)
    mu, s = np.asarray(f_means), np.asarray(f_vars)
    ey = np.exp(mu + s / 2)
    vy = ey + (np.exp(s) - 1.0) * np.exp(2 * mu + s)
    np.testing.assert_allclose(m, ey, rtol=1e-5)
    np.testing.assert_allclose(v, vy, rtol=1e-4)


# --------------------------------------------------------------- Bernoulli
def test_bernoulli_ve_matches_quadrature(rng, fdata):
    f_means, f_vars = fdata
    y = jnp.asarray((rng.uniform(size=(N, 1)) > 0.5).astype(np.float64))

    def logp(f, yy):
        return yy * f - np.logaddexp(0.0, f)

    lik = Bernoulli()
    got = lik.variational_expectations(f_means, f_vars, y)
    want = _brute_ve(logp, f_means, f_vars, y)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bernoulli_predict_density_vs_quadrature(rng, fdata):
    f_means, f_vars = fdata
    y = jnp.asarray((rng.uniform(size=(N, 1)) > 0.5).astype(np.float64))
    lik = Bernoulli()
    got = lik.predict_density(f_means, f_vars, y)
    want = _brute_pred_density(
        lambda f, yy: np.exp(yy * f - np.logaddexp(0.0, f)), f_means, f_vars, y
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


# -------------------------------------------------- MultivariateGaussian
def test_mvn_dim1_equals_univariate(rng, fdata):
    """Reference test_likelihoods.py:54-88: MVN(dim=1) ≡ scalar Gaussian."""
    f_means, f_vars = fdata
    y = jnp.asarray(rng.normal(size=(N, 1)))
    var = 0.49
    uni = Gaussian(variance=jnp.asarray(var))
    mvn = MultivariateGaussian(chol_covariance=jnp.asarray([[np.sqrt(var)]]))
    got_uni = uni.variational_expectations(f_means, f_vars, y)
    got_mvn = mvn.variational_expectations(f_means, f_vars[..., None] * jnp.eye(1), y)
    np.testing.assert_allclose(got_uni, got_mvn, rtol=1e-9)
    # diagonal-variances calling convention must agree with full-cov
    got_diag = mvn.variational_expectations(f_means, f_vars, y)
    np.testing.assert_allclose(got_diag, got_mvn, rtol=1e-9)


def test_mvn_block_diag_additivity(rng, fdata):
    """Reference test_likelihoods.py:90-120: stacking two independent dims
    block-diagonally sums their univariate VEs."""
    f_means, f_vars = fdata
    y = jnp.asarray(rng.normal(size=(N, 1)))
    f2 = jnp.concatenate([f_means, f_means + 1.0], axis=-1)
    y2 = jnp.concatenate([y, y + 1.0], axis=-1)
    covs2 = f_vars[..., 0][..., None, None] * jnp.eye(2)
    mvn1 = MultivariateGaussian(chol_covariance=jnp.eye(1))
    mvn2 = MultivariateGaussian(chol_covariance=jnp.eye(2))
    ve_a = mvn1.variational_expectations(f_means, f_vars[..., None] * jnp.eye(1), y)
    ve_b = mvn1.variational_expectations(
        f_means + 1.0, f_vars[..., None] * jnp.eye(1), y + 1.0
    )
    ve_2 = mvn2.variational_expectations(f2, covs2, y2)
    np.testing.assert_allclose(ve_2, ve_a + ve_b, rtol=1e-9)


def test_mvn_ve_full_cov_oracle(rng):
    """VE = log N(y; μ, Σ) − ½tr(Σ⁻¹S) against explicit dense math."""
    m = 3
    a = rng.normal(size=(m, m))
    chol = jnp.asarray(np.linalg.cholesky(a @ a.T + m * np.eye(m)))
    f_means = jnp.asarray(rng.normal(size=(N, m)))
    s_raw = rng.normal(size=(N, m, m))
    s = jnp.asarray(s_raw @ np.swapaxes(s_raw, -1, -2) + 0.5 * np.eye(m))
    y = jnp.asarray(rng.normal(size=(N, m)))
    lik = MultivariateGaussian(chol_covariance=chol)
    got = lik.variational_expectations(f_means, s, y)
    sigma = np.asarray(chol) @ np.asarray(chol).T
    want = np.array(
        [
            scipy.stats.multivariate_normal.logpdf(y[i], np.asarray(f_means)[i], sigma)
            - 0.5 * np.trace(np.linalg.solve(sigma, np.asarray(s)[i]))
            for i in range(N)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_mvn_predict_density_oracle(rng):
    m = 2
    chol = jnp.asarray([[0.8, 0.0], [0.3, 0.6]])
    f_means = jnp.asarray(rng.normal(size=(N, m)))
    s_raw = rng.normal(size=(N, m, m))
    s = jnp.asarray(s_raw @ np.swapaxes(s_raw, -1, -2) + 0.4 * np.eye(m))
    y = jnp.asarray(rng.normal(size=(N, m)))
    lik = MultivariateGaussian(chol_covariance=chol)
    got = lik.predict_density(f_means, s, y)
    sigma = np.asarray(chol) @ np.asarray(chol).T
    want = np.array(
        [
            scipy.stats.multivariate_normal.logpdf(
                y[i], np.asarray(f_means)[i], sigma + np.asarray(s)[i]
            )
            for i in range(N)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_mvn_predict_mean_and_var(rng):
    m = 2
    chol = jnp.asarray([[0.8, 0.0], [0.3, 0.6]])
    f_means = jnp.asarray(rng.normal(size=(N, m)))
    s_raw = rng.normal(size=(N, m, m))
    s = jnp.asarray(s_raw @ np.swapaxes(s_raw, -1, -2) + 0.4 * np.eye(m))
    lik = MultivariateGaussian(chol_covariance=chol)
    mu, cov = lik.predict_mean_and_var(f_means, s)
    sigma = np.asarray(chol) @ np.asarray(chol).T
    np.testing.assert_allclose(mu, f_means)
    np.testing.assert_allclose(cov, np.asarray(s) + sigma, rtol=1e-9)


# --------------------------------------------------------------------- PEP
def test_pep_scalar_led_true_integral(rng, fdata):
    """PEPScalarLikelihood's log-space Gauss–Hermite computes the TRUE
    ``log ∫ p(y|f)^α N(f; μ, v) df`` — check vs dense quadrature."""
    from vi_diffusion_processes_tpu.likelihoods import PEPScalarLikelihood

    f_means, f_vars = fdata
    y = jnp.asarray(rng.normal(size=(N, 1)))
    var, alpha = 0.3, 0.7
    lik = PEPScalarLikelihood(base=Gaussian(variance=jnp.asarray(var)))
    got = lik.log_expected_density(f_means, f_vars, y, alpha=alpha)
    want = _brute_pred_density(
        lambda f, yy: scipy.stats.norm.pdf(yy, f, np.sqrt(var)) ** alpha,
        f_means,
        f_vars,
        y,
    )
    np.testing.assert_allclose(np.asarray(got).reshape(-1), want, rtol=1e-5)


def test_pep_gaussian_reference_form(rng, fdata):
    """PEPGaussian matches the reference's α·log N(y; μ, σ²+v) form
    (constant dropped — documented quirk, likelihoods.py:262)."""
    f_means, f_vars = fdata
    y = jnp.asarray(rng.normal(size=(N, 1)))
    var, alpha = 0.3, 0.7
    lik = PEPGaussian(base=Gaussian(variance=jnp.asarray(var)))
    got = lik.log_expected_density(f_means, f_vars, y, alpha=alpha)
    want = alpha * scipy.stats.norm.logpdf(
        np.asarray(y)[:, 0],
        np.asarray(f_means)[:, 0],
        np.sqrt(np.asarray(f_vars)[:, 0] + var),
    )
    np.testing.assert_allclose(np.asarray(got).reshape(-1), want, rtol=1e-8)


def test_pep_grad_led_vs_finite_difference(rng, fdata):
    """grad_log_expected_density's (∇_μ, ∇²_μ) vs central differences."""
    from vi_diffusion_processes_tpu.likelihoods import PEPScalarLikelihood

    f_means, f_vars = fdata
    y = jnp.asarray((rng.uniform(size=(N, 1)) > 0.5).astype(np.float64) * 2 - 1)
    lik = PEPScalarLikelihood(base=Bernoulli())
    alpha = 0.5
    y01 = (y + 1) / 2
    _, (g1, g2) = lik.grad_log_expected_density(f_means, f_vars, y01, alpha=alpha)
    eps = 1e-5

    def led(mu):
        return np.asarray(lik.log_expected_density(mu, f_vars, y01, alpha=alpha))

    fd1 = (led(f_means + eps) - led(f_means - eps)) / (2 * eps)
    fd2 = (led(f_means + eps) - 2 * led(f_means) + led(f_means - eps)) / eps**2
    np.testing.assert_allclose(np.asarray(g1).reshape(-1), fd1.reshape(-1), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g2).reshape(-1), fd2.reshape(-1), rtol=1e-3, atol=1e-4)
