"""Metrics: full-covariance NLPD vs a scipy oracle (exp_dp_utils.py:189-224)."""
import numpy as np
import jax.numpy as jnp

from vi_diffusion_processes_tpu.exp.metrics import (
    calculate_nlpd,
    calculate_rmse,
    grid_indices,
    nlpd,
    nlpd_full,
    rmse,
)


def test_nlpd_full_matches_scipy_oracle():
    from scipy.stats import multivariate_normal

    rng = np.random.default_rng(0)
    n, d = 7, 3
    m = rng.normal(size=(n, d))
    a = rng.normal(size=(n, d, d))
    covs = np.einsum("nij,nkj->nik", a, a) + 0.25 * np.eye(d)
    y = rng.normal(size=(n, d))
    noise = 0.3

    lpd = [
        multivariate_normal.logpdf(y[i], m[i], covs[i] + noise * np.eye(d))
        for i in range(n)
    ]
    expected = -np.mean(lpd)
    got = nlpd_full(jnp.asarray(m), jnp.asarray(covs), jnp.asarray(y), noise)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_nlpd_full_reduces_to_diagonal_for_d1():
    rng = np.random.default_rng(1)
    n = 11
    m = rng.normal(size=(n, 1))
    v = rng.uniform(0.1, 2.0, size=(n, 1))
    y = rng.normal(size=(n, 1))
    diag = nlpd(jnp.asarray(m), jnp.asarray(v), jnp.asarray(y), 0.2)
    full = nlpd_full(jnp.asarray(m), jnp.asarray(v)[..., None], jnp.asarray(y), 0.2)
    np.testing.assert_allclose(full, diag, rtol=1e-12)


def test_calculate_entry_points_gather_grid_indices():
    grid = jnp.linspace(0.0, 1.0, 101)
    times = grid[jnp.asarray([5, 30, 77])]
    idx = grid_indices(grid, times)
    np.testing.assert_array_equal(np.asarray(idx), [5, 30, 77])

    m = jnp.zeros((101, 1)).at[30, 0].set(2.0)
    y = jnp.zeros((3, 1))
    r = calculate_rmse(m, grid, (times, y))
    np.testing.assert_allclose(r, np.sqrt(4.0 / 3.0), rtol=1e-12)

    s_full = jnp.tile(jnp.eye(1), (101, 1, 1))
    s_diag = jnp.ones((101, 1))
    n_full = calculate_nlpd(m, s_full, grid, (times, y), 0.0)
    n_diag = calculate_nlpd(m, s_diag, grid, (times, y), 0.0)
    np.testing.assert_allclose(n_full, n_diag, rtol=1e-12)
    np.testing.assert_allclose(
        n_diag, float(nlpd(m[idx], s_diag[idx], y, 0.0)), rtol=1e-12
    )
