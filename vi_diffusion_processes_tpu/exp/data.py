"""Synthetic diffusion-process data generation.

Equivalent of docs/diffusion_processes/generate_data.py:25
(``get_observations``): simulate a latent SDE path with Euler–Maruyama on a
dense grid, observe a random subset with Gaussian noise, hold out a test
split, optionally produce k-folds.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sde.base import SDE
from ..sde.utils import euler_maruyama

__all__ = [
    "DPDataset",
    "get_observations",
    "build_prior_sde",
    "modify_time_grid",
    "get_k_folds",
    "save_dataset_npz",
    "load_exp_data",
]


class DPDataset(NamedTuple):
    latent_path: jnp.ndarray  # [T, d]
    time_grid: jnp.ndarray  # [T]
    obs_times: jnp.ndarray  # [n_train]
    obs_values: jnp.ndarray  # [n_train, d]
    test_times: jnp.ndarray  # [n_test]
    test_values: jnp.ndarray  # [n_test, d]
    noise_stddev: float
    x0: jnp.ndarray


def get_observations(
    sde: SDE,
    key: jax.Array,
    t0: float = 0.0,
    t1: float = 10.0,
    num_grid: int = 1001,
    num_observations: int = 40,
    noise_stddev: float = 0.1,
    test_fraction: float = 0.2,
    x0: Optional[jnp.ndarray] = None,
) -> DPDataset:
    """Simulate + subsample + split (generate_data.py:25-68)."""
    k_sim, k_idx, k_noise, k_split = jax.random.split(key, 4)
    grid = jnp.linspace(t0, t1, num_grid)
    d = sde.state_dim
    if x0 is None:
        x0 = jnp.ones((d,))
    path = euler_maruyama(sde, x0, grid, k_sim)  # [T, d]

    # random interior observation indices (never the first/last grid point)
    candidates = np.arange(1, num_grid - 1)
    idx = np.sort(
        np.asarray(
            jax.random.choice(k_idx, candidates, (num_observations,), replace=False)
        )
    )
    values = path[idx] + noise_stddev * jax.random.normal(k_noise, (num_observations, d))

    n_test = int(round(test_fraction * num_observations))
    perm = np.asarray(jax.random.permutation(k_split, num_observations))
    test_sel = np.sort(perm[:n_test])
    train_sel = np.sort(perm[n_test:])
    return DPDataset(
        latent_path=path,
        time_grid=grid,
        obs_times=grid[idx[train_sel]],
        obs_values=values[train_sel],
        test_times=grid[idx[test_sel]],
        test_values=values[test_sel],
        noise_stddev=noise_stddev,
        x0=x0,
    )


def build_prior_sde(name: str, dtype=jnp.float64, q: float = 1.0, **kwargs) -> SDE:
    """Factory matching the reference's Hydra ``prior_sde/*.yaml`` targets
    (configs/prior_sde/{ou,dw,benes,sine,sqrt,vanderpol,mlpdrift}.yaml)."""
    from ..sde import zoo

    q1 = jnp.asarray([[q]], dtype)
    if name == "ou":
        return zoo.OrnsteinUhlenbeckSDE(decay=jnp.asarray(kwargs.get("decay", 1.0), dtype), q_mat=q1)
    if name == "dw":
        return zoo.DoubleWellSDE(
            q_mat=q1,
            scale=jnp.asarray(kwargs.get("scale", 4.0), dtype),
            c=jnp.asarray(kwargs.get("c", 1.0), dtype),
        )
    if name == "benes":
        return zoo.BenesSDE(theta=jnp.asarray(kwargs.get("theta", 1.0), dtype), q_mat=q1)
    if name == "sine":
        return zoo.SineDiffusionSDE(theta=jnp.asarray(kwargs.get("theta", 0.0), dtype), q_mat=q1)
    if name == "sqrt":
        return zoo.SqrtDiffusionSDE(theta=jnp.asarray(kwargs.get("theta", 1.0), dtype), q_mat=q1)
    if name == "vanderpol":
        return zoo.VanderPolOscillatorSDE(
            a=jnp.asarray(kwargs.get("a", 1.0), dtype),
            tau=jnp.asarray(kwargs.get("tau", 1.0), dtype),
            q_mat=jnp.eye(2, dtype=dtype) * q,
        )
    if name == "mlpdrift":
        return zoo.MLPDrift.initialize(kwargs.get("key", jax.random.PRNGKey(0)), q1)
    raise ValueError(f"unknown prior sde: {name}")


def modify_time_grid(time_grid: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Rebuild a uniform grid over the same span with step ``dt``
    (exp_dp_utils.py:177-186), rounded to ``dt``'s decimal places so
    observation times land exactly on grid nodes."""
    t0 = float(time_grid[0])
    t1 = float(time_grid[-1])
    n_decimals = str(dt)[::-1].find(".")
    grid = np.arange(t0, t1 + dt, dt)
    return jnp.asarray(np.round(grid, max(n_decimals, 0)), time_grid.dtype)


def save_dataset_npz(
    path,
    dataset: DPDataset,
    sde_name: str = "",
    q: float = 1.0,
    decay: float = 0.0,
) -> None:
    """Write a reference-compatible ``.npz`` artifact
    (generate_data.py:128-141 key set: sde, decay, Q, x0, sigma,
    latent_process, observations, observation_grid, time_grid,
    test_observations, test_grid)."""
    d = dataset.latent_path.shape[-1]
    np.savez(
        path,
        sde=sde_name,
        decay=decay,
        Q=q * np.eye(d),
        x0=np.asarray(dataset.x0).reshape(1, d),
        sigma=dataset.noise_stddev,
        latent_process=np.asarray(dataset.latent_path),
        observations=np.asarray(dataset.obs_values),
        observation_grid=np.asarray(dataset.obs_times),
        time_grid=np.asarray(dataset.time_grid),
        test_observations=np.asarray(dataset.test_values),
        test_grid=np.asarray(dataset.test_times),
    )


def load_exp_data(path) -> DPDataset:
    """Load a reference-format ``.npz`` (exp_dp_utils.py:108-125) back into
    a :class:`DPDataset` (Q/decay/sde metadata are in the file for the
    caller; the dataset carries the arrays)."""
    data = np.load(path, allow_pickle=True)
    return DPDataset(
        latent_path=jnp.asarray(data["latent_process"]),
        time_grid=jnp.asarray(data["time_grid"]),
        obs_times=jnp.asarray(data["observation_grid"]),
        obs_values=jnp.asarray(data["observations"]),
        test_times=jnp.asarray(data["test_grid"]),
        test_values=jnp.asarray(data["test_observations"]),
        noise_stddev=float(data["sigma"]),
        x0=jnp.asarray(data["x0"]).reshape(-1),
    )


def get_k_folds(times: jnp.ndarray, values: jnp.ndarray, k_folds: int, seed: int = 0):
    """Shuffled k-fold train/test splits, times kept sorted within each fold
    (exp_dp_utils.py:294-320).  Returns ``(train_sets, test_sets)`` where each
    entry is a ``(times, values)`` tuple."""
    n = times.shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    folds = np.array_split(perm, k_folds)
    train_sets, test_sets = [], []
    for i in range(k_folds):
        test_idx = np.sort(folds[i])
        train_idx = np.sort(np.concatenate([folds[j] for j in range(k_folds) if j != i]))
        train_sets.append((times[train_idx], values[train_idx]))
        test_sets.append((times[test_idx], values[test_idx]))
    return train_sets, test_sets
