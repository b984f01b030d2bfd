"""Experiment runners: configuration → trained model + metrics.

Equivalents of the reference's Hydra entry points
(docs/diffusion_processes/cvi_dp.py:25, vi_markov_gp.py:24, gpr_linear.py,
gpr_non_linear.py): plain dataclass configs instead of Hydra YAML (zero
extra dependencies; every field maps 1:1 onto the reference's
``configs/*.yaml`` keys), the trainers from
:mod:`~..optim.trainers`, NLPD/RMSE on the held-out split.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..likelihoods.gaussian import Gaussian
from ..models.cvi_dp import CVISitesSDE
from ..models.vdp import VariationalMarkovGP
from ..optim.trainers import CVISitesTrainer, VDPTrainer
from .data import DPDataset, build_prior_sde, get_observations
from .metrics import grid_indices, nlpd, rmse

__all__ = ["ExperimentConfig", "run_cvi_dp", "run_vdp", "run_gpr", "make_dataset"]


@dataclasses.dataclass
class ExperimentConfig:
    """Mirror of configs/cvi_base.yaml + vi_base.yaml + prior_sde/*.yaml."""

    prior_sde: str = "dw"
    prior_sde_kwargs: Dict = dataclasses.field(default_factory=dict)
    q: float = 1.0
    t0: float = 0.0
    t1: float = 10.0
    num_grid: int = 1001
    num_observations: int = 40
    noise_stddev: float = 0.316
    seed: int = 33
    # trainer
    sites_lr: float = 0.5
    max_inner_iters: int = 20
    max_outer_iters: int = 10
    learn_prior_sde: bool = False
    prior_sde_lr: float = 0.01
    stabilize_ssm: bool = True
    clip_state_transitions: tuple = (-1.0, 1.0)
    # vdp trainer
    vdp_lr: float = 0.05
    vdp_warmup_steps: int = 20

    @classmethod
    def from_yaml(cls, path, overrides=()) -> "ExperimentConfig":
        """Load a config from YAML with Hydra-style ``key=value`` override
        strings (the reference's CLI pattern,
        docs/diffusion_processes/README.md:37-49).  Dotted keys index into
        dict fields (``prior_sde_kwargs.decay=2.0``); values parse as YAML
        scalars so ``true``/``1e-3``/``[a,b]`` behave as expected."""
        import pathlib

        import yaml

        raw = yaml.safe_load(pathlib.Path(path).read_text()) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        return cls(**raw)._apply_overrides(overrides)

    @classmethod
    def from_yaml_overrides(cls, overrides=()) -> "ExperimentConfig":
        """Defaults + ``key=value`` overrides only (no YAML file)."""
        return cls()._apply_overrides(overrides)

    def _apply_overrides(self, overrides) -> "ExperimentConfig":
        import yaml

        known = {f.name for f in dataclasses.fields(self)}
        for item in overrides:
            key, sep, value = item.partition("=")
            if not sep:
                raise ValueError(f"override must be key=value, got {item!r}")
            value = yaml.safe_load(value)
            head, _, rest = key.partition(".")
            if head not in known:
                raise ValueError(f"unknown config key: {head!r}")
            if rest:
                getattr(self, head)[rest] = value
            else:
                setattr(self, head, value)
        if isinstance(self.clip_state_transitions, list):
            self.clip_state_transitions = tuple(self.clip_state_transitions)
        return self


def make_dataset(config: ExperimentConfig) -> DPDataset:
    sde = build_prior_sde(config.prior_sde, q=config.q, **config.prior_sde_kwargs)
    return get_observations(
        sde,
        jax.random.PRNGKey(config.seed),
        t0=config.t0,
        t1=config.t1,
        num_grid=config.num_grid,
        num_observations=config.num_observations,
        noise_stddev=config.noise_stddev,
    )


def _metrics(model_means, model_vars, dataset: DPDataset) -> Dict[str, float]:
    idx = grid_indices(dataset.time_grid, dataset.test_times)
    m = model_means[idx]
    v = model_vars[idx]
    return {
        "nlpd": float(nlpd(m, v, dataset.test_values, dataset.noise_stddev**2)),
        "rmse": float(rmse(m, dataset.test_values)),
    }


def run_cvi_dp(config: ExperimentConfig, dataset: Optional[DPDataset] = None) -> Dict:
    """CVI-DP experiment (cvi_dp.py:25-159 + cvi_dp_trainer.py)."""
    dataset = dataset or make_dataset(config)
    sde = build_prior_sde(config.prior_sde, q=config.q, **config.prior_sde_kwargs)
    model = CVISitesSDE.initialize_sde(
        sde,
        dataset.time_grid,
        (dataset.obs_times, dataset.obs_values),
        Gaussian(variance=jnp.asarray(dataset.noise_stddev**2)),
        stabilize_ssm=config.stabilize_ssm,
        clip_state_transitions=config.clip_state_transitions,
    )
    trainer = CVISitesTrainer(
        model,
        sites_lr=config.sites_lr,
        max_inner_iters=config.max_inner_iters,
        max_outer_iters=config.max_outer_iters,
        learn_prior_sde=config.learn_prior_sde,
        prior_sde_lr=config.prior_sde_lr,
    )
    elbos = trainer.optimize()
    model = trainer.model
    means, covs = model.dist_q.marginals()
    metrics = _metrics(means, jnp.diagonal(covs, axis1=-2, axis2=-1), dataset)
    return {
        "model": model,
        "elbos": elbos,
        "posterior_means": means,
        "posterior_covs": covs,
        "learned_prior_sde": model.prior_sde,
        **metrics,
    }


def run_vdp(config: ExperimentConfig, dataset: Optional[DPDataset] = None) -> Dict:
    """VDP experiment (vi_markov_gp.py:24-187 + vi_markov_gp_trainer.py)."""
    dataset = dataset or make_dataset(config)
    sde = build_prior_sde(config.prior_sde, q=config.q, **config.prior_sde_kwargs)
    model = VariationalMarkovGP.initialize(
        (dataset.obs_times, dataset.obs_values),
        sde,
        dataset.time_grid,
        Gaussian(variance=jnp.asarray(dataset.noise_stddev**2)),
    )
    trainer = VDPTrainer(
        model,
        lr=config.vdp_lr,
        warmup_steps=config.vdp_warmup_steps,
        learn_prior_sde=config.learn_prior_sde,
        prior_sde_lr=config.prior_sde_lr,
    )
    elbos = trainer.optimize(n_rounds=3 if config.learn_prior_sde else 1)
    model = trainer.model
    means, covs = model.forward_pass()
    metrics = _metrics(means, jnp.diagonal(covs, axis1=-2, axis2=-1), dataset)
    return {
        "model": model,
        "elbos": elbos,
        "posterior_means": means,
        "posterior_covs": covs,
        "learned_prior_sde": model.prior_sde,
        **metrics,
    }


def run_gpr(config: ExperimentConfig, dataset: Optional[DPDataset] = None) -> Dict:
    """Exact-GPR baseline on the same data (gpr_linear.py / gpr_non_linear.py
    equivalents): an OU state-space kernel with Adam-trained hyperparameters.
    """
    import optax

    from ..kernels.matern import OrnsteinUhlenbeck
    from ..models.gpr import GaussianProcessRegression

    dataset = dataset or make_dataset(config)
    dtype = dataset.obs_values.dtype

    def make_model(kernel):
        return GaussianProcessRegression(
            kernel=kernel,
            time_points=dataset.obs_times,
            observations=dataset.obs_values,
            chol_obs_covariance=jnp.asarray([[dataset.noise_stddev]], dtype),
        )

    kernel = OrnsteinUhlenbeck(
        decay=jnp.asarray(1.0, dtype), diffusion=jnp.asarray(config.q, dtype)
    )
    opt = optax.adam(0.05)
    state = opt.init(kernel)

    @jax.jit
    def step(k, s):
        loss, g = jax.value_and_grad(lambda kk: make_model(kk).loss())(k)
        updates, s = opt.update(g, s)
        return optax.apply_updates(k, updates), s, loss

    losses = []
    for _ in range(60):
        kernel, state, loss = step(kernel, state)
        losses.append(float(loss))

    model = make_model(kernel)
    posterior = model.posterior
    f_mu, f_var = posterior.predict_f(dataset.test_times)
    return {
        "model": model,
        "losses": losses,
        "kernel": kernel,
        "nlpd": float(nlpd(f_mu, f_var, dataset.test_values, dataset.noise_stddev**2)),
        "rmse": float(rmse(f_mu, dataset.test_values)),
    }
