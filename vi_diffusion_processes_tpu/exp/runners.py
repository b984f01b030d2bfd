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
from .metrics import grid_indices, nlpd, nlpd_full, rmse

__all__ = [
    "ExperimentConfig",
    "run_cvi_dp",
    "run_vdp",
    "run_gpr",
    "run_sgpr",
    "make_dataset",
]


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
    # sgpr
    num_inducing: int = 20
    # artifacts: when set, runners save posteriors/statistics npz + plots
    # here (cvi_dp.py:140-155 semantics)
    output_dir: Optional[str] = None

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


def _metrics(model_means, model_covs, dataset: DPDataset) -> Dict[str, float]:
    """NLPD (full predictive covariance — exp_dp_utils.py:189-206 semantics)
    + RMSE at the grid indices matching the test times."""
    idx = grid_indices(dataset.time_grid, dataset.test_times)
    m = model_means[idx]
    s = model_covs[idx]
    if s.ndim == m.ndim + 1:
        nlpd_val = nlpd_full(m, s, dataset.test_values, dataset.noise_stddev**2)
    else:
        nlpd_val = nlpd(m, s, dataset.test_values, dataset.noise_stddev**2)
    return {
        "nlpd": float(nlpd_val),
        "rmse": float(rmse(m, dataset.test_values)),
    }


def _save_run(
    output_dir: str, result: Dict, dataset: DPDataset, legend: str
) -> None:
    """Save posterior/statistics artifacts + plots into the run directory
    (cvi_dp.py:140-155 npz key set; exp_dp_utils plotting)."""
    import os

    import numpy as np

    from .plots import plot_line, plot_posterior

    os.makedirs(output_dir, exist_ok=True)
    m = np.asarray(result["posterior_means"])
    s = np.asarray(result["posterior_covs"])
    np.savez(
        os.path.join(output_dir, "posteriors.npz"),
        cvi_m=m, cvi_S=s, time_grid=np.asarray(dataset.time_grid),
    )
    np.savez(
        os.path.join(output_dir, "training_statistics.npz"),
        elbo=np.asarray(result.get("elbos", result.get("losses", []))),
        nlpd=result["nlpd"], rmse=result["rmse"],
    )
    model = result["model"]
    if hasattr(model, "data_sites"):
        g = model.girsanov_sites
        np.savez(
            os.path.join(output_dir, "cvi_model.npz"),
            data_sites_nat1=np.asarray(model.data_sites.nat1),
            data_sites_nat2=np.asarray(model.data_sites.nat2),
            girsanov_sites_nat1=np.asarray(g.nat1),
            girsanov_sites_nat2_diag=np.asarray(g.nat2_diag),
            girsanov_sites_nat2_subdiag=np.asarray(g.nat2_sub),
        )
    if "learned_prior_sde" in result and result["learned_prior_sde"] is not None:
        import jax

        leaves = {
            f"param_{i}": np.asarray(x)
            for i, x in enumerate(jax.tree_util.tree_leaves(result["learned_prior_sde"]))
        }
        np.savez(os.path.join(output_dir, "learnt_prior_params.npz"), **leaves)
    trace = result.get("elbos", result.get("losses", []))
    if len(trace):
        plot_line(trace, os.path.join(output_dir, "objective.png"), title="objective")
    plot_posterior(
        m, s, dataset.obs_times, dataset.obs_values, dataset.time_grid,
        latent_process=dataset.latent_path,
        test_observations=(dataset.test_times, dataset.test_values),
        output_path=os.path.join(output_dir, "posterior.png"),
        model_legend=legend,
    )


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
    metrics = _metrics(means, covs, dataset)
    result = {
        "model": model,
        "elbos": elbos,
        "posterior_means": means,
        "posterior_covs": covs,
        "learned_prior_sde": model.prior_sde,
        **metrics,
    }
    if config.output_dir is not None:
        _save_run(config.output_dir, result, dataset, "CVI-DP")
    return result


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
    metrics = _metrics(means, covs, dataset)
    result = {
        "model": model,
        "elbos": elbos,
        "posterior_means": means,
        "posterior_covs": covs,
        "learned_prior_sde": model.prior_sde,
        **metrics,
    }
    if config.output_dir is not None:
        _save_run(config.output_dir, result, dataset, "VDP")
    return result


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


def run_sgpr(config: ExperimentConfig, dataset: Optional[DPDataset] = None) -> Dict:
    """Sparse-GPR baseline (stock/sgpr_stock.py:33-60 semantics): an SVGP
    with ``config.num_inducing`` inducing time points and a Gaussian
    likelihood, Adam-trained (hyperparameters + variational SSM jointly)
    until ``|ΔELBO| < optim_tol`` — the jittable analogue of gpflow SGPR's
    collapsed bound on a Markov kernel."""
    import optax

    from ..kernels.matern import Matern32
    from ..likelihoods.gaussian import Gaussian as GaussianLik
    from ..models.svgp import SparseVariationalGaussianProcess

    dataset = dataset or make_dataset(config)
    dtype = dataset.obs_values.dtype
    t = dataset.obs_times
    z = jnp.linspace(t[0], t[-1], config.num_inducing, dtype=dtype)

    def make_model(params, dist_q=None):
        # positive hyperparameters live in log space (the reference trains
        # through gpflow's softplus bijectors; base.py ordered/positive)
        kern = Matern32(
            lengthscale=jnp.exp(params["log_l"]), variance=jnp.exp(params["log_v"])
        )
        model = SparseVariationalGaussianProcess.initialize(
            kernel=kern,
            likelihood=GaussianLik(variance=jnp.exp(params["log_noise"])),
            inducing_points=z,
        )
        if dist_q is not None:
            model = model.replace(dist_q=dist_q)
        return model

    params = {
        "log_l": jnp.asarray(0.0, dtype),
        "log_v": jnp.asarray(0.0, dtype),
        "log_noise": jnp.log(jnp.asarray(dataset.noise_stddev**2, dtype)),
    }
    dist_q = make_model(params).dist_q
    data = (t, dataset.obs_values)
    opt = optax.adam(0.05)
    state = opt.init((params, dist_q))

    @jax.jit
    def step(p, q, s):
        def loss_fn(p_q):
            pp, qq = p_q
            return make_model(pp, qq).loss(data)

        loss, g = jax.value_and_grad(loss_fn)((p, q))
        updates, s = opt.update(g, s)
        p, q = optax.apply_updates((p, q), updates)
        return p, q, s, -loss

    elbos = []
    optim_tol = 1e-2
    for _ in range(config.max_outer_iters * 10):
        params, dist_q, state, elbo = step(params, dist_q, state)
        elbos.append(float(elbo))
        if len(elbos) > 1 and abs(elbos[-1] - elbos[-2]) < optim_tol:
            break

    model = make_model(params, dist_q)
    f_mu, f_var = model.posterior.predict_f(dataset.test_times)
    return {
        "model": model,
        "elbos": elbos,
        "nlpd": float(nlpd(f_mu, f_var, dataset.test_values, dataset.noise_stddev**2)),
        "rmse": float(rmse(f_mu, dataset.test_values)),
    }
