"""End-to-end experiment harness test (layer 8)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.exp.runners import ExperimentConfig, make_dataset, run_cvi_dp, run_vdp


def small_config(**kw):
    base = dict(
        prior_sde="dw",
        q=0.8,
        t1=2.0,
        num_grid=101,
        num_observations=20,
        noise_stddev=0.2,
        max_inner_iters=8,
        max_outer_iters=3,
    )
    base.update(kw)
    return ExperimentConfig(**base)


def test_dataset_generation():
    ds = make_dataset(small_config())
    assert ds.latent_path.shape == (101, 1)
    assert len(ds.obs_times) == 16 and len(ds.test_times) == 4
    assert np.all(np.diff(np.asarray(ds.obs_times)) > 0)


def test_run_cvi_dp_end_to_end():
    config = small_config()
    out = run_cvi_dp(config)
    assert np.isfinite(out["nlpd"]) and np.isfinite(out["rmse"])
    assert out["elbos"][-1] >= out["elbos"][0] - 1e-6
    # posterior should beat the trivial zero predictor
    ds = make_dataset(config)
    baseline_rmse = float(jnp.sqrt(jnp.mean(ds.test_values**2)))
    assert out["rmse"] < baseline_rmse


def test_run_vdp_end_to_end():
    out = run_vdp(small_config(vdp_lr=0.02))
    assert np.isfinite(out["nlpd"]) and np.isfinite(out["rmse"])


def test_run_cvi_dp_learn_prior():
    config = small_config(learn_prior_sde=True, max_outer_iters=2, max_inner_iters=5)
    out = run_cvi_dp(config)
    # the drift parameters moved
    assert float(out["learned_prior_sde"].scale) != 4.0 or float(out["learned_prior_sde"].c) != 1.0


def test_run_gpr_baseline():
    from vi_diffusion_processes_tpu.exp.runners import run_gpr

    config = small_config(prior_sde="ou", prior_sde_kwargs={"decay": 1.0})
    out = run_gpr(config)
    assert out["losses"][-1] < out["losses"][0]
    assert np.isfinite(out["nlpd"]) and np.isfinite(out["rmse"])


def test_run_sgpr_baseline():
    """SGPR runner (stock/sgpr_stock.py semantics): ELBO ascends, metrics
    finite, and the sparse posterior beats the zero predictor."""
    from vi_diffusion_processes_tpu.exp.runners import run_sgpr

    config = small_config(prior_sde="ou", prior_sde_kwargs={"decay": 1.0},
                          num_inducing=15)
    out = run_sgpr(config)
    assert out["elbos"][-1] > out["elbos"][0]
    assert np.isfinite(out["nlpd"]) and np.isfinite(out["rmse"])
    ds = make_dataset(config)
    baseline_rmse = float(jnp.sqrt(jnp.mean(ds.test_values**2)))
    assert out["rmse"] < baseline_rmse


def test_dataset_npz_roundtrip(tmp_path):
    """save_dataset_npz ↔ load_exp_data round-trip with the reference key
    set (generate_data.py:128-141 / exp_dp_utils.py:108-125)."""
    from vi_diffusion_processes_tpu.exp.data import load_exp_data, save_dataset_npz

    ds = make_dataset(small_config())
    path = tmp_path / "data.npz"
    save_dataset_npz(path, ds, sde_name="dw", q=0.8)
    raw = np.load(path, allow_pickle=True)
    for key in ("sde", "decay", "Q", "x0", "sigma", "latent_process",
                "observations", "observation_grid", "time_grid",
                "test_observations", "test_grid"):
        assert key in raw, key
    ds2 = load_exp_data(path)
    np.testing.assert_allclose(ds2.latent_path, ds.latent_path)
    np.testing.assert_allclose(ds2.obs_times, ds.obs_times)
    np.testing.assert_allclose(ds2.test_values, ds.test_values)
    assert ds2.noise_stddev == ds.noise_stddev


def test_generate_data_cli(tmp_path):
    """`python -m ...exp generate_data` writes the npz artifact."""
    from vi_diffusion_processes_tpu.exp.cli import main

    out = tmp_path / "ds.npz"
    rc = main(["generate_data", "prior_sde=ou", "num_grid=51",
               "num_observations=10", "--out", str(out)])
    assert rc == 0 and out.exists()
    raw = np.load(out, allow_pickle=True)
    assert raw["latent_process"].shape == (51, 1)


def test_run_artifacts_and_plots(tmp_path):
    """output_dir runs save posteriors/statistics/model npz + plots
    (cvi_dp.py:140-155, exp_dp_utils plotting)."""
    out_dir = tmp_path / "run"
    config = small_config(output_dir=str(out_dir), max_outer_iters=2,
                          max_inner_iters=4)
    run_cvi_dp(config)
    for name in ("posteriors.npz", "training_statistics.npz", "cvi_model.npz",
                 "objective.png", "posterior.png"):
        assert (out_dir / name).exists(), name
    stats = np.load(out_dir / "training_statistics.npz")
    assert np.isfinite(stats["elbo"]).all()


def test_modify_time_grid_and_k_folds():
    from vi_diffusion_processes_tpu.exp.data import get_k_folds, modify_time_grid

    grid = jnp.linspace(0.0, 2.0, 11)  # dt = 0.2
    fine = modify_time_grid(grid, 0.05)
    assert float(fine[0]) == 0.0 and abs(float(fine[-1]) - 2.0) < 0.051
    np.testing.assert_allclose(np.diff(np.asarray(fine)), 0.05, atol=1e-12)
    # old observation times land exactly on the refined grid
    assert np.isin(np.round(np.asarray(grid), 2), np.asarray(fine)).all()

    t = jnp.asarray(np.sort(np.random.default_rng(0).uniform(0, 5, 20)))
    y = jnp.asarray(np.arange(20.0)[:, None])
    train, test = get_k_folds(t, y, k_folds=4, seed=1)
    assert len(train) == 4 and len(test) == 4
    for (tt, ty), (st, sy) in zip(train, test):
        assert tt.shape[0] + st.shape[0] == 20
        assert (np.diff(np.asarray(tt)) >= 0).all()  # sorted within fold
        # disjoint cover of the data
        assert len(np.union1d(np.asarray(ty[:, 0]), np.asarray(sy[:, 0]))) == 20


def test_config_from_yaml_with_overrides(tmp_path):
    from vi_diffusion_processes_tpu.exp.runners import ExperimentConfig

    p = tmp_path / "exp.yaml"
    p.write_text(
        "prior_sde: ou\n"
        "prior_sde_kwargs: {decay: 1.5}\n"
        "num_grid: 501\n"
        "clip_state_transitions: [-2.0, 2.0]\n"
    )
    cfg = ExperimentConfig.from_yaml(
        p, overrides=["sites_lr=0.25", "prior_sde_kwargs.decay=3.0", "learn_prior_sde=true"]
    )
    assert cfg.prior_sde == "ou" and cfg.num_grid == 501
    assert cfg.sites_lr == 0.25 and cfg.learn_prior_sde is True
    assert cfg.prior_sde_kwargs["decay"] == 3.0
    assert cfg.clip_state_transitions == (-2.0, 2.0)

    with pytest.raises(ValueError, match="unknown config key"):
        ExperimentConfig.from_yaml(p, overrides=["not_a_key=1"])
    p.write_text("bogus_field: 3\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        ExperimentConfig.from_yaml(p)


def test_metrics_logger_jsonl(tmp_path):
    from vi_diffusion_processes_tpu.exp.logging import MetricsLogger

    log = MetricsLogger(tmp_path / "run" / "metrics.jsonl")
    for i in range(3):
        log.log(i, elbo=-10.0 + i, rmse=0.5 / (i + 1))
    records = log.read()
    assert [r["step"] for r in records] == [0, 1, 2]
    assert records[2]["elbo"] == -8.0
    assert all("wall_time" in r for r in records)
    log.close()
