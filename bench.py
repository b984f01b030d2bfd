"""Benchmark: CVI-DP natural-gradient site step on a 100k-step double-well grid.

North-star metric (BASELINE.json): full natgrad ELBO steps/sec for CVI-DP
site-based inference on the double-well diffusion with a 100k-point time
grid, on one TPU chip.

The reference (TF 2.2 CPU + banded_matrices C++) publishes no numbers and is
not installable here (installing packages is disallowed and TF 2.2.1/py3.7
pins are years out of support — BASELINE.md "Action required" documents the
failure).  ``vs_baseline`` therefore compares against the *strongest*
stand-in we can measure: a complete sequential C++ re-implementation of one
CVI-DP natgrad step (data-site update, Girsanov/linearization Gauss–Hermite
sweep, 3× UDU' naturals→SSM recursions + bidiagonal solves, forward
marginals, KL + Girsanov-residual ELBO sweeps — the reference's per-step
profile, SURVEY.md §3.3) compiled -O3 -march=native
(native/btd_kernels.cpp::baseline_cvi_dp_step_1d) and **measured at the
full 100k grid with no extrapolation**.  This is generous to the reference:
the real TF 2.2 eager driver adds per-op dispatch and unfused banded-tensor
traffic on top.  A NumPy sequential fallback (also full-grid) is used only
if the shared library cannot be built.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def build_model(grid_size: int, dtype):
    import jax
    import jax.numpy as jnp

    # x64 must be available: the CVI natural-parameter algebra runs in
    # float64 internally even when the model is float32 (see
    # models/cvi_dp.py full_sites docstring)
    jax.config.update("jax_enable_x64", True)

    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
    from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE

    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]], dtype))
    grid = jnp.linspace(0.0, 10.0, grid_size, dtype=dtype)
    rng = np.random.default_rng(0)
    obs_idx = np.arange(50, grid_size - 1, max(50, grid_size // 200))
    obs_t = grid[obs_idx]
    obs_y = jnp.asarray(
        np.sign(np.sin(0.6 * np.asarray(obs_t)))[:, None]
        + 0.2 * rng.normal(size=(len(obs_idx), 1)),
        dtype,
    )
    from vi_diffusion_processes_tpu.sde.utils import Gaussian as GaussianState

    # construct under jit: eager op-by-op construction would round-trip
    # every primitive through the remote compiler
    model = CVISitesSDE.initialize(
        prior_ssm=None,
        time_grid=grid,
        input_data=(obs_t, obs_y),
        likelihood=Gaussian(variance=jnp.asarray(0.04, dtype)),
        prior_initial_state=GaussianState(
            mu=jnp.zeros((1,), dtype), cov=jnp.asarray([[0.8]], dtype)
        ),
        prior_sde=sde,
        stabilize_ssm=True,
        clip_state_transitions=(-1.0, 1.0),
    )
    return jax.jit(lambda m: m.set_linearized_prior())(model)


def bench_tpu(grid_size: int = 100_000, n_steps: int = 512, inner: int = 32) -> float:
    """Seconds per full CVI-DP natgrad step (data sites + Girsanov sites +
    ELBO each step) on the default JAX device.

    ``inner`` steps run per dispatch inside one jitted ``lax.scan`` — the
    realistic trainer inner loop (per-dispatch host overhead through the
    device tunnel otherwise dominates at ~2.5 ms/step of compute).
    """
    import jax
    import jax.numpy as jnp

    import os

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax_tpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vi_diffusion_processes_tpu.models.cvi_dp_packed import (
        pack_state,
        packed_natgrad_step,
    )

    dtype = jnp.float32
    model = build_model(grid_size, dtype)
    # d=1 structure-of-scalars hot loop (models/cvi_dp_packed.py): same
    # update_data_sites → update_girsanov_sites → classic_elbo iteration,
    # carried on rank-1 buffers (TPU tile padding makes the generic
    # [T,1,1] layout memory-bound)
    state = jax.jit(pack_state)(model)

    @jax.jit
    def run_inner(st, lr):
        def body(s, _):
            s2, elbo = packed_natgrad_step(model, s, lr)
            return s2, elbo

        st, elbos = jax.lax.scan(body, st, None, length=inner)
        return st, elbos[-1]

    # compile + warmup
    state, elbo = run_inner(state, 0.3)
    jax.block_until_ready(elbo)

    # best of 3 passes: each dispatch rides the axon host↔TPU tunnel, whose
    # latency jitters across seconds-long windows — the fastest full pass is
    # the sustained-throughput number (device time per step is stable)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        done = 0
        while done < n_steps:
            state, elbo = run_inner(state, 0.3)
            done += inner
        jax.block_until_ready(elbo)
        best = min(best, (time.perf_counter() - t0) / done)
    return best, float(elbo)


def bench_cpp_baseline(grid_size: int = 100_000, n_reps: int = 5) -> float:
    """Seconds per complete sequential C++ CVI-DP step at the full grid
    size (native/btd_kernels.cpp::baseline_cvi_dp_step_1d).  Builds the
    shared library on demand; raises if the toolchain is unavailable."""
    import ctypes
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    so = os.path.join(here, "native", "libbtd.so")
    lib = None
    for attempt in range(2):
        try:
            lib = ctypes.CDLL(so)
            lib.baseline_cvi_dp_step_1d
            break
        except (OSError, AttributeError):
            lib = None
            if attempt == 0:  # stale or missing .so: rebuild once
                subprocess.run(["make", "-C", os.path.join(here, "native")], check=True)
    if lib is None:
        raise OSError("libbtd.so unavailable")
    lib.baseline_cvi_dp_step_1d.restype = ctypes.c_double
    lib.baseline_cvi_dp_step_1d.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    z, w = np.polynomial.hermite.hermgauss(20)
    w = np.ascontiguousarray(w / np.sqrt(np.pi))
    z = np.ascontiguousarray(z)
    zp = z.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    wp = w.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    n_obs = max(1, grid_size // 50)  # same density as bench_tpu's grid
    lib.baseline_cvi_dp_step_1d(grid_size, n_obs, 1, zp, wp, 20)  # warmup
    # min over reps: the single-thread loop is sensitive to transient box
    # load, and the least-contended rep is the honest (fastest) baseline
    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        lib.baseline_cvi_dp_step_1d(grid_size, n_obs, 1, zp, wp, 20)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_numpy_baseline(grid_size: int = 100_000, n_reps: int = 2) -> float:
    """Fallback: sequential NumPy re-implementation of one step's dominant
    work, measured at the full grid (no extrapolation):

    * 3× UDU' backward recursion over the grid (the reference runs
      ``naturals_to_ssm_params`` 2-3× per step, each a sequential banded
      factorization — SURVEY.md §3.3),
    * 3× backward + forward bidiagonal mean solves,
    * one 20-point Gauss–Hermite drift-difference sweep,
    * one forward marginal recursion.
    """
    rng = np.random.default_rng(0)
    kd = rng.random(grid_size) + 2.0
    ks = 0.3 * rng.random(grid_size - 1)
    theta = rng.random(grid_size)
    z, w = np.polynomial.hermite.hermgauss(20)

    def one_step():
        for _ in range(3):  # naturals_to_ssm_params × 3
            d = np.empty(grid_size)
            d[-1] = kd[-1]
            for k in range(grid_size - 2, -1, -1):  # UDU'
                d[k] = kd[k] - ks[k] ** 2 / d[k + 1]
            zz = np.empty(grid_size)
            zz[-1] = theta[-1]
            for k in range(grid_size - 2, -1, -1):  # backward solve
                zz[k] = theta[k] + ks[k] / d[k + 1] * zz[k + 1]
            mu = np.empty(grid_size)
            mu[0] = zz[0] / d[0]
            for k in range(1, grid_size):  # forward solve
                mu[k] = zz[k] / d[k] + ks[k - 1] / d[k] * mu[k - 1]
        # quadrature sweep (vectorized — generous to the baseline)
        m = mu[:-1]
        s = 1.0 / d[:-1]
        x = m[:, None] + np.sqrt(2.0 * s)[:, None] * z
        drift = 4.0 * x * (1.0 - x**2)
        lin = m[:, None] * 0.9 + 0.1
        np.sum(((lin - drift) ** 2 * w), axis=-1)
        # forward marginal recursion
        mm = np.empty(grid_size)
        mm[0] = 0.0
        for k in range(1, grid_size):
            mm[k] = 0.99 * mm[k - 1] + 0.01
        return mu

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_reps):
        one_step()
    return (time.perf_counter() - t0) / n_reps


def _pinned_baseline(metric: str):
    """Pinned sequential-C++ baseline seconds from BASELINE.json, or None.

    The per-run re-measured baseline drifts ±10% with box load, which made
    the headline vs_baseline ratio wobble between rounds; the pinned value
    (min-of-N on an idle box, recorded with its context) keeps the ratio
    comparable across runs.  A fresh measurement is still taken and printed
    as ``baseline_drift`` so a stale pin is visible.
    """
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
    try:
        with open(path) as fh:
            pinned = json.load(fh).get("pinned_baselines", {})
        entry = pinned.get(metric)
        return float(entry["seconds_per_step"]) if entry else None
    except Exception:
        return None


def main():
    grid_size = 100_000
    metric = "cvi_dp_full_natgrad_step_100k_grid"
    step_time, elbo = bench_tpu(grid_size)
    assert np.isfinite(elbo), f"benchmark ELBO is not finite: {elbo}"
    try:
        measured = bench_cpp_baseline(grid_size)
        baseline_kind = "cpp"
    except Exception:
        # NumPy stand-in is ~an order of magnitude slower than the C++
        # baseline; record which one ran so vs_baseline is interpretable.
        measured = bench_numpy_baseline(grid_size)
        baseline_kind = "numpy"
    pinned = _pinned_baseline(metric) if baseline_kind == "cpp" else None
    baseline = pinned if pinned is not None else measured
    result = {
        "metric": metric,
        "value": round(1.0 / step_time, 3),
        "unit": "steps/sec",
        "vs_baseline": round(baseline / step_time, 2),
        "baseline": baseline_kind + ("-pinned" if pinned is not None else ""),
        "baseline_ms": round(baseline * 1e3, 2),
    }
    if pinned is not None:
        result["baseline_drift"] = round(measured / pinned, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
