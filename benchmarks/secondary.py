"""Secondary benchmarks: BASELINE.md parity configs beyond the north star.

Each benchmark prints one JSON line.  Run on the default device::

    python benchmarks/secondary.py            # all
    python benchmarks/secondary.py gpr_100k   # one

Configs (BASELINE.json):
  1. ``gpr_100k``     — exact GPR log-marginal + hyperparameter gradient,
                        Matern32, N=100k (config #1 scaled to the TPU regime)
  4. ``cvi_poisson_100k`` — non-conjugate CVI (Poisson), 100k-point series:
                        site update + ELBO per step (config #4)
  5. ``batched_cvi_dp``   — 8 double-well trajectories vmapped on one chip,
                        full natgrad step (config #5)
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _setup():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = str(pathlib.Path(__file__).resolve().parents[1] / ".cache" / "jax_tpu")
    pathlib.Path(cache).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def _time(run, warmup_out, n=16, inner=1):
    import jax

    state = warmup_out
    t0 = time.perf_counter()
    done = 0
    while done < n:
        state = run(state)
        done += inner
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    return (time.perf_counter() - t0) / done


# ------------------------------------------------------------ C++ baselines
# d-generic sequential baselines (native/btd_kernels.cpp) — the honest CPU
# twin of the reference's banded_matrices-driven per-step work, measured at
# the SAME (n, d, n_obs) as each bench entry.  min-of-N like bench.py.
def _libbtd():
    import ctypes
    import subprocess

    here = pathlib.Path(__file__).resolve().parents[1] / "native"
    so = here / "libbtd.so"
    for attempt in range(2):
        try:
            lib = ctypes.CDLL(str(so))
            lib.baseline_cvi_dp_step_d
            return lib
        except (OSError, AttributeError):
            if attempt == 0:
                subprocess.run(["make", "-C", str(here)], check=True)
    raise OSError("libbtd.so unavailable")


def _gh_grid_np(d, h):
    z, w = np.polynomial.hermite.hermgauss(h)
    w = w / np.sqrt(np.pi)
    zs = np.stack(np.meshgrid(*([z] * d), indexing="ij"), -1).reshape(-1, d)
    zs = np.ascontiguousarray(zs * np.sqrt(2.0))
    ws = np.ascontiguousarray(
        np.prod(np.stack(np.meshgrid(*([w] * d), indexing="ij"), -1).reshape(-1, d), -1)
    )
    return zs, ws


def _min_of(fn, reps=3):
    best = float("inf")
    fn()  # warmup
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _baseline_seconds(metric):
    """Sequential C++ seconds/step for a bench metric, or None."""
    import ctypes

    c_dp = ctypes.POINTER(ctypes.c_double)
    try:
        lib = _libbtd()
    except OSError:
        return None
    i64, i32 = ctypes.c_int64, ctypes.c_int

    def gh_ptrs(d, h):
        zs, ws = _gh_grid_np(d, h)
        return (
            zs.ctypes.data_as(c_dp),
            ws.ctypes.data_as(c_dp),
            len(ws),
            (zs, ws),  # keep alive
        )

    if metric == "gpr_loglik_grad_100k":
        lib.baseline_gpr_grad_step_d.restype = ctypes.c_double
        lib.baseline_gpr_grad_step_d.argtypes = [i64, i32, i32]
        return _min_of(lambda: lib.baseline_gpr_grad_step_d(100_000, 2, 1))
    if metric == "gpr_d4_sum_loglik_grad_100k":
        lib.baseline_gpr_grad_step_d.restype = ctypes.c_double
        lib.baseline_gpr_grad_step_d.argtypes = [i64, i32, i32]
        return _min_of(lambda: lib.baseline_gpr_grad_step_d(100_000, 4, 1))
    if metric == "vanderpol_d2_cvi_dp_step_100k":
        lib.baseline_cvi_dp_step_d.restype = ctypes.c_double
        lib.baseline_cvi_dp_step_d.argtypes = [i64, i64, i32, i32, c_dp, c_dp, i32]
        zp, wp, nq, _keep = gh_ptrs(2, 20)  # 20² tensor grid, as the model uses
        return _min_of(
            lambda: lib.baseline_cvi_dp_step_d(100_000, 200, 2, 1, zp, wp, nq)
        )
    if metric == "spatio_temporal_cvi_d6_site_step_10k":
        lib.baseline_spatio_site_step_d.restype = ctypes.c_double
        lib.baseline_spatio_site_step_d.argtypes = [i64, i64, i32, i32]
        return _min_of(lambda: lib.baseline_spatio_site_step_d(10_000, 20_000, 6, 1))
    if metric == "spatio_temporal_cvi_d14_site_step_10k":
        lib.baseline_spatio_site_step_d.restype = ctypes.c_double
        lib.baseline_spatio_site_step_d.argtypes = [i64, i64, i32, i32]
        return _min_of(lambda: lib.baseline_spatio_site_step_d(10_000, 20_000, 14, 1))
    if metric == "cvi_poisson_site_step_100k":
        # site step profile: projection + naturals→SSM + Takahashi + VE,
        # d=2 (Matern32 state), sites at every grid point
        lib.baseline_spatio_site_step_d.restype = ctypes.c_double
        lib.baseline_spatio_site_step_d.argtypes = [i64, i64, i32, i32]
        return _min_of(lambda: lib.baseline_spatio_site_step_d(100_000, 100_000, 2, 1))
    if metric == "batched8_cvi_dp_step_10k":
        # 8 independent d=1 trajectories, 10k grid each, per step
        lib.baseline_cvi_dp_step_1d.restype = ctypes.c_double
        lib.baseline_cvi_dp_step_1d.argtypes = [i64, i64, i32, c_dp, c_dp, i32]
        zp, wp, nq, _keep = gh_ptrs(1, 20)
        return _min_of(
            lambda: [
                lib.baseline_cvi_dp_step_1d(10_000, 199, 1, zp, wp, nq)
                for _ in range(8)
            ]
        )
    if metric == "vdp_inference_step_100k":
        lib.baseline_vdp_step_1d.restype = ctypes.c_double
        lib.baseline_vdp_step_1d.argtypes = [i64, i64, i32, c_dp, c_dp, i32]
        zp, wp, nq, _keep = gh_ptrs(1, 20)
        return _min_of(lambda: lib.baseline_vdp_step_1d(100_000, 200, 1, zp, wp, nq))
    if metric == "cvi_dp_full_natgrad_step_1m_grid":
        lib.baseline_cvi_dp_step_1d.restype = ctypes.c_double
        lib.baseline_cvi_dp_step_1d.argtypes = [i64, i64, i32, c_dp, c_dp, i32]
        zp, wp, nq, _keep = gh_ptrs(1, 20)
        return _min_of(
            lambda: lib.baseline_cvi_dp_step_1d(1_000_000, 20_000, 1, zp, wp, nq),
            reps=2,
        )
    return None


def gpr_100k():
    jax = _setup()
    import jax.numpy as jnp

    from vi_diffusion_processes_tpu.kernels import Matern32
    from vi_diffusion_processes_tpu.models import GaussianProcessRegression

    n = 100_000
    rng = np.random.default_rng(0)
    t = jnp.linspace(0.0, 100.0, n, dtype=jnp.float32)
    y = jnp.asarray(
        (np.sin(0.3 * np.asarray(t)) + 0.3 * rng.normal(size=n))[:, None], jnp.float32
    )

    def loss(params):
        model = GaussianProcessRegression(
            kernel=Matern32(lengthscale=params["l"], variance=params["v"]),
            time_points=t, observations=y,
            chol_obs_covariance=params["r"][None, None],
        )
        return -model.log_likelihood()

    grad = jax.value_and_grad(loss)
    params = {"l": jnp.float32(1.0), "v": jnp.float32(1.0), "r": jnp.float32(0.3)}

    # single step per dispatch: a lax.scan-of-value_and_grad body makes the
    # remote TPU compiler pathologically slow (>25 min); dispatch overhead
    # (~1-2 ms) is the measurement floor instead
    @jax.jit
    def run(p):
        val, g = grad(p)
        return jax.tree_util.tree_map(lambda x, gg: x - 1e-3 * gg, p, g)

    p = run(params)
    jax.block_until_ready(p["l"])
    dt = _time(run, p)
    return {"metric": "gpr_loglik_grad_100k", "value": round(1 / dt, 2), "unit": "steps/sec"}


def cvi_poisson_100k():
    jax = _setup()
    import jax.numpy as jnp

    from vi_diffusion_processes_tpu.kernels import Matern32
    from vi_diffusion_processes_tpu.likelihoods import Poisson
    from vi_diffusion_processes_tpu.models import CVIGaussianProcess

    n = 100_000
    rng = np.random.default_rng(0)
    t = jnp.linspace(0.0, 100.0, n, dtype=jnp.float32)
    rate = np.exp(0.8 * np.sin(0.3 * np.asarray(t)))
    y = jnp.asarray(rng.poisson(rate)[:, None].astype(np.float32))
    model = CVIGaussianProcess.initialize(
        Matern32(lengthscale=jnp.asarray(1.0, jnp.float32), variance=jnp.asarray(1.0, jnp.float32)),
        Poisson(), t, y, learning_rate=0.3,
    )

    # NOTE: a packed rank-1 fast path exists (models/cvi_packed.py,
    # equivalence-tested on CPU in tests/unit/test_cvi_packed.py); its TPU
    # timing harness is not yet validated, so this entry stays on the
    # generic model step for honest artifact numbers.
    inner = 16

    @jax.jit
    def run(m):
        def body(mm, _):
            return mm.update_sites(), None

        m2, _ = jax.lax.scan(body, m, None, length=inner)
        return m2

    m = run(model)
    jax.block_until_ready(m.sites.nat1)
    dt = _time(run, m, n=32, inner=inner)
    return {"metric": "cvi_poisson_site_step_100k", "value": round(1 / dt, 2), "unit": "steps/sec"}


def batched_cvi_dp():
    """8 trajectories through the [B, T]-plane packed loop
    (models/cvi_dp_packed_batched.py): one flat flagship-path dispatch of
    length B·T per step instead of a vmap of the generic [T,1,1] step."""
    jax = _setup()
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_model
    from vi_diffusion_processes_tpu.models.cvi_dp_packed_batched import (
        pack_state_batched,
        packed_natgrad_step_batched,
    )

    batch = 8
    models = [build_model(10_000, jnp.float32) for _ in range(batch)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *models)
    rep = models[0]
    state = jax.jit(pack_state_batched)(stacked)

    # sustained throughput: 8 steps per dispatch (same methodology as the
    # flagship bench — single-step numbers measure tunnel dispatch latency)
    inner = 8

    @jax.jit
    def run(st):
        def body(s, _):
            s2, elbos = packed_natgrad_step_batched(rep, s, 0.3)
            return s2, elbos

        st2, _ = jax.lax.scan(body, st, None, length=inner)
        return st2

    st = run(state)
    jax.block_until_ready(st.fx_mu)
    dt = _time(run, st, n=64, inner=inner)
    return {
        "metric": "batched8_cvi_dp_step_10k",
        "value": round(1 / dt, 2),
        "unit": "steps/sec (8 trajectories each)",
    }


def vdp_100k():
    jax = _setup()
    import jax.numpy as jnp

    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.vdp import VariationalMarkovGP
    from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE

    n = 100_000
    dtype = jnp.float32
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]], dtype))
    grid = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    rng = np.random.default_rng(0)
    obs_idx = np.arange(50, n - 1, 500)
    obs_y = jnp.asarray(
        np.sign(np.sin(0.6 * np.asarray(grid[obs_idx])))[:, None]
        + 0.2 * rng.normal(size=(len(obs_idx), 1)),
        dtype,
    )
    vdp = VariationalMarkovGP.initialize(
        (grid[obs_idx], obs_y), sde, grid, Gaussian(variance=jnp.asarray(0.04, dtype))
    )

    # packed (rank-1 buffer) hot loop — what VDPTrainer runs for d=1
    from vi_diffusion_processes_tpu.models.vdp_packed import (
        pack_vdp,
        packed_inference_step,
    )

    state = jax.jit(pack_vdp)(vdp)

    # sustained throughput: 8 steps per dispatch inside one jitted lax.scan
    # (same methodology as bench.py — a single step is ~dispatch-latency
    # through the axon tunnel, not device time)
    inner = 8

    @jax.jit
    def run(st):
        def body(s, _):
            return packed_inference_step(vdp, s, 1e-6), None

        st2, _ = jax.lax.scan(body, st, None, length=inner)
        return st2

    st = run(state)
    jax.block_until_ready(st.a)
    dt = _time(run, st, n=64, inner=inner)
    return {"metric": "vdp_inference_step_100k", "value": round(1 / dt, 2), "unit": "steps/sec"}


def vanderpol_cvi_dp_100k():
    jax = _setup()
    import jax.numpy as jnp

    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
    from vi_diffusion_processes_tpu.models.cvi_dp_packed_ch import (
        pack_state_ch,
        packed_natgrad_step_ch,
    )
    from vi_diffusion_processes_tpu.sde.utils import Gaussian as GaussianState
    from vi_diffusion_processes_tpu.sde.zoo import VanderPolOscillatorSDE

    n = 100_000
    dtype = jnp.float32
    sde = VanderPolOscillatorSDE(
        a=jnp.asarray(1.0, dtype), tau=jnp.asarray(1.0, dtype),
        q_mat=0.5 * jnp.eye(2, dtype=dtype),
    )
    grid = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    rng = np.random.default_rng(0)
    obs_idx = np.arange(50, n - 1, 500)
    obs_y = jnp.asarray(
        np.stack(
            [np.sin(0.6 * np.asarray(grid[obs_idx])),
             np.cos(0.6 * np.asarray(grid[obs_idx]))], -1)
        + 0.2 * rng.normal(size=(len(obs_idx), 2)),
        dtype,
    )
    model = CVISitesSDE.initialize(
        prior_ssm=None, time_grid=grid, input_data=(grid[obs_idx], obs_y),
        likelihood=Gaussian(variance=jnp.asarray(0.04, dtype)),
        prior_initial_state=GaussianState(
            mu=jnp.zeros((2,), dtype), cov=0.5 * jnp.eye(2, dtype=dtype)
        ),
        prior_sde=sde, stabilize_ssm=True, clip_state_transitions=(-2.0, 2.0),
    )
    model = jax.jit(lambda m: m.set_linearized_prior())(model)
    state = jax.jit(pack_state_ch)(model)

    @jax.jit
    def run(st):
        st2, _ = packed_natgrad_step_ch(model, st, 0.2)
        return st2

    st = run(state)
    jax.block_until_ready(st.obs_mask)
    dt = _time(run, st)
    return {
        "metric": "vanderpol_d2_cvi_dp_step_100k",
        "value": round(1 / dt, 2),
        "unit": "steps/sec",
    }


def gpr_d4_sum_100k():
    """d=4 GPR: Matern52+Matern12 kernel sum, N=100k — exercises the
    PD-routed channelized filter/smoother past d=3 (sde_kernel.py:660
    kernel-sum workloads)."""
    jax = _setup()
    import jax.numpy as jnp

    from vi_diffusion_processes_tpu.kernels import Matern12, Matern52
    from vi_diffusion_processes_tpu.models import GaussianProcessRegression

    n = 100_000
    rng = np.random.default_rng(0)
    t = jnp.linspace(0.0, 100.0, n, dtype=jnp.float32)
    y = jnp.asarray(
        (np.sin(0.3 * np.asarray(t)) + 0.3 * rng.normal(size=n))[:, None], jnp.float32
    )

    def loss(params):
        kern = Matern52(lengthscale=params["l5"], variance=params["v5"]) + Matern12(
            lengthscale=params["l1"], variance=params["v1"]
        )
        model = GaussianProcessRegression(
            kernel=kern, time_points=t, observations=y,
            chol_obs_covariance=params["r"][None, None],
        )
        return -model.log_likelihood()

    grad = jax.value_and_grad(loss)
    params = {"l5": jnp.float32(1.0), "v5": jnp.float32(1.0),
              "l1": jnp.float32(2.0), "v1": jnp.float32(0.5), "r": jnp.float32(0.3)}

    @jax.jit
    def run(p):
        val, g = grad(p)
        return jax.tree_util.tree_map(lambda x, gg: x - 1e-3 * gg, p, g)

    p = run(params)
    jax.block_until_ready(p["l5"])
    dt = _time(run, p)
    return {"metric": "gpr_d4_sum_loglik_grad_100k", "value": round(1 / dt, 2),
            "unit": "steps/sec"}


def spatio_temporal_cvi_10k():
    """Spatio-temporal CVI: M=3 spatial inducing points × Matern32 time
    (state_dim = 6), Mt=10k inducing time points, 20k observations —
    exercises the d=6 channelized UDU' in naturals_to_ssm
    (spatio_temporal_variational.py:360-553 workload)."""
    jax = _setup()
    import jax.numpy as jnp

    from vi_diffusion_processes_tpu.kernels.matern import Matern32
    from vi_diffusion_processes_tpu.kernels.spatial import SpatialRBF
    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.spatio_temporal import (
        SpatioTemporalSparseCVI,
    )

    n, mt = 20_000, 10_000
    rng = np.random.default_rng(0)
    x_space = rng.uniform(0, 1, size=(n, 1))
    t = np.sort(rng.uniform(0, 100.0, size=n))
    y = jnp.asarray(
        (np.sin(2 * t) * np.cos(3 * x_space[:, 0]) + 0.1 * rng.normal(size=n))[:, None]
    )
    inputs = jnp.asarray(np.concatenate([x_space, t[:, None]], axis=-1))
    z_space = jnp.linspace(0.05, 0.95, 3)[:, None]
    z_time = jnp.linspace(0.0, 100.0, mt)
    model = SpatioTemporalSparseCVI.initialize(
        z_space, z_time,
        SpatialRBF(variance=jnp.asarray(1.0), lengthscale=jnp.asarray(0.5)),
        Matern32(lengthscale=jnp.asarray(5.0), variance=jnp.asarray(1.0)),
        Gaussian(variance=jnp.asarray(0.05)), learning_rate=0.5,
    )

    # plane-layout packed loop (models/spatio_packed.py): loop invariants
    # hoisted at pack time (on the CPU backend — seconds, where the same
    # graph sat minutes in the remote TPU compiler), per-step refresh on
    # the CVI-DP channel engine.  First TPU compile of the step is ~18 min
    # (cached thereafter); measured 0.31 ms/step on a v5e chip vs 50 ms
    # for the generic [N,2d,2d] path.
    from vi_diffusion_processes_tpu.models.spatio_packed import (
        pack_spatio,
        packed_spatio_site_step,
    )

    with jax.default_device(jax.devices("cpu")[0]):
        cache, state = jax.jit(pack_spatio)(model, (inputs, y))
    tpu = jax.devices()[0]
    cache = jax.device_put(cache, tpu)
    state = jax.device_put(state, tpu)

    @jax.jit
    def run(c, st):
        return packed_spatio_site_step(model, c, st, jnp.float32)

    st = run(cache, state)
    jax.block_until_ready(st.nat1)
    dt = _time(lambda s: run(cache, s), st, n=64)
    return {"metric": "spatio_temporal_cvi_d6_site_step_10k",
            "value": round(1 / dt, 2), "unit": "steps/sec"}


def spatio_temporal_cvi_d14_10k():
    """Reference-notebook scale spatio-temporal CVI: M=7 spatial inducing
    points × Matern32 time → state_dim 14 (docs/notebooks/spatio_temporal.py:19-28),
    Mt=10k inducing time points, 20k observations — exercises the packed
    array-channel filter/UDU' past d=8."""
    jax = _setup()
    import jax.numpy as jnp

    from vi_diffusion_processes_tpu.kernels.matern import Matern32
    from vi_diffusion_processes_tpu.kernels.spatial import SpatialRBF
    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.spatio_temporal import (
        SpatioTemporalSparseCVI,
    )

    n, mt = 20_000, 10_000
    rng = np.random.default_rng(0)
    x_space = rng.uniform(0, 1, size=(n, 1))
    t = np.sort(rng.uniform(0, 100.0, size=n))
    y = jnp.asarray(
        (np.sin(2 * t) * np.cos(3 * x_space[:, 0]) + 0.1 * rng.normal(size=n))[:, None]
    )
    inputs = jnp.asarray(np.concatenate([x_space, t[:, None]], axis=-1))
    z_space = jnp.linspace(0.05, 0.95, 7)[:, None]
    z_time = jnp.linspace(0.0, 100.0, mt)
    model = SpatioTemporalSparseCVI.initialize(
        z_space, z_time,
        SpatialRBF(variance=jnp.asarray(1.0), lengthscale=jnp.asarray(0.5)),
        Matern32(lengthscale=jnp.asarray(5.0), variance=jnp.asarray(1.0)),
        Gaussian(variance=jnp.asarray(0.05)), learning_rate=0.5,
    )

    # packed plane-layout loop — see the d6 entry for the compile caveat
    from vi_diffusion_processes_tpu.models.spatio_packed import (
        pack_spatio,
        packed_spatio_site_step,
    )

    with jax.default_device(jax.devices("cpu")[0]):
        cache, state = jax.jit(pack_spatio)(model, (inputs, y))
    tpu = jax.devices()[0]
    cache = jax.device_put(cache, tpu)
    state = jax.device_put(state, tpu)

    @jax.jit
    def run(c, st):
        return packed_spatio_site_step(model, c, st, jnp.float32)

    st = run(cache, state)
    jax.block_until_ready(st.nat1)
    dt = _time(lambda s: run(cache, s), st, n=16)
    return {"metric": "spatio_temporal_cvi_d14_site_step_10k",
            "value": round(1 / dt, 2), "unit": "steps/sec"}


def cvi_dp_1m():
    """The 1M-point long-context configuration (README's scaling claim) as
    a first-class bench: the same full natgrad step as ``bench.py``'s
    north-star (data sites + Girsanov sites + ELBO via the packed d=1
    loop), at T=1,000,000."""
    _setup()
    import bench as flagship

    dt, elbo = flagship.bench_tpu(1_000_000, n_steps=128, inner=8)
    assert np.isfinite(elbo), f"1M-grid bench ELBO not finite: {elbo}"
    return {"metric": "cvi_dp_full_natgrad_step_1m_grid",
            "value": round(1 / dt, 2), "unit": "steps/sec"}


ALL = {"gpr_100k": gpr_100k, "cvi_poisson_100k": cvi_poisson_100k,
       "batched_cvi_dp": batched_cvi_dp, "vdp_100k": vdp_100k,
       "vanderpol_cvi_dp_100k": vanderpol_cvi_dp_100k,
       "gpr_d4_sum_100k": gpr_d4_sum_100k,
       "spatio_temporal_cvi_10k": spatio_temporal_cvi_10k,
       "spatio_temporal_cvi_d14_10k": spatio_temporal_cvi_d14_10k,
       "cvi_dp_1m": cvi_dp_1m}


if __name__ == "__main__":
    argv = sys.argv[1:]
    write_artifact = "--write" in argv
    names = [a for a in argv if a != "--write"] or list(ALL)
    results = []
    for name in names:
        # the remote TPU compile tunnel occasionally drops long-running
        # connections; retry each entry once and record failures instead of
        # aborting the whole sweep (the artifact notes what's missing)
        res = None
        for attempt in range(2):
            try:
                res = ALL[name]()
                break
            except Exception as e:  # noqa: BLE001
                sys.stderr.write(f"{name} attempt {attempt + 1} failed: {e}\n")
                res = {"metric": name, "error": str(e)[:500]}
        if res is not None and "value" in res:
            try:
                base_s = _baseline_seconds(res["metric"])
            except Exception as e:  # noqa: BLE001
                sys.stderr.write(f"baseline for {name} failed: {e}\n")
                base_s = None
            if base_s is not None:
                res["baseline_ms"] = round(base_s * 1e3, 2)
                res["vs_baseline"] = round(base_s * res["value"], 2)
                res["baseline"] = "cpp-sequential"
        results.append(res)
        print(json.dumps(res), flush=True)
    if write_artifact:
        # machine-readable artifact so README numbers are regression-checkable
        out = pathlib.Path(__file__).resolve().parents[1] / "BENCH_SECONDARY.json"
        import platform as _platform

        import jax as _jax

        payload = {
            "device": str(_jax.devices()[0]),
            "host": _platform.machine(),
            "results": results,
        }
        out.write_text(json.dumps(payload, indent=2) + "\n")
        print(f"wrote {out}", flush=True)
