"""Device-op profile of the d=14 spatio-temporal CVI site step (VERDICT r4 #3).

Runs the exact BENCH_SECONDARY d=14 configuration under jax.profiler.trace
and prints the top device ops by total duration.  Usage::

    python benchmarks/profile_d14.py [outdir]
"""
import glob
import gzip
import json
import pathlib
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from secondary import _setup  # noqa: E402


def build():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    from vi_diffusion_processes_tpu.kernels.matern import Matern32
    from vi_diffusion_processes_tpu.kernels.spatial import SpatialRBF
    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.spatio_temporal import SpatioTemporalSparseCVI

    n, mt = 20_000, 10_000
    rng = np.random.default_rng(0)
    x_space = rng.uniform(0, 1, size=(n, 1))
    t = np.sort(rng.uniform(0, 100.0, size=n))
    y = jnp.asarray((np.sin(2 * t) * np.cos(3 * x_space[:, 0]) + 0.1 * rng.normal(size=n))[:, None])
    inputs = jnp.asarray(np.concatenate([x_space, t[:, None]], axis=-1))
    model = SpatioTemporalSparseCVI.initialize(
        jnp.linspace(0.05, 0.95, 7)[:, None], jnp.linspace(0.0, 100.0, mt),
        SpatialRBF(variance=jnp.asarray(1.0), lengthscale=jnp.asarray(0.5)),
        Matern32(lengthscale=jnp.asarray(5.0), variance=jnp.asarray(1.0)),
        Gaussian(variance=jnp.asarray(0.05)), learning_rate=0.5,
    )
    return jax, model, (inputs, y)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/d14_profile"
    jax, model, data = build()

    run = jax.jit(lambda m: m.update_sites(data))
    m = run(model)
    jax.block_until_ready(m.nat1)
    with jax.profiler.trace(outdir):
        for _ in range(2):
            m = run(m)
        jax.block_until_ready(m.nat1)

    traces = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    assert traces, f"no trace written under {outdir}"
    with gzip.open(traces[-1], "rt") as f:
        tr = json.load(f)
    # device-track events: sum durations grouped by op name
    pid_names = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
    dur = defaultdict(float)
    total = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "vm." not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur[name] += e["dur"] / 1e3  # ms
        total += e["dur"] / 1e3
    print(f"total device op time (2 steps): {total:.1f} ms  [{traces[-1]}]")
    for name, ms in sorted(dur.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
