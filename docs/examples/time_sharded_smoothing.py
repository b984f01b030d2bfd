# %% [markdown]
# # Sharding the time axis across a device mesh
# No reference counterpart — the reference is single-process (SURVEY.md
# §2.4). On TPU pods the grid itself can outgrow one chip; here the O(N)
# filter/smoother scans are sharded over a `Mesh` axis with `shard_map`
# (`parallel/sharded.py`) and stay bit-comparable to the single-device path.

# %%
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from vi_diffusion_processes_tpu.kernels import Matern32
from vi_diffusion_processes_tpu.parallel import (
    filter_smoother_with_sites,
    site_log_normalizer,
    time_sharded_filter,
    time_sharded_filter_smoother,
)

devices = jax.devices()
mesh = Mesh(np.asarray(devices), ("t",))
print(f"mesh: {len(devices)} devices on axis 't'")

# a long grid that does NOT divide the device count — identity padding kicks in
n = 4001
t = jnp.linspace(0.0, 40.0, n)
kernel = Matern32(lengthscale=jnp.asarray(1.0), variance=jnp.asarray(1.0))
ssm = kernel.state_space_model(t)

rng = np.random.default_rng(2)
y = jnp.asarray(np.sin(0.7 * np.asarray(t)) + 0.3 * rng.normal(size=n))
h = jnp.zeros((n, kernel.state_dim)).at[:, 0].set(1.0)
noise = 0.09
nat1 = h * (y / noise)[:, None]
nat2 = (h[..., None] * h[..., None, :]) / noise

# %% run the distributed smoother (arrays are padded to the mesh internally;
# under jit XLA moves each chunk to its device once)
smoothed = jax.jit(
    lambda s, a, b: time_sharded_filter_smoother(s, a, b, mesh, "t")[1]
)(ssm, nat1, nat2)
print("smoothed means shape:", smoothed.means.shape)

# %% exactness: identical to the single-device associative scan
_, ref = filter_smoother_with_sites(ssm, nat1, nat2)
err = float(jnp.max(jnp.abs(smoothed.means - ref.means)))
print(f"max deviation vs single-device path: {err:.2e}")
assert err < 1e-8

# the evidence (log-normalizer) also agrees through the sharded filter
filt = time_sharded_filter(ssm, nat1, nat2, mesh, "t")
logz = float(site_log_normalizer(filt, nat1, nat2))
print("log-normalizer through the sharded filter:", round(logz, 6))
assert np.isfinite(logz)
