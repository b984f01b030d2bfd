"""Multi-device sharded training on the virtual 8-device CPU mesh
(BASELINE config #5: batched multi-trajectory learning with DP/SP sharding).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def test_batched_vgp_natgrad_dp_sharded(rng):
    """Batched multi-trajectory VGP ELBO step with the batch axis sharded
    over 'dp' — XLA inserts the collectives."""
    from vi_diffusion_processes_tpu.kernels.matern import Matern32
    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.variational import VariationalGaussianProcess
    from vi_diffusion_processes_tpu.optim.natgrad import natgrad_step

    batch = 8
    n = 16
    t = jnp.asarray(np.tile(np.linspace(0, 3, n), (batch, 1)))
    y = jnp.asarray(np.sin(2 * np.asarray(t))[..., None] + 0.1 * rng.normal(size=(batch, n, 1)))
    kernel = Matern32(lengthscale=jnp.asarray(0.8), variance=jnp.asarray(1.0))
    vgp = VariationalGaussianProcess.initialize(kernel, Gaussian(variance=jnp.asarray(0.05)), t, y)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))

    def shard(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == batch:
            return jax.device_put(leaf, NamedSharding(mesh, P("dp")))
        return leaf

    q = jax.tree_util.tree_map(shard, vgp.dist_q)

    @jax.jit
    def step(q):
        new_q, _, loss = natgrad_step(lambda d: jnp.sum(vgp.loss(d)), q, gamma=0.5)
        return new_q, loss

    losses = []
    for _ in range(5):
        q, loss = step(q)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_batched_cvi_dp_vmap_sharded(key):
    """vmapped CVI-DP site updates over a dp-sharded batch of trajectories."""
    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
    from vi_diffusion_processes_tpu.sde.utils import euler_maruyama
    from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE

    batch = 8
    grid = jnp.linspace(0.0, 1.0, 33)
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]]))

    models = []
    for i in range(batch):
        k = jax.random.fold_in(key, i)
        path = euler_maruyama(sde, jnp.asarray([1.0]), grid, k)
        obs_idx = np.arange(4, 32, 4)
        obs_y = path[obs_idx] + 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (len(obs_idx), 1))
        models.append(
            CVISitesSDE.initialize_sde(
                sde, grid, (grid[obs_idx], obs_y), Gaussian(variance=jnp.asarray(0.01))
            )
        )
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *models)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    batched = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P("dp"))), batched
    )

    @jax.jit
    def step(ms, lr):
        def one(m):
            m = m.update_data_sites(lr).update_girsanov_sites(lr)
            return m, m.classic_elbo()

        return jax.vmap(one)(ms)

    e0 = None
    for i in range(4):
        batched, elbos = step(batched, 0.5)
        if e0 is None:
            e0 = np.asarray(elbos)
    e1 = np.asarray(elbos)
    assert np.isfinite(e1).all()
    assert (e1 >= e0 - 1e-6).all()


def test_time_sharded_packed_natgrad_step_exact():
    """The genuinely time-sharded CVI-DP natgrad step (every O(T) scan
    distributed over the 8-way 't' mesh, models/cvi_dp_sharded.py) matches
    the single-device packed step — sites, marginals, AND ELBO — to
    association-order rounding, over several steps."""
    from vi_diffusion_processes_tpu.likelihoods.gaussian import Gaussian
    from vi_diffusion_processes_tpu.models.cvi_dp import CVISitesSDE
    from vi_diffusion_processes_tpu.models.cvi_dp_packed import (
        pack_state,
        packed_natgrad_step,
    )
    from vi_diffusion_processes_tpu.models.cvi_dp_sharded import (
        sharded_packed_natgrad_step,
    )
    from vi_diffusion_processes_tpu.sde.utils import Gaussian as GaussianState
    from vi_diffusion_processes_tpu.sde.zoo import DoubleWellSDE

    n = 1024
    dtype = jnp.float32
    sde = DoubleWellSDE(q_mat=jnp.asarray([[0.8]], dtype))
    grid = jnp.linspace(0.0, 4.0, n, dtype=dtype)
    rng = np.random.default_rng(7)
    obs_idx = np.arange(11, n - 1, 37)
    obs_y = jnp.asarray(
        np.sign(np.sin(1.3 * np.asarray(grid[obs_idx])))[:, None]
        + 0.2 * rng.normal(size=(len(obs_idx), 1)),
        dtype,
    )
    model = CVISitesSDE.initialize(
        prior_ssm=None,
        time_grid=grid,
        input_data=(grid[obs_idx], obs_y),
        likelihood=Gaussian(variance=jnp.asarray(0.04, dtype)),
        prior_initial_state=GaussianState(
            mu=jnp.zeros((1,), dtype), cov=jnp.asarray([[0.8]], dtype)
        ),
        prior_sde=sde,
        stabilize_ssm=True,
        clip_state_transitions=(-1.0, 1.0),
    ).set_linearized_prior()

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("t",))
    state_ref = pack_state(model)
    # shard the [T]-planes over 't'; [T-1] subdiagonal planes keep their
    # default placement (jit re-shards them as the scans require)
    state_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("t")))
        if x.ndim == 1 and x.shape[0] % 8 == 0
        else x,
        state_ref,
    )

    step_ref = jax.jit(packed_natgrad_step)
    step_sh = jax.jit(
        lambda m, s, lr: sharded_packed_natgrad_step(m, s, lr, mesh, "t")
    )
    for i in range(3):
        state_ref, elbo_ref = step_ref(model, state_ref, 0.3)
        state_sh, elbo_sh = step_sh(model, state_sh, 0.3)
        np.testing.assert_allclose(
            float(elbo_sh), float(elbo_ref), rtol=2e-4, err_msg=f"step {i}"
        )
    for name in ["g_nat1", "g_nat2d", "g_nat2s", "d_nat1", "d_nat2", "fx_mu", "fx_var"]:
        np.testing.assert_allclose(
            getattr(state_sh, name),
            getattr(state_ref, name),
            rtol=5e-3,
            atol=5e-3,
            err_msg=name,
        )
