"""Structure-of-scalars CVI-DP hot loop for ``d = 1`` (TPU layout fast path).

Why this exists: TPU buffers are tiled ``(8, 128)`` over their two minormost
dimensions, so a ``[T, 1, 1]`` array materializes at up to **1024×** its
logical size and a ``[T, 1]`` array at 128×.  The generic CVI-DP step
(:mod:`.cvi_dp`) carries ~10 such arrays per 100k-point grid through every
scan boundary, which makes the flagship natgrad step memory-bound on padding:
measured on a v5e chip, the ``dist_q``→marginals chain costs ~5.3 ms while
its *compute* (the f64 Möbius/affine scans on ``[T]`` data) costs ~0.02 ms.

This module packs the entire per-step state into rank-1 ``[T]`` arrays
(structure-of-scalars) and re-expresses one full natgrad step — data-site
update, Girsanov-site update, classic ELBO — on that layout.  The math and
the dtype boundaries (float64 natural-parameter algebra, float32 everything
else; see ``cvi_dp.full_sites``) mirror ``models/cvi_dp.py`` exactly; only
array shapes differ.  Equivalence is tested to float32 resolution in
``tests/unit/test_cvi_dp_packed.py``.

Reference call stack being accelerated: variational_cvi_sde.py:301-317
(update_data_sites), :279-299 (update_girsanov_sites) with the KL gradients
of sde_utils.py:473-547, and :339-352 (classic_elbo).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ..config import default_jitter
from ..ops.btd import riccati_d_scalar
from ..ops.quadrature import gauss_hermite_grid
from .cvi_dp import CVISitesSDE, DataSites
from ..sde.utils import BTDNaturals

__all__ = ["PackedCVIState", "pack_state", "unpack_state", "packed_natgrad_step"]


class PackedCVIState(struct.PyTreeNode):
    """All mutable per-step CVI-DP state as rank-1 (padding-free) arrays.

    Naturals follow the same convention as :class:`..sde.utils.BTDNaturals`;
    the prior-as-naturals channels are the float64 cache of
    ``cvi_dp.CVISitesSSM.prior_nats`` and are loop-invariant during site
    optimization.
    """

    g_nat1: jnp.ndarray  # [T]   girsanov sites, model dtype
    g_nat2d: jnp.ndarray  # [T]
    g_nat2s: jnp.ndarray  # [T-1]
    d_nat1: jnp.ndarray  # [T]   data sites, DENSE (zero off-observation)
    d_nat2: jnp.ndarray  # [T]
    fx_mu: jnp.ndarray  # [T]   cached posterior marginals, model dtype
    fx_var: jnp.ndarray  # [T]
    p_nat1: jnp.ndarray  # [T]   prior-as-naturals (f64 under x64)
    p_nat2d: jnp.ndarray  # [T]
    p_nat2s: jnp.ndarray  # [T-1]
    obs_mask: jnp.ndarray  # [T]  1.0 at observation grid points
    y_dense: jnp.ndarray  # [T]  observations scattered onto the grid


def pack_state(model: CVISitesSDE) -> PackedCVIState:
    """Squeeze a ``d = 1`` model's mutable state into rank-1 arrays.

    Data sites are held DENSELY on the grid (zeros off-observation, with a
    precomputed mask): TPU scatters serialize per index, and the generic
    step's two ``at[obs].add`` scatters alone cost ~2.3 ms at T=100k —
    more than all the f64 scan compute combined.  The dense form makes
    every in-loop site operation a masked elementwise op.  Requires unique
    observation indices (the reference's sparse-site models assume the
    same, kalman_filter.py:541-551).
    """
    if model.state_dim != 1:
        raise ValueError("packed CVI-DP fast path requires state_dim == 1")
    g = model.girsanov_sites
    ds = model.data_sites
    p = model.prior_nats
    if p is None:
        from .cvi_dp import _prior_nats_f64

        p = _prior_nats_f64(model.dist_p)
    t = model.time_grid.shape[0]
    dtype = model.time_grid.dtype
    obs_idx = model.obs_indices
    mask = jnp.zeros(t, dtype).at[obs_idx].set(1.0)
    return PackedCVIState(
        g_nat1=g.nat1[..., 0],
        g_nat2d=g.nat2_diag[..., 0, 0],
        g_nat2s=g.nat2_sub[..., 0, 0],
        d_nat1=jnp.zeros(t, dtype).at[obs_idx].set(ds.nat1[..., 0]),
        d_nat2=jnp.zeros(t, dtype).at[obs_idx].set(ds.nat2[..., 0, 0]),
        fx_mu=model.fx_mus[..., 0],
        fx_var=model.fx_covs[..., 0, 0],
        p_nat1=p.nat1[..., 0],
        p_nat2d=p.nat2_diag[..., 0, 0],
        p_nat2s=p.nat2_sub[..., 0, 0],
        obs_mask=mask,
        y_dense=jnp.zeros(t, dtype).at[obs_idx].set(model.observations[..., 0]),
    )


def unpack_state(model: CVISitesSDE, state: PackedCVIState) -> CVISitesSDE:
    """Restore a packed state into the API-shaped model pytree."""
    obs_idx = model.obs_indices
    return model.replace(
        girsanov_sites=BTDNaturals(
            nat1=state.g_nat1[:, None],
            nat2_diag=state.g_nat2d[:, None, None],
            nat2_sub=state.g_nat2s[:, None, None],
        ),
        data_sites=DataSites(
            nat1=state.d_nat1[obs_idx][:, None],
            nat2=state.d_nat2[obs_idx][:, None, None],
        ),
        fx_mus=state.fx_mu[:, None],
        fx_covs=state.fx_var[:, None, None],
    )


from ..ops.btd import scalar_affine_all as _scalar_affine_scan  # noqa: E402


def _naturals_to_ssm_1d(nat1, nat2d, nat2s):
    """Scalar-channel ``naturals_to_ssm_params`` (ssm/transforms.py:133-172).

    Returns ``(a [T-1], b [T-1], qv [T-1], mu0, p0v, mu [T], var-chain
    pieces)`` in the input dtype (f64 in the hot loop).
    """
    kd = -2.0 * nat2d
    ks = -nat2s
    b2 = jnp.concatenate([ks**2, jnp.zeros_like(kd[:1])])
    d_blocks = riccati_d_scalar(kd, b2)  # [T] (precisions D_k)
    u = ks / d_blocks[1:]  # U superdiagonal
    a = -u
    covs = 1.0 / d_blocks  # D_k⁻¹: P0 then Q_k
    # means: U z = θ (backward), w = D⁻¹ z, Uᵀ μ = w (forward)
    z_rest = _scalar_affine_scan(-u, nat1[:-1], nat1[-1], reverse=True)
    z = jnp.concatenate([z_rest, nat1[-1:]])
    w = covs * z
    mu_rest = _scalar_affine_scan(-u, w[1:], w[0])
    mu = jnp.concatenate([w[:1], mu_rest])
    b = mu[1:] - a * mu[:-1]
    return a, b, covs[1:], mu[0], covs[0], mu


def _marginals_1d(a, b, qv, mu0, p0v):
    """Scalar-channel marginal means/vars (ssm/state_space_model.py:122-159),
    blocked scan layout for long grids (ops/blocked_scan.py)."""

    def comp(e1, e2):
        a1, b1, q1 = e1
        a2, b2, q2 = e2
        return a2 * a1, a2 * b1 + b2, a2 * q1 * a2 + q2

    if a.ndim == 1 and a.shape[0] >= 4096 and jax.default_backend() == "tpu":
        # two fused linear recurrences (ops/pallas_scan.py):
        # m_k = a_k m_{k−1} + b_k,  v_k = a_k² v_{k−1} + qv_k
        from ..ops.pallas_scan import linear_recurrence

        m_rest = linear_recurrence(a, b, mu0, False)
        v_rest = linear_recurrence(a * a, qv, p0v, False)
        means = jnp.concatenate([mu0[None], m_rest])
        varis = jnp.concatenate([p0v[None], v_rest])
        return means, varis
    if a.ndim == 1 and a.shape[0] >= 4096:
        from ..ops.blocked_scan import blocked_assoc_scan

        ca, cb, cq = blocked_assoc_scan(
            comp, (a, b, qv), identity=(1.0, 0.0, 0.0)
        )
    else:
        ca, cb, cq = lax.associative_scan(comp, (a, b, qv))
    means = jnp.concatenate([mu0[None], ca * mu0 + cb])
    varis = jnp.concatenate([p0v[None], ca * p0v * ca + cq])
    return means, varis


#: VMEM ceiling for the fused dist_q kernel: it pins 23 full-length f32
#: planes (6 in + 5 out + 12 scratch) in VMEM, ~92 MB at T=1M — the Mosaic
#: compile fails (tpu_compile_helper exit 1) past ~500k.  Longer grids fall
#: back to the XLA composition whose pallas pieces dispatch individually.
FUSED_DIST_Q_MAX_N = 1 << 19


def _dist_q_core(nat1, nat2d, nat2s, compute_dtype):
    """naturals → f32 SSM params + marginals, XLA composition (the pallas
    kernels behind riccati/affine dispatch individually on TPU)."""
    a, b, qv, mu0, p0v, _ = _naturals_to_ssm_1d(nat1, nat2d, nat2s)
    a = a.astype(compute_dtype)
    b = b.astype(compute_dtype)
    qv = qv.astype(compute_dtype)
    mu0 = mu0.astype(compute_dtype)
    p0v = p0v.astype(compute_dtype)
    means, varis = _marginals_1d(a, b, qv, mu0, p0v)
    return a, b, qv, mu0, p0v, means, varis


@jax.custom_vjp
def _dist_q_core_fused(nat1, nat2d, nat2s):
    """One fused Pallas kernel for the whole chain (TPU, f64 naturals →
    f32 outputs; ops/pallas_scan.py::dist_q_1d_planes).  Five separate
    kernel dispatches' worth of HBM round-trips and blockify relayouts
    were ~40% of the packed step's device time at T=100k."""
    return _dist_q_fused_fwd(nat1, nat2d, nat2s)[0]


def _dist_q_fused_fwd(nat1, nat2d, nat2s):
    from ..ops.pallas_scan import dist_q_1d_planes

    return dist_q_1d_planes(nat1, nat2d, nat2s), (nat1, nat2d, nat2s)


def _dist_q_fused_bwd(res, ct):
    # gradients route through the (differentiable) XLA composition — only
    # paid when a caller differentiates through dist_q (prior learning),
    # never in the site hot loop
    _, vjp = jax.vjp(
        lambda n1, n2d, n2s: _dist_q_core(n1, n2d, n2s, jnp.float32), *res
    )
    return vjp(ct)


_dist_q_core_fused.defvjp(_dist_q_fused_fwd, _dist_q_fused_bwd)


def _dist_q_1d(state: PackedCVIState, compute_dtype):
    """``full_sites`` + ``naturals_to_ssm`` + ``marginals`` on scalar
    channels (cvi_dp.py full_sites/dist_q; f64 naturals algebra, f32 out).
    Data sites are already dense, so the site sum is pure elementwise."""
    f64 = state.p_nat1.dtype
    nat1 = state.p_nat1 + state.g_nat1.astype(f64) + state.d_nat1.astype(f64)
    nat2d = state.p_nat2d + state.g_nat2d.astype(f64) + state.d_nat2.astype(f64)
    nat2s = state.p_nat2s + state.g_nat2s.astype(f64)
    if (
        compute_dtype == jnp.float32
        and nat1.dtype == jnp.float64
        and nat1.ndim == 1
        and 4096 <= nat1.shape[0] <= FUSED_DIST_Q_MAX_N
        and jax.default_backend() == "tpu"
    ):
        a, b, qv, mu0, p0v, means, varis = _dist_q_core_fused(nat1, nat2d, nat2s)
    else:
        a, b, qv, mu0, p0v, means, varis = _dist_q_core(
            nat1, nat2d, nat2s, compute_dtype
        )
    return (a, b, qv, mu0, p0v), means, varis


def _kl_packed(
    e1, ed, es, drift_fn, p_var, p_mu0, p_var0, quad_z, quad_w, dt
):
    """KL[q‖p(SDE)] as a function of q's packed expectation parameters.

    Mirrors ``sde/utils.py::_kl_of_exp_params`` + ``ssm_kl_along_gaussian_path``
    (sde_utils.py:262-359) with the Euler p-forward ``x + dt·f_p(x)``
    (variational_cvi_sde.py:467-468), on scalar channels.
    """
    mu = e1
    var = ed - e1**2
    cov_up = es - e1[:-1] * e1[1:]
    a = cov_up / var[:-1]
    b = mu[1:] - a * mu[:-1]
    qv = var[1:] - a**2 * var[:-1]

    # closed-form C term: −(log|Q_q| − log|Q_p|) − d + tr(Q_p⁻¹ Q_q)
    c_term = -(jnp.log(qv) - jnp.log(p_var)) - 1.0 + qv / p_var

    # Gauss–Hermite over q's marginals (mvnquad with jittered cholesky)
    jitter = jnp.asarray(default_jitter(), var.dtype)
    chol = jnp.sqrt(var[:-1] + jitter)
    x = mu[:-1, None] + jnp.sqrt(jnp.asarray(2.0, mu.dtype)) * chol[:, None] * quad_z
    f_p = x + dt * drift_fn(x)
    f_q = a[:, None] * x + b[:, None]
    diff2 = (f_p - f_q) ** 2 / p_var[:, None]
    fn_difference = jnp.sum(diff2 * quad_w, axis=-1)

    kl_path = 0.5 * jnp.sum(fn_difference + c_term)

    # KL₀ between scalar Gaussians (utils/linalg.py::gaussian_kl)
    var0 = var[0]
    kl_0 = 0.5 * (
        var0 / p_var0 + (p_mu0 - mu[0]) ** 2 / p_var0 - 1.0 + jnp.log(p_var0 / var0)
    )
    return kl_path + kl_0


def _quad_grid_1d(dtype, n_points: int = 20):
    z, w = gauss_hermite_grid(1, n_points, dtype)
    return z[:, 0], w


def packed_elbo(model: CVISitesSDE, state: PackedCVIState) -> jnp.ndarray:
    """``classic_elbo()`` of the current packed state (no updates)."""
    dtype = model.time_grid.dtype
    t = state.g_nat1.shape[0]
    dt = model.dt
    quad_z, quad_w = _quad_grid_1d(dtype)
    q_scalar = jnp.reshape(model.prior_sde.q, ()).astype(dtype)
    p_mu0 = model.prior_initial_state.mu[0].astype(dtype)
    p_var0 = model.prior_initial_state.cov[0, 0].astype(dtype)

    def drift_fn(x):
        return model.prior_sde.drift(x[..., None])[..., 0]

    ssm, means, varis = _dist_q_1d(state, dtype)
    per_t = model.likelihood.variational_expectations(
        means[:, None], varis[:, None], state.y_dense[:, None]
    )
    ve = jnp.sum(state.obs_mask * per_t)
    a = ssm[0]
    kl = _kl_packed(
        means,
        varis + means**2,
        a * varis[:-1] + means[1:] * means[:-1],
        drift_fn,
        jnp.broadcast_to(dt * q_scalar, (t - 1,)),
        p_mu0,
        p_var0,
        quad_z,
        quad_w,
        dt,
    )
    return ve - kl


def packed_natgrad_step(
    model: CVISitesSDE, state: PackedCVIState, lr
) -> Tuple[PackedCVIState, jnp.ndarray]:
    """One full CVI-DP natgrad step on packed state:

    ``update_data_sites(lr)`` → ``update_girsanov_sites(lr)`` →
    ``classic_elbo()``, exactly as the trainer inner loop
    (cvi_dp_trainer.py:63-95) and ``bench.py`` execute it on the generic
    model, but with every carried buffer rank-1.  ``model`` supplies the
    static configuration (likelihood, SDE, grids); its array fields are
    untouched and the big ``[T, d, d]`` buffers are dead inputs that XLA
    strips from the compiled step.
    """
    dtype = model.time_grid.dtype
    t = state.g_nat1.shape[0]
    dt = model.dt
    quad_z, quad_w = _quad_grid_1d(dtype)
    mask = state.obs_mask
    y = state.y_dense

    def drift_fn(x):  # [N, P] → [N, P] through the generic SDE API
        return model.prior_sde.drift(x[..., None])[..., 0]

    # p's process variance along the grid (stop-gradiented, sde_utils.py:522)
    dts = model.time_grid[1:] - model.time_grid[:-1]
    q_scalar = jnp.reshape(model.prior_sde.q, ()).astype(dtype)
    p_var = lax.stop_gradient(dts * q_scalar)
    p_mu0 = model.prior_initial_state.mu[0].astype(dtype)
    p_var0 = model.prior_initial_state.cov[0, 0].astype(dtype)

    def masked_ve(means, varis):
        """Σ_obs E_q[log p(y|f)] evaluated densely under the mask."""
        per_t = model.likelihood.variational_expectations(
            means[:, None], varis[:, None], y[:, None]
        )
        return jnp.sum(mask * per_t)

    # ---- update_data_sites(lr): VE grads at the cached marginals, dense
    def ve_of_eta(eta1, eta2):
        mu = eta1
        var = eta2 - eta1**2
        return masked_ve(mu, var)

    m0 = state.fx_mu
    g1, g2 = jax.grad(ve_of_eta, argnums=(0, 1))(m0, state.fx_var + m0**2)
    # off-observation entries of g are zero (mask), so the CVI update keeps
    # the dense sites zero there: (1−lr)·0 + lr·0
    d_nat1 = (1.0 - lr) * state.d_nat1 + lr * g1
    d_nat2 = (1.0 - lr) * state.d_nat2 + lr * g2
    state = state.replace(d_nat1=d_nat1, d_nat2=d_nat2)

    # refreshed posterior after the data-site update (dist_q(B))
    ssm_b, means_b, vars_b = _dist_q_1d(state, dtype)

    # ---- update_girsanov_sites(lr): ∇_η KL at dist_q(B)
    a_b = ssm_b[0]
    e1 = means_b
    ed = vars_b + means_b**2
    es = a_b * vars_b[:-1] + means_b[1:] * means_b[:-1]
    grad_e1, grad_ed, grad_es = jax.grad(_kl_packed, argnums=(0, 1, 2))(
        e1, ed, es, drift_fn, p_var, p_mu0, p_var0, quad_z, quad_w, dt
    )
    state = state.replace(
        g_nat1=state.g_nat1 + lr * (d_nat1 - grad_e1),
        g_nat2d=state.g_nat2d + lr * (d_nat2 - grad_ed),
        g_nat2s=state.g_nat2s - lr * grad_es,
    )

    # ---- refreshed posterior (dist_q(C)) + classic ELBO
    ssm_c, means_c, vars_c = _dist_q_1d(state, dtype)
    state = state.replace(fx_mu=means_c, fx_var=vars_c)

    ve = masked_ve(means_c, vars_c)
    a_c = ssm_c[0]
    kl = _kl_packed(
        means_c,
        vars_c + means_c**2,
        a_c * vars_c[:-1] + means_c[1:] * means_c[:-1],
        drift_fn,
        # classic_elbo's KL uses the scalar grid dt (cvi_dp.py::kl_q_p)
        jnp.broadcast_to(dt * q_scalar, (t - 1,)),
        p_mu0,
        p_var0,
        quad_z,
        quad_w,
        dt,
    )
    return state, ve - kl
