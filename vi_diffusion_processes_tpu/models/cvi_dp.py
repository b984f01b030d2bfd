"""CVI-DP: site-based variational inference for diffusion processes.

Equivalent of markovflow/models/variational_cvi_sde.py (``CVISitesSSM`` :49,
``CVISitesSDE`` :368) — the AISTATS 2024 paper's contribution.  The
posterior over the state trajectory is parameterized by three site groups
(variational_cvi_sde.py:142-175):

* **Girsanov sites**: a full block-tridiagonal natural-parameter correction
  over the whole grid (pairwise potentials from the Girsanov change of
  measure),
* **data sites**: per-observation Gaussian sites at the observation indices,
* **prior-as-sites**: the (linearized) prior SSM in natural form.

``dist_q`` sums the three groups and recovers an SSM through the UDU'
factorization (:func:`~..ssm.transforms.naturals_to_ssm_params`) — one
fused scan instead of the reference's three C++ banded kernels
(ssm_gaussian_transformations.py:333-512).  Every update rule below is a
pure function: model in, model out, jittable end to end.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ..sde.base import SDE
from ..sde.utils import (
    BTDNaturals,
    Gaussian,
    linearize_sde,
    sde_ssm_kl_with_grads_wrt_exp_params,
    ssm_kl_along_gaussian_path,
    ssm_kl_with_grads_wrt_exp_params,
    ssm_to_btd_nat,
    transform_girsanov_sites,
)
from ..ssm.state_space_model import StateSpaceModel
from ..ssm.transforms import naturals_to_ssm
from ..utils.linalg import gaussian_kl
from .posterior import ConditionalProcess

__all__ = ["CVISitesSSM", "CVISitesSDE", "DataSites"]


class DataSites(struct.PyTreeNode):
    """Per-observation Gaussian sites in natural form
    (GaussianSitesNat equivalent, kalman_filter.py:382)."""

    nat1: jnp.ndarray  # [n_obs, d]
    nat2: jnp.ndarray  # [n_obs, d, d]


def _scatter_rows(values: jnp.ndarray, indices: jnp.ndarray, length: int) -> jnp.ndarray:
    out = jnp.zeros((length,) + values.shape[1:], values.dtype)
    return out.at[indices].add(values)


def _prior_nats_f64(dist_p: StateSpaceModel) -> BTDNaturals:
    """Prior SSM → naturals in the precision dtype (f64 under x64)."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else dist_p.initial_mean.dtype
    up = jax.tree_util.tree_map(lambda x: x.astype(dtype), dist_p)
    return ssm_to_btd_nat(up)


@struct.dataclass
class CVISitesSSM:
    """Site-parameterized posterior over an SSM prior
    (variational_cvi_sde.py:49-365)."""

    dist_p: StateSpaceModel
    likelihood: object
    time_grid: jnp.ndarray
    obs_indices: jnp.ndarray
    observations: jnp.ndarray
    girsanov_sites: BTDNaturals
    data_sites: DataSites
    prior_initial_state: Gaussian
    fx_mus: jnp.ndarray  # cached posterior path means [T, d]
    fx_covs: jnp.ndarray  # cached posterior path covs [T, d, d]
    # prior-as-naturals cache (f64): ``ssm_to_btd_nat`` runs whole-grid f64
    # solves, and ``dist_p`` only changes at (re)linearization — recomputing
    # it inside every ``dist_q`` costs ~25% of a full natgrad step at 100k
    prior_nats: Optional[BTDNaturals] = None

    # ----------------------------------------------------------- construction
    @classmethod
    def initialize(
        cls,
        prior_ssm: Optional[StateSpaceModel],
        time_grid: jnp.ndarray,
        input_data: Tuple[jnp.ndarray, jnp.ndarray],
        likelihood,
        prior_initial_state: Optional[Gaussian] = None,
        initial_posterior_path: Optional[Gaussian] = None,
        **kwargs,
    ):
        obs_times, observations = input_data
        d = observations.shape[-1]
        dtype = observations.dtype
        t = time_grid.shape[0]
        if prior_initial_state is None:
            prior_initial_state = Gaussian(
                mu=jnp.zeros((d,), dtype),
                cov=jnp.asarray(prior_ssm.initial_covariance, dtype),
            )
        if initial_posterior_path is None:
            initial_posterior_path = Gaussian(
                mu=jnp.zeros((t, d), dtype),
                cov=jnp.broadcast_to(jnp.eye(d, dtype=dtype), (t, d, d)),
            )
        eye = jnp.eye(d, dtype=dtype)
        girsanov = BTDNaturals(
            nat1=jnp.zeros((t, d), dtype),
            nat2_diag=-1e-10 * jnp.ones((t, d, d), dtype),
            nat2_sub=-1e-10 * jnp.ones((t - 1, d, d), dtype),
        )
        data_sites = DataSites(
            nat1=jnp.zeros(observations.shape, dtype),
            nat2=1e-10 * jnp.broadcast_to(eye, observations.shape + (d,)),
        )
        obs_indices = jnp.searchsorted(time_grid, obs_times)
        kwargs.setdefault(
            "prior_nats", None if prior_ssm is None else _prior_nats_f64(prior_ssm)
        )
        return cls(
            dist_p=prior_ssm,
            likelihood=likelihood,
            time_grid=time_grid,
            obs_indices=obs_indices,
            observations=observations,
            girsanov_sites=girsanov,
            data_sites=data_sites,
            prior_initial_state=prior_initial_state,
            fx_mus=initial_posterior_path.mu,
            fx_covs=initial_posterior_path.cov,
            **kwargs,
        )

    # -------------------------------------------------------------- structure
    @property
    def state_dim(self) -> int:
        return self.observations.shape[-1]

    @property
    def dt(self) -> jnp.ndarray:
        return self.time_grid[1] - self.time_grid[0]

    def full_sites(self) -> BTDNaturals:
        """prior-as-nats + Girsanov sites + scattered data sites
        (variational_cvi_sde.py:161-175).

        Computed in float64 when x64 is enabled, regardless of the model
        dtype: the naturals→SSM round trip on fine grids amplifies float32
        rounding into O(10) ELBO error (measured: converged ELBO −22 in
        f32 vs −9.7 in f64 on the 100k double-well), while the f64 scalar
        scans cost little next to the f32 quadrature/gradient work.  With
        x64 disabled the casts are no-ops and the float32-stable windowed
        Riccati path (Pallas on TPU) keeps things finite.
        """
        t = self.time_grid.shape[0]
        p_nats = self.prior_nats
        if p_nats is None:
            p_nats = _prior_nats_f64(self.dist_p)
        up = lambda tree: jax.tree_util.tree_map(
            lambda x: x.astype(p_nats.nat1.dtype), tree
        )
        data_nat1 = _scatter_rows(self.data_sites.nat1, self.obs_indices, t).astype(jnp.float64)
        data_nat2 = _scatter_rows(self.data_sites.nat2, self.obs_indices, t).astype(jnp.float64)
        g = up(self.girsanov_sites)
        return BTDNaturals(
            nat1=p_nats.nat1 + g.nat1 + data_nat1,
            nat2_diag=p_nats.nat2_diag + g.nat2_diag + data_nat2,
            nat2_sub=p_nats.nat2_sub + g.nat2_sub,
        )

    @property
    def dist_q(self) -> StateSpaceModel:
        """Posterior SSM from summed naturals (variational_cvi_sde.py:177-202).

        The naturals→SSM factorization runs in float64 (see
        :meth:`full_sites`); the resulting SSM is cast back to the model
        dtype so the heavy downstream work (marginal scans, quadratures,
        gradients) stays in fast arithmetic.
        """
        sites = self.full_sites()
        ssm64 = naturals_to_ssm(sites.nat1, sites.nat2_diag, sites.nat2_sub)
        dtype = self.time_grid.dtype
        return jax.tree_util.tree_map(lambda x: x.astype(dtype), ssm64)

    # ------------------------------------------------------------------ terms
    def _obs_moments(self, fx_mus, fx_covs):
        m = jnp.take(fx_mus, self.obs_indices, axis=-2)
        s = jnp.take(fx_covs, self.obs_indices, axis=-3)
        return m, s

    def local_objective_and_gradients(self, f_means, f_covs):
        """VE + gradient wrt expectation params ``η = [μ, Σ+μμᵀ]``
        (variational_cvi_sde.py:204-220), by autodiff in η coordinates."""
        y = self.observations

        def ve_of_eta(eta1, eta2):
            mu = eta1
            cov = eta2 - eta1[..., :, None] * eta1[..., None, :]
            var = jnp.diagonal(cov, axis1=-2, axis2=-1)
            return jnp.sum(self.likelihood.variational_expectations(mu, var, y))

        eta1 = f_means
        eta2 = f_covs + f_means[..., :, None] * f_means[..., None, :]
        obj, grads = jax.value_and_grad(ve_of_eta, argnums=(0, 1))(eta1, eta2)
        return obj, grads

    def variational_expectation(self, fx_mus=None, fx_covs=None) -> jnp.ndarray:
        """E_q[log p(Y|X)] (variational_cvi_sde.py:319-337)."""
        if fx_mus is None or fx_covs is None:
            fx_mus, fx_covs = self.dist_q.marginals()
        m, s = self._obs_moments(fx_mus, fx_covs)
        var = jnp.diagonal(s, axis1=-2, axis2=-1)
        return jnp.sum(self.likelihood.variational_expectations(m, var, self.observations))

    def kl_q_p(self) -> jnp.ndarray:
        """Quadrature KL[q‖p] + closed-form KL₀ (variational_cvi_sde.py:222-277)."""
        dist_q = self.dist_q
        means, covs = dist_q.marginals()
        a_q, b_q = dist_q.state_transitions, dist_q.state_offsets
        a_p, b_p = self.dist_p.state_transitions, self.dist_p.state_offsets

        def fwd(a, b):
            return lambda x: jnp.einsum("nij,npj->npi", a, x) + b[:, None, :]

        kl_path = ssm_kl_along_gaussian_path(
            func_q=fwd(a_q, b_q),
            func_p=fwd(a_p, b_p),
            ssm_q_process_covar=dist_q.process_covariances,
            ssm_p_process_covar=self.dist_p.process_covariances,
            ssm_q_marginals_mean=means,
            ssm_q_marginals_covar=covs,
        )
        kl_0 = gaussian_kl(
            dist_q.initial_mean,
            dist_q.chol_initial_covariance,
            self.dist_p.initial_mean,
            self.dist_p.chol_initial_covariance,
        )
        return kl_path + kl_0

    def classic_elbo(self) -> jnp.ndarray:
        """``VE − KL[q‖p]`` (variational_cvi_sde.py:339-352)."""
        fx_mus, fx_covs = self.dist_q.marginals()
        return self.variational_expectation(fx_mus, fx_covs) - self.kl_q_p()

    # ---------------------------------------------------------------- updates
    def grad_kl_wrt_exp_param(self):
        return ssm_kl_with_grads_wrt_exp_params(self.dist_q, self.dist_p)

    def update_girsanov_sites(self, lr: float) -> "CVISitesSSM":
        """``nat ← nat + lr·(data_nat − ∇_η KL)``
        (variational_cvi_sde.py:279-299)."""
        _, grad_kl = self.grad_kl_wrt_exp_param()
        t = self.time_grid.shape[0]
        data_nat1 = _scatter_rows(self.data_sites.nat1, self.obs_indices, t)
        data_nat2 = _scatter_rows(self.data_sites.nat2, self.obs_indices, t)
        new_sites = BTDNaturals(
            nat1=self.girsanov_sites.nat1 + lr * (data_nat1 - grad_kl[0]),
            nat2_diag=self.girsanov_sites.nat2_diag + lr * (data_nat2 - grad_kl[1]),
            nat2_sub=self.girsanov_sites.nat2_sub - lr * grad_kl[2],
        )
        model = self.replace(girsanov_sites=new_sites)
        fx_mus, fx_covs = model.dist_q.marginals()
        return model.replace(fx_mus=fx_mus, fx_covs=fx_covs)

    def update_data_sites(self, lr: float) -> "CVISitesSSM":
        """CVI rule ``θ ← (1−lr)θ + lr·∇_η VE``
        (variational_cvi_sde.py:301-317)."""
        m, s = self._obs_moments(self.fx_mus, self.fx_covs)
        _, (g1, g2) = self.local_objective_and_gradients(m, s)
        new_sites = DataSites(
            nat1=(1.0 - lr) * self.data_sites.nat1 + lr * g1,
            nat2=(1.0 - lr) * self.data_sites.nat2 + lr * g2,
        )
        model = self.replace(data_sites=new_sites)
        fx_mus, fx_covs = model.dist_q.marginals()
        return model.replace(fx_mus=fx_mus, fx_covs=fx_covs)

    # -------------------------------------------------------------- posterior
    def posterior_process(self, kernel=None) -> ConditionalProcess:
        """Posterior over states at the grid (the reference leaves
        ``posterior`` unimplemented, variational_cvi_sde.py:354-365; we
        expose the marginal path directly)."""
        raise NotImplementedError(
            "Use dist_q.marginals() / predict via the grid; arbitrary-time "
            "prediction requires a kernel-based prior."
        )


@struct.dataclass
class CVISitesSDE(CVISitesSSM):
    """CVI-DP against a *nonlinear SDE* prior (variational_cvi_sde.py:368).

    ``dist_p`` holds the current linearized prior; ``set_linearized_prior``
    re-linearizes around the cached posterior path and (optionally) clips
    the transitions for stability (:417-432, configs/cvi_base.yaml).
    """

    prior_sde: SDE = None
    stabilize_ssm: bool = struct.field(pytree_node=False, default=True)
    clip_state_transitions: Tuple[float, float] = struct.field(
        pytree_node=False, default=(-1.0, 1.0)
    )

    @classmethod
    def initialize_sde(
        cls,
        prior_sde: SDE,
        time_grid: jnp.ndarray,
        input_data: Tuple[jnp.ndarray, jnp.ndarray],
        likelihood,
        prior_initial_state: Optional[Gaussian] = None,
        initial_posterior_path: Optional[Gaussian] = None,
        stabilize_ssm: bool = True,
        clip_state_transitions: Tuple[float, float] = (-1.0, 1.0),
    ) -> "CVISitesSDE":
        obs_times, observations = input_data
        d = observations.shape[-1]
        dtype = observations.dtype
        if prior_initial_state is None:
            prior_initial_state = Gaussian(
                mu=jnp.zeros((d,), dtype),
                cov=jnp.broadcast_to(prior_sde.q, (d, d)).astype(dtype),
            )
        model = cls.initialize(
            prior_ssm=None,
            time_grid=time_grid,
            input_data=input_data,
            likelihood=likelihood,
            prior_initial_state=prior_initial_state,
            initial_posterior_path=initial_posterior_path,
            prior_sde=prior_sde,
            stabilize_ssm=stabilize_ssm,
            clip_state_transitions=clip_state_transitions,
        )
        return model.set_linearized_prior()

    def set_linearized_prior(self) -> "CVISitesSDE":
        """Linearize the SDE on the cached posterior path
        (variational_cvi_sde.py:408-432)."""
        path = Gaussian(mu=self.fx_mus[1:], cov=self.fx_covs[1:])
        lin = linearize_sde(
            self.prior_sde,
            transition_times=self.time_grid,
            linearization_path=path,
            initial_state=self.prior_initial_state,
        )
        if self.stabilize_ssm:
            lo, hi = self.clip_state_transitions
            lin = lin.replace(
                state_transitions=jnp.clip(lin.state_transitions, lo, hi),
                state_offsets=jnp.clip(lin.state_offsets, lo, hi),
            )
        return self.replace(dist_p=lin, prior_nats=_prior_nats_f64(lin))

    def relinearize(self) -> "CVISitesSDE":
        """Outer-loop step: re-linearize AND re-base the Girsanov sites so
        ``dist_q`` is unchanged (cvi_dp_trainer.py:110-134 +
        sde_utils.py:550)."""
        old_prior = self.dist_p
        model = self.set_linearized_prior()
        new_sites = transform_girsanov_sites(
            model.girsanov_sites, old_prior, model.dist_p
        )
        return model.replace(girsanov_sites=new_sites)

    def kl_q_p(self) -> jnp.ndarray:
        """KL[q ‖ SDE prior]: p-forward is the Euler map ``x + dt·f_p(x)``
        (variational_cvi_sde.py:446-486)."""
        dist_q = self.dist_q
        means, covs = dist_q.marginals()
        a_q, b_q = dist_q.state_transitions, dist_q.state_offsets
        n = a_q.shape[0]
        dt = self.dt

        def func_q(x):
            return lax.stop_gradient(
                jnp.einsum("nij,npj->npi", a_q, x) + b_q[:, None, :]
            )

        def func_p(x):
            return x + dt * self.prior_sde.drift(x)

        p_cov = jnp.broadcast_to(self.prior_sde.q, (n,) + self.prior_sde.q.shape) * dt
        kl_path = ssm_kl_along_gaussian_path(
            func_q=func_q,
            func_p=func_p,
            ssm_q_process_covar=dist_q.process_covariances,
            ssm_p_process_covar=p_cov.astype(means.dtype),
            ssm_q_marginals_mean=means,
            ssm_q_marginals_covar=covs,
        )
        kl_0 = gaussian_kl(
            dist_q.initial_mean,
            dist_q.chol_initial_covariance,
            self.prior_initial_state.mu,
            jnp.linalg.cholesky(self.prior_initial_state.cov),
        )
        return kl_path + kl_0

    def grad_kl_wrt_exp_param(self):
        """(variational_cvi_sde.py:488-493)."""
        return sde_ssm_kl_with_grads_wrt_exp_params(
            self.dist_q, self.prior_sde, self.dt, self.prior_initial_state, self.time_grid
        )

    def grad_kl_wrt_prior_params(self):
        """``∂KL/∂θ_p`` for drift learning (variational_cvi_sde.py:495-504)."""
        def loss(prior_sde):
            return self.replace(prior_sde=prior_sde).kl_q_p()

        return jax.grad(loss)(self.prior_sde)

    def grad_ve_wrt_prior_params(self):
        """``∂(−VE)/∂θ_p`` through the re-linearized prior
        (variational_cvi_sde.py:506-518)."""
        def loss(prior_sde):
            model = self.replace(prior_sde=prior_sde).set_linearized_prior()
            fx_mus, fx_covs = model.dist_q.marginals()
            return -model.variational_expectation(fx_mus, fx_covs)

        return jax.grad(loss)(self.prior_sde)
