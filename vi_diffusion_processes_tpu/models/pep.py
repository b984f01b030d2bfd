"""Power Expectation Propagation on Markovian GPs.

Equivalent of markovflow/models/pep.py:28 (``PowerExpectationPropagation``):
Gaussian sites in f-space updated by the classic (damped, α-power) EP moment
match against the cavity distribution.  The posterior materialization reuses
the CVI machinery (parallel filter/smoother over back-projected sites).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..likelihoods.pep import PEPScalarLikelihood, gradient_correction
from ..parallel.pskf import filter_smoother_with_sites
from ..ssm.mean_functions import MeanFunction
from ..ssm.state_space_model import StateSpaceModel
from .cvi import GaussianSites, back_project_nats
from .posterior import AnalyticPosteriorProcess
from ..utils.linalg import solve_small

__all__ = ["PowerExpectationPropagation"]


@struct.dataclass
class PowerExpectationPropagation:
    """PEP model state (pep.py:28-116).  ``sites`` live in f-space
    (scalar per output dim); ``log_norm`` tracks per-site normalizers for
    the EP energy."""

    kernel: object
    likelihood: PEPScalarLikelihood
    time_points: jnp.ndarray
    observations: jnp.ndarray
    sites: GaussianSites
    site_log_norm: jnp.ndarray
    mean_function: Optional[MeanFunction] = None
    alpha: float = struct.field(pytree_node=False, default=1.0)
    learning_rate: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def initialize(
        cls, kernel, likelihood, time_points, observations,
        mean_function=None, alpha=1.0, learning_rate=1.0,
    ) -> "PowerExpectationPropagation":
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            time_points=time_points,
            observations=observations,
            sites=GaussianSites.zeros_like_observations(observations),
            site_log_norm=jnp.zeros_like(observations),
            mean_function=mean_function,
            alpha=alpha,
            learning_rate=learning_rate,
        )

    # ------------------------------------------------------------- structure
    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.time_points)

    def _emission(self):
        return self.kernel.generate_emission_model(self.time_points)

    def _observations_centred(self):
        y = self.observations
        if self.mean_function is not None:
            y = y - self.mean_function(self.time_points)
        return y

    def _smoothed(self):
        nat1, prec = back_project_nats(self.sites, self._emission().emission_matrix)
        _, smooth = filter_smoother_with_sites(self.dist_p, nat1, prec)
        return smooth

    @property
    def dist_q(self) -> StateSpaceModel:
        from ..parallel.pskf import posterior_ssm_from_smoothed

        return posterior_ssm_from_smoothed(self.dist_p, self._smoothed())

    # ------------------------------------------------------------ cavity math
    def compute_cavity_from_marginals(self, means, covs):
        """State-space cavity: posterior naturals minus α·site naturals,
        projected to f (pep.py:150-178)."""
        d = means.shape[-1]
        eye = jnp.eye(d, dtype=means.dtype)
        prec = solve_small(covs, jnp.broadcast_to(eye, covs.shape))
        nat2 = -0.5 * prec
        nat1 = jnp.einsum("...ij,...j->...i", prec, means)
        h = self._emission().emission_matrix
        bp_nat1, bp_prec = back_project_nats(self.sites, h)
        bp_nat2 = -0.5 * bp_prec
        cav_nat2 = nat2 - self.alpha * bp_nat2
        cav_nat1 = nat1 - self.alpha * bp_nat1
        cav_prec = -2.0 * cav_nat2
        cav_covs = solve_small(cav_prec, jnp.broadcast_to(eye, cav_prec.shape))
        cav_means = jnp.einsum("...ij,...j->...i", cav_covs, cav_nat1)
        emission = self._emission()
        return emission.project_state_marginals_to_f(cav_means, cav_covs)

    def compute_cavity(self):
        smooth = self._smoothed()
        return self.compute_cavity_from_marginals(smooth.means, smooth.covs)

    def local_objective_gradients(self, f_mu, f_var):
        """α-power log expected density + corrected gradients (pep.py:87-95)."""
        obj, grads = self.likelihood.grad_log_expected_density(
            f_mu, f_var, self._observations_centred(), alpha=self.alpha
        )
        return obj, gradient_correction((f_mu, f_var), grads)

    def _log_norms(self, fx_marg_mus, fx_marg_covs, fx_mus, fx_covs, obj):
        log_norm_cav = 0.5 * (jnp.log(fx_covs) + fx_mus**2 / fx_covs)
        log_norm_marg = 0.5 * (jnp.log(fx_marg_covs) + fx_marg_mus**2 / fx_marg_covs)
        return obj[..., None] + log_norm_cav - log_norm_marg

    # ----------------------------------------------------------------- update
    def update_sites(self) -> "PowerExpectationPropagation":
        """Damped α-power EP site update (pep.py:179-216)."""
        smooth = self._smoothed()
        emission = self._emission()
        fx_marg_mus, fx_marg_covs = emission.project_state_marginals_to_f(
            smooth.means, smooth.covs
        )
        fx_mus, fx_covs = self.compute_cavity_from_marginals(smooth.means, smooth.covs)
        obj, grads = self.local_objective_gradients(fx_mus, fx_covs)
        log_norm = self._log_norms(fx_marg_mus, fx_marg_covs, fx_mus, fx_covs, obj)

        a, lr = self.alpha, self.learning_rate
        m = self.sites.nat2.shape[-1]
        eye = jnp.eye(m, dtype=grads[1].dtype)
        pep_nat1 = (1.0 - a) * self.sites.nat1 + grads[0]
        pep_nat2 = (1.0 - a) * self.sites.nat2 + grads[1][..., None] * eye
        pep_log_norm = (1.0 - a) * self.site_log_norm + log_norm

        return self.replace(
            sites=GaussianSites(
                nat1=(1.0 - lr) * self.sites.nat1 + lr * pep_nat1,
                nat2=(1.0 - lr) * self.sites.nat2 + lr * pep_nat2,
            ),
            site_log_norm=(1.0 - lr) * self.site_log_norm + lr * pep_log_norm,
        )

    # ----------------------------------------------------------------- energy
    def compute_log_norm(self):
        """Per-site normalizers of the EP energy (pep.py:141-160).

        Note: the local objective is evaluated at the *cavity* — the correct
        EP energy (verified: at the α=1 conjugate fixed point the energy
        equals the exact log marginal likelihood).  The reference's
        ``compute_log_norm`` (pep.py:155) evaluates it at the posterior
        marginals, which breaks that identity — a latent quirk in untested
        code (its ``update_sites`` DOES use the cavity)."""
        smooth = self._smoothed()
        emission = self._emission()
        fx_marg_mus, fx_marg_covs = emission.project_state_marginals_to_f(
            smooth.means, smooth.covs
        )
        fx_mus, fx_covs = self.compute_cavity_from_marginals(smooth.means, smooth.covs)
        obj, _ = self.local_objective_gradients(fx_mus, fx_covs)
        return self._log_norms(fx_marg_mus, fx_marg_covs, fx_mus, fx_covs, obj)

    def energy(self):
        """PEP energy (pep.py:223-231):
        ``A(q) − A(p) + (1/α) Σ log_norm``."""
        return (
            self.dist_q.normalizer()
            - self.dist_p.normalizer()
            + jnp.sum(self.compute_log_norm()) / self.alpha
        )

    def elbo(self):
        """Marginal likelihood of the site-augmented model (pep.py:217-222)."""
        from .cvi import sites_log_likelihood

        return sites_log_likelihood(self.dist_p, self.sites, self._emission())

    def loss(self):
        return -self.elbo()

    @property
    def posterior(self) -> AnalyticPosteriorProcess:
        return AnalyticPosteriorProcess(
            dist=self.dist_q,
            kernel=self.kernel,
            conditioning_time_points=self.time_points,
            mean_function=self.mean_function,
            likelihood=self.likelihood,
        )

    def predict_log_density(self, input_data):
        x, y = input_data
        f_mean, f_var = self.posterior.predict_f(x)
        return self.likelihood.predict_density(f_mean, f_var, y)
