"""Conjugate-computation VI (Khan & Lin 2017) with Gaussian sites.

Equivalent of markovflow/models/variational_cvi.py
(GaussianProcessWithSitesBase :32, CVIGaussianProcess :225,
back_project_nats :423, gradient_transformation_mean_var_to_expectation
:448).

The posterior is parameterized by per-datum Gaussian sites in f-space,
``t_k(f) = exp(θ₁f + θ₂f²)``; the posterior SSM is the prior conditioned on
those sites.  The reference materializes the posterior by assembling natural
parameters and running the banded ``naturals_to_ssm_params``
(variational_cvi.py:111-135); here the same distribution comes out of the
parallel filter/smoother (O(log N) depth).  Site updates are the CVI rule

    ``θ ← (1−ρ)θ + ρ·∇_η VE(q(f))``,   ``η = [μ, σ²+μ²]``

with the η-gradient computed by direct autodiff of VE re-parameterized in η.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..parallel.pskf import (
    filter_smoother_with_sites,
    posterior_ssm_from_smoothed,
)
from ..parallel.sites import (  # noqa: F401  (canonical home; re-exported here)
    GaussianSites,
    back_project_nats,
    sites_log_likelihood,
)
from ..ssm.mean_functions import MeanFunction
from ..ssm.state_space_model import StateSpaceModel
from .posterior import AnalyticPosteriorProcess

__all__ = ["GaussianSites", "CVIGaussianProcess", "back_project_nats", "sites_log_likelihood"]


@struct.dataclass
class CVIGaussianProcess:
    """CVI model state: prior hyperparameters + site naturals
    (variational_cvi.py:225-420).  Pure-functional: ``update_sites`` returns
    a new model, jittable end to end."""

    kernel: object
    likelihood: object
    time_points: jnp.ndarray
    observations: jnp.ndarray
    sites: GaussianSites
    mean_function: Optional[MeanFunction] = None
    learning_rate: float = struct.field(pytree_node=False, default=0.1)

    @classmethod
    def initialize(
        cls, kernel, likelihood, time_points, observations, mean_function=None, learning_rate=0.1
    ) -> "CVIGaussianProcess":
        return cls(
            kernel=kernel,
            likelihood=likelihood,
            time_points=time_points,
            observations=observations,
            sites=GaussianSites.zeros_like_observations(observations),
            mean_function=mean_function,
            learning_rate=learning_rate,
        )

    # ------------------------------------------------------------- internals
    @property
    def dist_p(self) -> StateSpaceModel:
        return self.kernel.state_space_model(self.time_points)

    def _emission(self):
        return self.kernel.generate_emission_model(self.time_points)

    def _state_sites(self):
        return back_project_nats(self.sites, self._emission().emission_matrix)

    def _observations_centred(self):
        y = self.observations
        if self.mean_function is not None:
            y = y - self.mean_function(self.time_points)
        return y

    @property
    def dist_q(self) -> StateSpaceModel:
        """Posterior SSM: prior × sites through the parallel smoother."""
        nat1, prec = self._state_sites()
        _, smooth = filter_smoother_with_sites(self.dist_p, nat1, prec)
        return posterior_ssm_from_smoothed(self.dist_p, smooth)

    def posterior_marginals_f(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Marginal q(f) at the training points (mean-function-centred)."""
        nat1, prec = self._state_sites()
        _, smooth = filter_smoother_with_sites(self.dist_p, nat1, prec)
        emission = self._emission()
        return emission.project_state_marginals_to_f(smooth.means, smooth.covs)

    # ----------------------------------------------------------------- steps
    def local_objective_and_gradients(self, f_means, f_vars):
        """VE and its gradient wrt expectation params ``η = [μ, σ²+μ²]``
        (variational_cvi.py:334-352), by direct autodiff in η-coordinates."""
        y = self._observations_centred()

        def ve_of_eta(eta1, eta2):
            mu = eta1
            var = eta2 - eta1**2
            return jnp.sum(self.likelihood.variational_expectations(mu, var, y))

        eta1 = f_means
        eta2 = f_vars + f_means**2
        obj, grads = jax.value_and_grad(ve_of_eta, argnums=(0, 1))(eta1, eta2)
        return obj, grads

    def update_sites(self) -> "CVIGaussianProcess":
        """One CVI site update: ``θ ← (1−ρ)θ + ρ·∇_η VE``
        (variational_cvi.py:354-377)."""
        f_means, f_vars = self.posterior_marginals_f()
        _, (g1, g2) = self.local_objective_and_gradients(f_means, f_vars)
        lr = self.learning_rate
        new_nat1 = (1.0 - lr) * self.sites.nat1 + lr * g1
        # g2 is the gradient wrt η₂ per output dim → diagonal site precision
        m = self.sites.nat2.shape[-1]
        eye = jnp.eye(m, dtype=g2.dtype)
        new_nat2 = (1.0 - lr) * self.sites.nat2 + lr * g2[..., None] * eye
        return self.replace(sites=GaussianSites(nat1=new_nat1, nat2=new_nat2))

    # ------------------------------------------------------------------ elbo
    def log_likelihood(self) -> jnp.ndarray:
        """Marginal likelihood of the site-augmented conjugate model
        (= ``elbo()``, variational_cvi.py:370-379)."""
        return sites_log_likelihood(self.dist_p, self.sites, self._emission())

    def elbo(self) -> jnp.ndarray:
        return self.log_likelihood()

    def classic_elbo(self) -> jnp.ndarray:
        """``Σ VE − KL(q‖p)`` — the two-path consistency check
        (variational_cvi.py:381-404)."""
        f_means, f_vars = self.posterior_marginals_f()
        ve = jnp.sum(
            self.likelihood.variational_expectations(
                f_means, f_vars, self._observations_centred()
            )
        )
        return ve - self.dist_q.kl_divergence(self.dist_p)

    def loss(self) -> jnp.ndarray:
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

    def predict_log_density(self, time_points, observations):
        f_means, f_vars = self.posterior.predict_f(time_points)
        return self.likelihood.predict_density(f_means, f_vars, observations)
