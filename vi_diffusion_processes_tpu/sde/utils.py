"""SDE inference utilities: simulation, linearization, Girsanov-style KLs.

Equivalent of markovflow/sde/sde_utils.py — euler_maruyama :36,
linearize_sde :119, squared_drift_difference_along_Gaussian_path :182,
SSM_KL_along_Gaussian_path :262, ssm_to_btd_nat :362,
SDE_SSM_KL_with_grads_wrt_exp_params :473, tranform_girsanov_sites :550
(typo'd name preserved as an alias).

All quadratures vectorize over the whole grid in one ``mvnquad`` call; the
sequential Euler–Maruyama simulation is a ``lax.scan``; KL gradients wrt
expectation parameters are direct ``jax.value_and_grad`` through the
parameter transforms (the reference uses persistent GradientTapes).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.quadrature import mvnquad
from ..ssm.state_space_model import StateSpaceModel
from ..ssm.transforms import expectations_to_ssm_params, ssm_to_expectations, ssm_to_naturals
from ..utils.linalg import gaussian_kl, transpose_last, inv_small
from .base import SDE
from .drift import LinearDrift, linear_drift_to_ssm

__all__ = [
    "Gaussian",
    "euler_maruyama",
    "linearize_sde",
    "squared_drift_difference_along_Gaussian_path",
    "gaussian_log_predictive_density",
    "ssm_kl_along_gaussian_path",
    "ssm_to_btd_nat",
    "BTDNaturals",
    "ssm_kl_with_grads_wrt_exp_params",
    "sde_ssm_kl_with_grads_wrt_exp_params",
    "transform_girsanov_sites",
    "tranform_girsanov_sites",
]


class Gaussian(NamedTuple):
    """Mean/covariance pair (the reference's ``Gaussian`` dataclass)."""

    mu: jnp.ndarray
    cov: jnp.ndarray


class BTDNaturals(NamedTuple):
    """Natural parameters of a Gauss–Markov chain (BTDGaussian,
    gauss_markov.py:220): ``nat1 [..., N+1, d]``, block-tridiag ``nat2``."""

    nat1: jnp.ndarray
    nat2_diag: jnp.ndarray
    nat2_sub: jnp.ndarray


def euler_maruyama(
    sde: SDE, x0: jnp.ndarray, time_grid: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """Simulate trajectories on a time grid (sde_utils.py:36-96).

    ``x0: [..., d]`` (leading dims = independent trajectories),
    ``time_grid: [T]`` → values ``[..., T, d]`` (x0 at the first point).
    """
    dts = time_grid[1:] - time_grid[:-1]
    eps = jax.random.normal(key, dts.shape + x0.shape, x0.dtype)  # [T-1, ..., d]

    def step(x, inp):
        t, dt, e = inp
        noise = jnp.einsum(
            "...ij,...j->...i", sde.diffusion(x, t) * jnp.sqrt(dt), e
        )
        x_next = x + sde.drift(x, t) * dt + noise
        return x_next, x_next

    _, xs = lax.scan(step, x0, (time_grid[:-1], dts, eps))
    traj = jnp.concatenate([x0[None], xs], axis=0)  # [T, ..., d]
    return jnp.moveaxis(traj, 0, -2)


def linearize_sde(
    sde: SDE,
    transition_times: jnp.ndarray,
    linearization_path: Gaussian,
    initial_state: Gaussian,
) -> StateSpaceModel:
    """Statistical linearization of an SDE along a Gaussian path
    (sde_utils.py:119-180):

        ``A*_i = E_q[∂f/∂x]``, ``b*_i = E_q[f] − A*_i E_q[x]``

    followed by Euler discretization into an SSM.
    """
    q_mean, q_covar = linearization_path
    a = sde.expected_gradient_drift(q_mean, q_covar)  # [..., N, d, d]
    e_f = sde.expected_drift(q_mean, q_covar)  # [..., N, d]
    b = e_f - jnp.einsum("...ij,...j->...i", a, q_mean)
    return linear_drift_to_ssm(
        LinearDrift(A=a, b=b),
        q=sde.q.astype(q_mean.dtype),
        transition_times=transition_times,
        initial_mean=initial_state.mu,
        initial_chol_covariance=jnp.linalg.cholesky(initial_state.cov),
    )


def squared_drift_difference_along_Gaussian_path(
    sde_p: SDE,
    linear_drift: LinearDrift,
    q: Gaussian,
    dt,
    quadrature_pnts: int = 20,
) -> jnp.ndarray:
    """``0.5·E_q ∫ ‖f_L(x) − f_p(x)‖²_{Σ⁻¹} dt`` — the VDP E_sde term
    (sde_utils.py:182-249).  Gauss–Hermite over states, Riemann sum over
    time, in one vectorized quadrature call."""
    m, s = q
    sigma = sde_p.q.astype(m.dtype)
    sigma_inv = inv_small(sigma)

    def func(x):  # x: [N, P, d]
        lin = jnp.einsum("nij,npj->npi", linear_drift.A, x) + linear_drift.b[:, None, :]
        diff = lin - sde_p.drift(x)
        return jnp.einsum("npi,ij,npj->np", diff, sigma_inv, diff)

    vals = mvnquad(func, m, s, quadrature_pnts)  # [N]
    return 0.5 * jnp.sum(vals) * dt


def gaussian_log_predictive_density(mean, chol_covariance, x) -> jnp.ndarray:
    """(sde_utils.py:252-259)."""
    from ..utils.linalg import mvn_logpdf

    return mvn_logpdf(x, mean, chol_covariance)


def ssm_kl_along_gaussian_path(
    func_q: Callable,
    func_p: Callable,
    ssm_q_process_covar: jnp.ndarray,
    ssm_p_process_covar: jnp.ndarray,
    ssm_q_marginals_mean: jnp.ndarray,
    ssm_q_marginals_covar: jnp.ndarray,
    quadrature_pnts: int = 20,
) -> jnp.ndarray:
    """KL[SSM-q ‖ SSM-p] via 1D-reduced quadrature (sde_utils.py:262-359).

    ``func_q/func_p`` map states ``[N, P, d] → [N, P, d]`` (the one-step
    forward means).  The closed-form ``C`` term collects the trace/logdet
    pieces; the drift difference is quadratured under q's marginals.
    Does NOT include the initial-state KL (added by callers, matching the
    reference).
    """
    from ..utils.linalg import chol_psd, cho_solve as _cho_solve

    chol_p = chol_psd(ssm_p_process_covar)
    eye = jnp.eye(ssm_p_process_covar.shape[-1], dtype=ssm_p_process_covar.dtype)
    p_inv = _cho_solve(chol_p, jnp.broadcast_to(eye, chol_p.shape))

    # log-dets via Cholesky diagonals (slogdet on tiny batched blocks is
    # slow and crashes the TPU compiler in f64)
    chol_q = chol_psd(ssm_q_process_covar)
    logdet_q = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_q, axis1=-2, axis2=-1))), axis=-1
    )
    logdet_p = 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(chol_p, axis1=-2, axis2=-1))), axis=-1
    )
    d = ssm_q_marginals_mean.shape[-1]
    trace = jnp.einsum("...ij,...ji->...", p_inv, ssm_q_process_covar)
    c_term = -(logdet_q - logdet_p) - d + trace  # [N]

    def func(x):  # [N, P, d]
        diff = func_p(x) - func_q(x)
        return jnp.einsum("npi,nij,npj->np", diff, p_inv, diff)

    m = ssm_q_marginals_mean[:-1]
    s = ssm_q_marginals_covar[:-1]
    fn_difference = mvnquad(func, m, s, quadrature_pnts)  # [N]
    return 0.5 * jnp.sum(fn_difference + c_term)


def ssm_to_btd_nat(ssm: StateSpaceModel) -> BTDNaturals:
    """SSM → natural parameters as a BTD Gaussian (sde_utils.py:362-374)."""
    nat1, nat_diag, nat_sub = ssm_to_naturals(ssm)
    return BTDNaturals(nat1=nat1, nat2_diag=nat_diag, nat2_sub=nat_sub)


def _sym_exp_grads(grads):
    """Project the ``η_diag`` gradient onto the symmetric subspace.

    ``η_diag`` parametrizes the quadratic form ``E[xxᵀ]`` — a symmetric
    matrix — but reverse-mode through Cholesky-based consumers splits the
    gradient arbitrarily between ``(i,j)`` and ``(j,i)``.  Downstream, the
    site update adds this gradient into ``Θ_diag``; an asymmetric split
    would make different (mathematically equivalent) implementations
    diverge.  Symmetrizing keeps the sites in the symmetric subspace where
    every consumer agrees (the reference stores one triangle of the band,
    block_tri_diag.py:91-98, which enforces the same invariant)."""
    g1, g2, g3 = grads
    return g1, 0.5 * (g2 + transpose_last(g2)), g3


def _kl_of_exp_params(exp_params, func_p_builder, p_process_covar, p_initial: Gaussian):
    """Shared body: KL(q‖p) as a function of q's expectation parameters."""
    exp1, exp_diag, exp_sub = exp_params
    a, b, chol_p0, chol_qs, mu0 = expectations_to_ssm_params(exp1, exp_diag, exp_sub)
    covar = exp_diag - exp1[..., :, None] * exp1[..., None, :]

    def func_q(x):  # [N, P, d]
        return jnp.einsum("nij,npj->npi", a, x) + b[:, None, :]

    q_process_covar = chol_qs @ transpose_last(chol_qs)
    kl_path = ssm_kl_along_gaussian_path(
        func_q=func_q,
        func_p=func_p_builder,
        ssm_q_process_covar=q_process_covar,
        ssm_p_process_covar=p_process_covar,
        ssm_q_marginals_mean=exp1,
        ssm_q_marginals_covar=covar,
    )
    kl_0 = gaussian_kl(mu0, chol_p0, p_initial.mu, jnp.linalg.cholesky(p_initial.cov))
    return kl_path + kl_0


def ssm_kl_with_grads_wrt_exp_params(
    ssm_q: StateSpaceModel, ssm_p: StateSpaceModel
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """KL[q‖p] between two linear SSMs + gradients wrt q's expectation
    params (sde_utils.py:376-463).

    Note: the reference version is dead code with a broken kwarg
    (sde_utils.py:442-449, never exercised); this one is implemented
    correctly and tested.
    """
    exps = ssm_to_expectations(ssm_q)
    a_p = ssm_p.state_transitions
    b_p = ssm_p.state_offsets

    def func_p(x):
        return jnp.einsum("nij,npj->npi", a_p, x) + b_p[:, None, :]

    p_cov = ssm_p.chol_process_covariances @ transpose_last(ssm_p.chol_process_covariances)
    p_init = Gaussian(mu=ssm_p.initial_mean, cov=ssm_p.initial_covariance)
    kl_fn = lambda e1, e2, e3: _kl_of_exp_params((e1, e2, e3), func_p, p_cov, p_init)
    kl_val, grads = jax.value_and_grad(kl_fn, argnums=(0, 1, 2))(*exps)
    return kl_val, _sym_exp_grads(grads)


def sde_ssm_kl_with_grads_wrt_exp_params(
    ssm_q: StateSpaceModel,
    sde_p: SDE,
    dt,
    prior_initial_state: Gaussian,
    transition_times: jnp.ndarray,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """KL[q‖p] against a *nonlinear SDE* prior + grads wrt q's expectation
    params (sde_utils.py:473-547).  The p-forward map is the Euler step
    ``x + dt·f_p(x)``; p's process covariance ``dt·q`` is stop-gradiented
    (sde_utils.py:522-525)."""
    exps = ssm_to_expectations(ssm_q)

    def func_p(x):
        return x + dt * sde_p.drift(x)

    n = ssm_q.num_transitions
    dts = (transition_times[1:] - transition_times[:-1])[..., None, None]
    p_cov = lax.stop_gradient(dts * jnp.broadcast_to(sde_p.q, (n,) + sde_p.q.shape))
    kl_fn = lambda e1, e2, e3: _kl_of_exp_params(
        (e1, e2, e3), func_p, p_cov, prior_initial_state
    )
    kl_val, grads = jax.value_and_grad(kl_fn, argnums=(0, 1, 2))(*exps)
    return kl_val, _sym_exp_grads(grads)


def transform_girsanov_sites(
    girsanov_sites: BTDNaturals, current_prior: StateSpaceModel, new_prior: StateSpaceModel
) -> BTDNaturals:
    """Re-base Girsanov sites between linearized priors
    (sde_utils.py:550-568): ``nat_new = nat + nat_p_old − nat_p_new``."""
    old = ssm_to_btd_nat(current_prior)
    new = ssm_to_btd_nat(new_prior)
    return BTDNaturals(
        nat1=girsanov_sites.nat1 + old.nat1 - new.nat1,
        nat2_diag=girsanov_sites.nat2_diag + old.nat2_diag - new.nat2_diag,
        nat2_sub=girsanov_sites.nat2_sub + old.nat2_sub - new.nat2_sub,
    )


#: the reference's typo'd public name (sde_utils.py:550)
tranform_girsanov_sites = transform_girsanov_sites
