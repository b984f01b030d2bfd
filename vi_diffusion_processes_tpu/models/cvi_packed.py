"""Packed (rank-1) hot loop for non-conjugate CVI site updates.

The :class:`~.cvi.CVIGaussianProcess` site step (variational_cvi.py:351-421:
posterior marginals → ∇_η VE → site blend) runs its posterior refresh through
the generic ``[T, d, d]`` filter/smoother — the TPU-hostile tiny-matrix
layout that CLAUDE.md documents at up to 256× padding.  Sites in this model
are **f-space scalars at every time point**, and the emission row of a
(stationary) state-space kernel is time-invariant, so the whole mutable
state is two rank-1 ``[T]`` buffers; the posterior refresh is the channel
naturals route (prior-as-naturals + rank-1 site naturals → Schur-segment
UDU' → marginals), exactly the machinery of the CVI-DP channel loop.

Mirrors ``update_sites`` (variational_cvi.py:354-377) with the reference's
natural-parameter posterior assembly (variational_cvi.py:111-135), in f64
naturals / compute-dtype marginals.  Equivalence vs the generic model is
tested in ``tests/unit/test_cvi_packed.py``.

Restrictions (checked in :func:`pack_cvi`): single output dimension and a
time-invariant emission matrix — i.e. every stationary SDE kernel
(sde_kernel.py:43 ``generate_emission_model``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import chmat as cm
from .cvi import CVIGaussianProcess, GaussianSites
from .cvi_dp import _prior_nats_f64
from .cvi_dp_packed_ch import naturals_to_marginals_ch

__all__ = ["PackedCVIGPState", "pack_cvi", "unpack_cvi", "packed_site_step"]


class PackedCVIGPState(struct.PyTreeNode):
    """All mutable CVI state as rank-1 ``[T]`` arrays + the loop-invariant
    f64 prior-naturals channel cache (recomputed only when kernel
    hyperparameters change — cf. ``CVISitesSSM.prior_nats``)."""

    d_nat1: jnp.ndarray  # [T] f-space site θ₁, model dtype
    d_nat2: jnp.ndarray  # [T] f-space site θ₂ (diagonal)
    fx_mu: jnp.ndarray  # [T] cached posterior marginals of f
    fx_var: jnp.ndarray  # [T]
    p_nat1: tuple  # Vec channels [T], f64 under x64
    p_nat2d: tuple  # Mat channels [T]
    p_nat2s: tuple  # Mat channels [T-1]
    h: jnp.ndarray  # [d] time-invariant emission row, f64
    y: jnp.ndarray  # [T] observations


def _refresh_marginals(state: PackedCVIGPState, compute_dtype):
    """Posterior f-marginals from prior naturals + rank-1 site naturals.

    The natural-parameter twin of ``CVIGaussianProcess.dist_q``
    (variational_cvi.py:111-135 ``back_project_nats`` + banded
    ``naturals_to_ssm_params``): site θ back-projects through the emission
    row ``h`` as ``nat1 += h·θ₁``, ``nat2_diag += h hᵀ·θ₂``."""
    f64 = state.p_nat1[0].dtype
    d = len(state.p_nat1)
    th1 = state.d_nat1.astype(f64)
    th2 = state.d_nat2.astype(f64)
    h = state.h
    nat1 = tuple(state.p_nat1[i] + h[i] * th1 for i in range(d))
    nat2d = tuple(
        tuple(state.p_nat2d[i][j] + (h[i] * h[j]) * th2 for j in range(d))
        for i in range(d)
    )
    _, means, covs = naturals_to_marginals_ch(
        nat1, nat2d, state.p_nat2s, compute_dtype
    )
    h_c = h.astype(compute_dtype)
    fx_mu = sum(h_c[i] * means[i] for i in range(d))
    fx_var = sum(
        h_c[i] * h_c[j] * covs[i][j] for i in range(d) for j in range(d)
    )
    return state.replace(fx_mu=fx_mu, fx_var=fx_var)


def pack_cvi(model: CVIGaussianProcess) -> PackedCVIGPState:
    """Squeeze a single-output CVI model's mutable state into ``[T]``
    buffers (site caches refreshed to match the current sites)."""
    if model.observations.shape[-1] != 1:
        raise ValueError("packed CVI fast path requires a single output dim")
    if model.mean_function is not None:
        raise ValueError("packed CVI fast path requires mean_function=None")
    em = model._emission().emission_matrix  # [T, 1, d]
    h = em[0, 0]
    if not isinstance(em, jax.core.Tracer):
        if not np.allclose(np.asarray(em), np.asarray(em[:1])):
            raise ValueError(
                "packed CVI fast path requires a time-invariant emission"
            )
    p = _prior_nats_f64(model.dist_p)
    f64 = p.nat1.dtype
    state = PackedCVIGPState(
        d_nat1=model.sites.nat1[:, 0],
        d_nat2=model.sites.nat2[:, 0, 0],
        fx_mu=jnp.zeros_like(model.time_points),
        fx_var=jnp.ones_like(model.time_points),
        p_nat1=cm.vec_to_ch(p.nat1),
        p_nat2d=cm.mat_to_ch(p.nat2_diag),
        p_nat2s=cm.mat_to_ch(p.nat2_sub),
        h=h.astype(f64),
        y=model.observations[:, 0],
    )
    return _refresh_marginals(state, model.time_points.dtype)


def unpack_cvi(
    model: CVIGaussianProcess, state: PackedCVIGPState
) -> CVIGaussianProcess:
    """Restore packed sites into the API-shaped model (for ELBO /
    prediction through the standard machinery)."""
    return model.replace(
        sites=GaussianSites(
            nat1=state.d_nat1[:, None], nat2=state.d_nat2[:, None, None]
        )
    )


def packed_site_step(
    model: CVIGaussianProcess, state: PackedCVIGPState
) -> PackedCVIGPState:
    """One CVI site update on packed state: ``θ ← (1−ρ)θ + ρ·∇_η VE`` at
    the current posterior marginals, then the posterior refresh
    (variational_cvi.py:354-377 ≡ ``update_sites``).  ``model`` supplies
    static configuration only; its array fields are dead inputs."""
    dtype = model.time_points.dtype
    lr = model.learning_rate
    y = state.y[:, None]

    def ve_of_eta(eta1, eta2):
        mu = eta1
        var = eta2 - eta1**2
        return jnp.sum(
            model.likelihood.variational_expectations(
                mu[:, None], var[:, None], y
            )
        )

    m0 = state.fx_mu
    g1, g2 = jax.grad(ve_of_eta, argnums=(0, 1))(m0, state.fx_var + m0**2)
    state = state.replace(
        d_nat1=(1.0 - lr) * state.d_nat1 + lr * g1,
        d_nat2=(1.0 - lr) * state.d_nat2 + lr * g2,
    )
    return _refresh_marginals(state, dtype)
