"""Natural-gradient optimizer for Gauss–Markov variational distributions.

Equivalent of markovflow/ssm_natgrad.py:33 (``SSMNaturalGradient``).  The
reference computes ``∂L/∂η`` with a persistent GradientTape and the
``output_gradients`` chain-rule trick through ``expectations_to_ssm_params``
(ssm_natgrad.py:142-174).  In JAX the same map is a clean vjp composition:

    ``dL/dη = vjp(expectations_to_ssm_params, η)(dL/d ssm_params)``

and the update is the mirror-descent step in natural coordinates

    ``θ ← θ − γ · dL/dη``,  ``ssm ← naturals_to_ssm(θ)``.

Exactness property (tested): for a conjugate model, ONE step with γ=1 lands
exactly on the optimal posterior (tests/integration/test_ssm_natgrad.py:46
of the reference).

The whole step — loss grad, three parameter transforms, UDU' recovery — is
one pure function, jittable end to end.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ssm.state_space_model import StateSpaceModel
from ..ssm.transforms import (
    expectations_to_ssm_params,
    naturals_to_ssm,
    ssm_to_expectations,
    ssm_to_naturals,
)

__all__ = ["NaturalGradientState", "natgrad_init", "natgrad_step"]


class NaturalGradientState(NamedTuple):
    """Adam-style debiased momentum on natural gradients
    (ssm_natgrad.py:34-58)."""

    momentum: tuple  # EMA of dL/dη (three leaves, θ-shaped)
    step: jnp.ndarray


def natgrad_init(ssm: StateSpaceModel) -> NaturalGradientState:
    thetas = ssm_to_naturals(ssm)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, thetas)
    return NaturalGradientState(momentum=zeros, step=jnp.zeros((), jnp.int32))


def _ssm_params_tuple(ssm: StateSpaceModel):
    return (
        ssm.state_transitions,
        ssm.state_offsets,
        ssm.chol_initial_covariance,
        ssm.chol_process_covariances,
        ssm.initial_mean,
    )


def _ssm_from_params_tuple(params) -> StateSpaceModel:
    a_s, offsets, chol_p0, chol_qs, mu0 = params
    return StateSpaceModel(mu0, chol_p0, a_s, offsets, chol_qs)


def natgrad_step(
    loss_fn: Callable[[StateSpaceModel], jnp.ndarray],
    ssm: StateSpaceModel,
    gamma: float = 1.0,
    state: Optional[NaturalGradientState] = None,
    beta: float = 0.9,
):
    """One natural-gradient step on ``loss_fn`` (ssm_natgrad.py:95-218).

    Returns ``(new_ssm, new_state, loss_value)``; pass ``state=None`` for
    plain (momentum-free) natgrad.
    """
    loss_value, dl_dssm = jax.value_and_grad(
        lambda params: loss_fn(_ssm_from_params_tuple(params))
    )(_ssm_params_tuple(ssm))

    etas = ssm_to_expectations(ssm)
    _, vjp_fn = jax.vjp(lambda e1, e2, e3: expectations_to_ssm_params(e1, e2, e3), *etas)
    dl_deta = vjp_fn(dl_dssm)

    thetas = ssm_to_naturals(ssm)

    if state is None:
        new_thetas = jax.tree_util.tree_map(
            lambda th, g: th - gamma * g, thetas, dl_deta
        )
        new_state = None
    else:
        new_mom = jax.tree_util.tree_map(
            lambda m, g: beta * m + (1.0 - beta) * g, state.momentum, dl_deta
        )
        step = state.step + 1
        debias = 1.0 - beta ** step.astype(thetas[0].dtype)
        new_thetas = jax.tree_util.tree_map(
            lambda th, m: th - gamma * m / debias, thetas, new_mom
        )
        new_state = NaturalGradientState(momentum=new_mom, step=step)

    new_ssm = naturals_to_ssm(*new_thetas)
    return new_ssm, new_state, loss_value
