"""Training loops for the diffusion-process models.

Equivalents of the reference experiment trainers
(docs/diffusion_processes/cvi_dp_trainer.py:19 ``CVISitesTrainer`` and
vi_markov_gp_trainer.py:17 ``VIMarkovGPTrainer``) — the de-facto ``train()``
of CVI-DP and VDP.  The numerical stabilizers are ported: learning-rate
decay on ELBO decrease (cvi_dp_trainer.py:84-87), zigzag/convergence
detection (:166-185), warmup steps for VDP (vi_markov_gp_trainer.py:100-104).

The per-iteration step functions are jitted once; the outer control flow
(lr schedules, convergence checks) stays in Python — it is data-dependent
and cheap.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp
import optax

from ..models.cvi_dp import CVISitesSDE, CVISitesSSM
from ..models.vdp import VariationalMarkovGP

__all__ = ["CVISitesTrainer", "VDPTrainer"]


@dataclass
class CVISitesTrainer:
    """Alternating site-update / re-linearization / drift-learning loop
    (cvi_dp_trainer.py:19-250)."""

    model: CVISitesSSM
    sites_lr: float = 0.5
    prior_sde_lr: float = 0.01
    max_inner_iters: int = 20
    max_outer_iters: int = 10
    elbo_tol: float = 1e-4
    lr_decay: float = 0.5
    learn_prior_sde: bool = False
    #: run the inner site loop on the structure-of-scalars packed state
    #: (models/cvi_dp_packed*) — the TPU layout fast path.  Auto-disabled
    #: when the model is not an SDE-CVI or d > 8.
    use_packed: bool = True
    elbo_trace: List[float] = field(default_factory=list)

    def __post_init__(self):
        self._site_step = jax.jit(
            lambda m, lr: m.update_data_sites(lr).update_girsanov_sites(lr)
        )
        self._elbo = jax.jit(lambda m: m.classic_elbo())
        self._packed = None
        if (
            self.use_packed
            and isinstance(self.model, CVISitesSDE)
            and self.model.state_dim <= 8
        ):
            if self.model.state_dim == 1:
                from ..models.cvi_dp_packed import (
                    pack_state,
                    packed_elbo,
                    packed_natgrad_step,
                    unpack_state,
                )

                self._packed = (pack_state, unpack_state,
                                jax.jit(packed_natgrad_step), jax.jit(packed_elbo))
            else:
                from ..models.cvi_dp_packed_ch import (
                    pack_state_ch,
                    packed_elbo_ch,
                    packed_natgrad_step_ch,
                    unpack_state_ch,
                )

                self._packed = (pack_state_ch, unpack_state_ch,
                                jax.jit(packed_natgrad_step_ch), jax.jit(packed_elbo_ch))
        if self.learn_prior_sde:
            self._prior_opt = optax.adam(self.prior_sde_lr)
            self._prior_opt_state = self._prior_opt.init(self.model.prior_sde)

    # ------------------------------------------------------------- inner loop
    def optimize_sites(self) -> float:
        """Inner loop: site updates with lr decay on ELBO decrease
        (cvi_dp_trainer.py:63-95).  Runs on the packed state when
        available (same updates, rank-1 buffers)."""
        lr = self.sites_lr
        if self._packed is not None:
            pack, unpack, pstep, pelbo = self._packed
            state = pack(self.model)
            prev = float(pelbo(self.model, state))
            for _ in range(self.max_inner_iters):
                cand, elbo_arr = pstep(self.model, state, lr)
                elbo = float(elbo_arr)
                if jnp.isnan(elbo) or elbo < prev - abs(prev) * 1e-6:
                    lr *= self.lr_decay
                    if lr < 1e-4:
                        break
                    continue
                state = cand
                self.elbo_trace.append(elbo)
                if abs(elbo - prev) < self.elbo_tol:
                    prev = elbo
                    break
                prev = elbo
            self.model = unpack(self.model, state)
            return prev
        prev = float(self._elbo(self.model))
        for _ in range(self.max_inner_iters):
            candidate = self._site_step(self.model, lr)
            elbo = float(self._elbo(candidate))
            if jnp.isnan(elbo) or elbo < prev - abs(prev) * 1e-6:
                lr *= self.lr_decay  # ELBO went down: decay and retry
                if lr < 1e-4:
                    break
                continue
            self.model = candidate
            self.elbo_trace.append(elbo)
            if abs(elbo - prev) < self.elbo_tol:
                prev = elbo
                break
            prev = elbo
        return prev

    # ------------------------------------------------------------- outer loop
    def perform_inference(self) -> float:
        """Outer loop: optimize sites, re-linearize + re-base Girsanov sites
        (cvi_dp_trainer.py:97-136)."""
        elbo = self.optimize_sites()
        if isinstance(self.model, CVISitesSDE):
            self.model = self.model.relinearize()
        return elbo

    def optimize_prior_sde(self) -> None:
        """Adam on ``∇(KL + −VE)`` wrt the prior SDE parameters
        (cvi_dp_trainer.py:207-234)."""
        assert isinstance(self.model, CVISitesSDE)
        g_kl = self.model.grad_kl_wrt_prior_params()
        g_ve = self.model.grad_ve_wrt_prior_params()
        grads = jax.tree_util.tree_map(lambda a, b: a + b, g_kl, g_ve)
        updates, self._prior_opt_state = self._prior_opt.update(
            grads, self._prior_opt_state
        )
        new_sde = optax.apply_updates(self.model.prior_sde, updates)
        self.model = self.model.replace(prior_sde=new_sde).set_linearized_prior()

    def optimize(self) -> List[float]:
        """Alternate inference and (optional) prior learning with zigzag
        detection (cvi_dp_trainer.py:138-185)."""
        elbos = []
        for _ in range(self.max_outer_iters):
            elbo = self.perform_inference()
            if self.learn_prior_sde:
                self.optimize_prior_sde()
            elbos.append(elbo)
            if len(elbos) >= 3:
                # zigzag: successive changes of alternating sign & small size
                d1, d2 = elbos[-1] - elbos[-2], elbos[-2] - elbos[-3]
                if abs(d1) < self.elbo_tol and abs(d2) < self.elbo_tol:
                    break
        return elbos


@dataclass
class VDPTrainer:
    """VDP fixed-point loop with warmup (vi_markov_gp_trainer.py:17-219)."""

    model: VariationalMarkovGP
    lr: float = 0.05
    x0_lr: float = 0.05
    warmup_steps: int = 20
    warmup_lr: float = 1e-6
    max_iters: int = 200
    elbo_tol: float = 1e-4
    lr_decay: float = 0.5
    prior_sde_lr: float = 0.01
    learn_prior_sde: bool = False
    elbo_trace: List[float] = field(default_factory=list)

    def __post_init__(self):
        # d=1 models run on the packed (structure-of-scalars) hot loop —
        # rank-1 buffers only, equivalence-tested vs the generic step
        # (models/vdp_packed.py, tests/unit/test_vdp_packed.py).  Both
        # paths share a (model, carry) interface: the carry is the packed
        # state when d=1, the model pytree itself otherwise.
        self._packed = self.model.state_dim == 1
        if self._packed:
            from ..models.vdp_packed import packed_inference_step, packed_vdp_elbo

            self._step = jax.jit(
                lambda m, s, lr, x0_lr: packed_inference_step(m, s, lr, x0_lr)
            )
            self._elbo = jax.jit(packed_vdp_elbo)
        else:
            self._step = jax.jit(lambda m, s, lr, x0_lr: s.inference_step(lr, x0_lr))
            self._elbo = jax.jit(lambda m, s: s.elbo())
        if self.learn_prior_sde:
            self._prior_opt = optax.adam(self.prior_sde_lr)
            self._prior_opt_state = self._prior_opt.init(self.model.prior_sde)

    def perform_inference(self) -> float:
        if self._packed:
            from ..models.vdp_packed import pack_vdp, unpack_vdp

            carry = pack_vdp(self.model)
        else:
            carry = self.model
        # warmup at tiny lr (vi_markov_gp_trainer.py:100-104)
        for _ in range(self.warmup_steps):
            carry = self._step(self.model, carry, self.warmup_lr, 0.0)
        lr = self.lr
        prev = float(self._elbo(self.model, carry))
        for _ in range(self.max_iters):
            candidate = self._step(self.model, carry, lr, self.x0_lr)
            elbo = float(self._elbo(self.model, candidate))
            if jnp.isnan(elbo):
                # revert and shrink the step (vi_markov_gp_trainer lr decay)
                lr *= self.lr_decay
                if lr < 1e-7:
                    break
                continue
            if elbo < prev - abs(prev) * 1e-6:
                # accept but damp — VDP fixed-point steps transiently
                # decrease the ELBO (the reference keeps iterating too)
                lr = max(lr * self.lr_decay, 1e-4)
            carry = candidate
            self.elbo_trace.append(elbo)
            if abs(elbo - prev) < self.elbo_tol:
                prev = elbo
                break
            prev = elbo
        self.model = unpack_vdp(self.model, carry) if self._packed else carry
        return prev

    def optimize_prior_sde(self) -> None:
        """Adam on ``∂E_sde/∂θ_p`` (vi_markov_gp_trainer.py:163-201)."""
        grads = self.model.grad_prior_sde_params()
        updates, self._prior_opt_state = self._prior_opt.update(
            grads, self._prior_opt_state
        )
        new_sde = optax.apply_updates(self.model.prior_sde, updates)
        self.model = self.model.replace(prior_sde=new_sde)

    def optimize(self, n_rounds: int = 5) -> List[float]:
        elbos = []
        for _ in range(n_rounds):
            elbos.append(self.perform_inference())
            if self.learn_prior_sde:
                self.optimize_prior_sde()
        return elbos
