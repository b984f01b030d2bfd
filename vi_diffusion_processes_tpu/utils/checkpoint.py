"""Checkpoint/resume for model pytrees.

The reference only saves final artifacts with ``np.savez``
(docs/diffusion_processes/cvi_dp.py:140-155) and has no mid-training resume
(SURVEY.md §5).  Here every model *is* a pytree, so orbax gives durable
mid-training checkpoints for free; a NumPy ``.npz`` fallback keeps the
reference's artifact format available.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "save_npz_artifacts"]


def save_checkpoint(path: str, pytree: Any) -> None:
    """Durable checkpoint of any model/trainer pytree (orbax)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, pytree, force=True)
    checkpointer.wait_until_finished()


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (same pytree/shapes)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(path, template)


def save_npz_artifacts(path: str, **arrays) -> None:
    """Reference-compatible final artifacts (cvi_dp.py:140-155):
    posterior marginals, ELBO traces, site naturals, learned params."""
    flat = {}
    for name, value in arrays.items():
        leaves, _ = jax.tree_util.tree_flatten(value)
        if len(leaves) == 1 and name not in flat:
            flat[name] = np.asarray(leaves[0])
        else:
            for i, leaf in enumerate(leaves):
                flat[f"{name}_{i}"] = np.asarray(leaf)
    np.savez(path, **flat)
