"""Serving export: freeze a jitted model function into a StableHLO artifact.

The reference has no serving story (single-process TF scripts).  For
production TPU deployment the natural JAX mechanism is ``jax.export``: the
function is traced once, serialized as versioned StableHLO, and can be
reloaded and executed (or embedded in a C++ PJRT server) WITHOUT the Python
model code — the artifact pins shapes, dtypes, and sharding.

Typical use::

    model = GaussianProcessRegression(...)
    artifact = export_jittable(
        lambda tn: model.posterior.predict_f(tn),
        jax.ShapeDtypeStruct((128,), jnp.float64),
    )
    save_artifact(artifact, "gpr_predict.stablehlo")
    ...
    predict = load_artifact("gpr_predict.stablehlo")
    f_mu, f_var = predict(new_times)        # no model object needed
"""
from __future__ import annotations

import pathlib
from typing import Callable, Union

import jax
from jax import export as _export

__all__ = ["export_jittable", "save_artifact", "load_artifact"]


def export_jittable(fn: Callable, *arg_specs, platforms=None) -> bytes:
    """Trace ``fn`` at the given ``jax.ShapeDtypeStruct`` specs and return
    the serialized StableHLO artifact (bytes).

    Artifacts are pinned to the lowering platform(s); pass e.g.
    ``platforms=("tpu",)`` (or ``("cpu", "tpu")`` for a multi-platform
    artifact) to serve somewhere other than the exporting backend —
    loading on a mismatched backend raises a clear ValueError.
    """
    exported = _export.export(jax.jit(fn), platforms=platforms)(*arg_specs)
    return exported.serialize()

def save_artifact(artifact: bytes, path: Union[str, pathlib.Path]) -> None:
    pathlib.Path(path).write_bytes(artifact)


def load_artifact(source: Union[bytes, str, pathlib.Path]) -> Callable:
    """Deserialize an artifact (bytes or file path) into a callable that
    runs the frozen computation on the current backend."""
    if not isinstance(source, bytes):
        source = pathlib.Path(source).read_bytes()
    exported = _export.deserialize(source)
    return lambda *args: exported.call(*args)
