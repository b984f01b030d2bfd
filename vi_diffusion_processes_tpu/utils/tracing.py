"""Profiling / tracing hooks.

The reference gates TensorFlow name-scoping behind the ``AUTO_NAMESCOPE``
env var (markovflow/base.py:51-61, utils.py:31-73) for TensorBoard graph
debugging.  The JAX analogues: ``jax.named_scope`` annotations (visible in
XLA HLO and profiler traces) and ``jax.profiler`` trace capture.
"""
from __future__ import annotations

import contextlib
import functools
import os

import jax

__all__ = ["AUTO_NAMESCOPE", "named_scope_fn", "trace_to", "annotate"]

#: mirrors markovflow/base.py:51 — opt-in annotation of library functions
AUTO_NAMESCOPE = os.environ.get("AUTO_NAMESCOPE", "").lower() in ("1", "true")


def named_scope_fn(fn):
    """Decorator: wrap a function in a ``jax.named_scope`` with its name
    (equivalent of utils.py:51 ``tf_scope_fn_decorator``)."""
    if not AUTO_NAMESCOPE:
        return fn

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.named_scope(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapped


def annotate(name: str):
    """Context manager: profiler/HLO annotation for a region."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a profiler trace of the enclosed block (open with XProf/
    TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
