"""vi_diffusion_processes_tpu — a TPU-native JAX framework for Markovian
Gaussian-process and diffusion-process variational inference.

Brand-new implementation of the capabilities of the
``AaltoML/vi-diffusion-processes`` Markovflow fork (see SURVEY.md), designed
around XLA/TPU: parallel associative scans over the time axis, batched small
matmuls, pure-function pytree models, whole training steps under one ``jit``.
"""
from . import config
from .ops.btd import BTD
from .ssm.state_space_model import StateSpaceModel, ssm_from_covariances

__version__ = "0.1.0"
