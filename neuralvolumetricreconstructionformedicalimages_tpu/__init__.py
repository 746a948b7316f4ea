"""TPU-native neural volumetric reconstruction for medical images.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference pipeline (laminography-adapted NAF: hash-grid encoder + MLP
attenuation field fitted through a differentiable Beer-Lambert
line-integral renderer), re-designed TPU-first:

- pure-functional models (pytrees) + fully jitted train/eval steps
- Pallas hash-grid encoder kernel (VMEM-resident per-level tables)
- deterministic scatter-add backward (semantic upgrade over the
  reference's CUDA ``atomicAdd`` nondeterminism)
- SPMD scale-out over a ``jax.sharding.Mesh`` (rays = data axis,
  samples-per-ray = "sequence" axis) with XLA collectives

Import alias: ``import neuralvolumetricreconstructionformedicalimages_tpu as nvr``
"""

__version__ = "0.1.0"

from . import config
from . import geometry

__all__ = ["config", "geometry", "__version__"]
