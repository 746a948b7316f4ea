"""Multi-chip / multi-host parallelism (TPU-native, no reference counterpart).

The reference is strictly single-GPU (SURVEY.md §2: no torch.distributed,
no NCCL/MPI anywhere).  This package is the TPU-native scale-out layer:
named device meshes over ICI/DCN, ``jax.shard_map`` training steps with
XLA collectives (``psum``/``pmean``), and ``jax.distributed`` multi-host
initialization.
"""

from .mesh import MeshSpec, make_mesh, initialize_multihost, local_batch_size
from .step import make_sharded_epoch_fn, make_sharded_train_step

__all__ = [
    "MeshSpec",
    "make_mesh",
    "initialize_multihost",
    "local_batch_size",
    "make_sharded_train_step",
    "make_sharded_epoch_fn",
]
