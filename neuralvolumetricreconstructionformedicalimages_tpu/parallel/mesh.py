"""Device-mesh construction and multi-host bring-up.

TPU-native module with no reference counterpart (the reference is
single-GPU, ``/root/reference/src/trainer.py`` has no process groups).
Axis convention:

- ``"data"``  — rays are sharded over this axis (data parallelism).
  Hash-table + MLP params stay replicated; gradients are ``pmean``-reduced
  over ICI inside the sharded step.
- ``"sample"`` — optional split of the per-ray depth-sample axis (the
  domain analogue of sequence parallelism, SURVEY.md §5): each shard
  integrates a contiguous z-range and partial line integrals are
  ``psum``-combined.  Worth enabling only when ``n_samples`` per ray
  exceeds per-core memory; rays-first sharding is the default.

Meshes are built with ``jax.make_mesh``, which lays the axes out over
ICI-contiguous device orderings automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Static mesh description, constructible from the ``parallel.mesh``
    config section (e.g. ``{"data": 4, "sample": 2}``)."""

    data: int = 1
    sample: int = 1

    @classmethod
    def from_config(cls, mesh_cfg: Optional[Dict[str, int]]) -> "MeshSpec":
        if not mesh_cfg:
            return cls()
        return cls(
            data=int(mesh_cfg.get(DATA_AXIS, 1)),
            sample=int(mesh_cfg.get(SAMPLE_AXIS, 1)),
        )

    @property
    def n_devices(self) -> int:
        return self.data * self.sample

    @property
    def axis_names(self) -> Sequence[str]:
        return (DATA_AXIS, SAMPLE_AXIS)


def make_mesh(spec: MeshSpec, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a named 2D mesh ``(data, sample)`` over the first
    ``spec.n_devices`` devices (all devices by default)."""
    if devices is None:
        devices = jax.devices()
    n = spec.n_devices
    if len(devices) < n:
        raise ValueError(
            f"mesh {spec} needs {n} devices, only {len(devices)} available"
        )
    if len(devices) == n:
        # Let JAX pick an ICI-contiguous layout for the full device set.
        return jax.make_mesh((spec.data, spec.sample), spec.axis_names)
    dev_array = np.asarray(devices[:n]).reshape(spec.data, spec.sample)
    return Mesh(dev_array, spec.axis_names)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize``.

    On TPU pods all arguments are auto-detected from the TPU metadata
    server; pass them explicitly for CPU/GPU clusters.  Call before any
    other JAX API.  After this, ``jax.devices()`` spans every host in the
    slice and a mesh built by :func:`make_mesh` places the ``data`` axis
    over ICI within a slice and DCN across slices.
    """
    # Idempotence check must NOT touch the backend (jax.process_count()
    # would initialize it, defeating the call-first contract).
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as exc:  # single-process run
        if coordinator_address is not None:
            raise
        # auto-detection failed -> single host; nothing to do.
        del exc


def local_batch_size(total: int, mesh: Mesh, axis: str = DATA_AXIS) -> int:
    """Per-shard batch size; ``total`` must divide evenly (static shapes)."""
    n = mesh.shape[axis]
    if total % n != 0:
        raise ValueError(f"batch size {total} not divisible by mesh axis {axis}={n}")
    return total // n
