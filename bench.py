"""Benchmark: training throughput (rays/s, fwd+bwd+Adam) on one chip.

Workload matches the reference hot path at chest_50 scale (SURVEY.md §6 /
BASELINE.md): 1,024 rays x 192 samples/ray per optimizer step, 16-level
2^19-entry hash grid (level_dim 2), 4x32 skip MLP, masked-MSE loss, Adam.
The timed region is a scanned block of full optimizer steps — render
forward, backward through the hash gather, gradient update — exactly what
the reference's `train_step` (src/trainer.py:134-142) does 1 step at a
time.

Baseline for ``vs_baseline``: the reference publishes no numbers
(BASELINE.md), so we use the NAF paper's reported single-RTX-3090
training envelope ("10-40 min per scene", arXiv:2209.14540) at the chest
workload: 1,500 epochs x 50 steps x 1,024 rays / 15 min ≈ 85,000 rays/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.config import load_config, with_defaults
from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
    build_model,
    init_state,
    make_epoch_fn,
)

REFERENCE_RAYS_PER_S = 85_000.0  # see module docstring

N_RAYS = 1024
N_SAMPLES = 192
STEPS_PER_BLOCK = 50
N_VIEWS, H, W = 50, 256, 256


def build_workload():
    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["render"]["n_samples"] = N_SAMPLES
    cfg["train"]["n_rays"] = N_RAYS

    geo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(W, H), dDetector=(0.002, 0.002),
        nVoxel=(128, 128, 128), dVoxel=(0.002, 0.002, 0.002), mode="cone",
    )
    near, far = G.get_near_far(geo)
    angles = np.linspace(0, np.pi, N_VIEWS, endpoint=False).astype(np.float32)
    ro, rd = G.rays_for_angles(geo, angles)
    key = jax.random.key(0)
    arrays = {
        "rays": G.pack_rays(ro, rd, near, far),
        "projs": jax.random.uniform(key, (N_VIEWS, H, W)) * 0.1,
        "mask": jnp.ones((N_VIEWS, H, W), jnp.float32),
        "pools": jnp.broadcast_to(
            jnp.arange(H * W, dtype=jnp.int32), (N_VIEWS, H * W)
        ),
        "pool_counts": jnp.full((N_VIEWS,), H * W, jnp.int32),
    }

    spec = build_model(cfg)
    state = init_state(cfg, spec, steps_per_epoch=STEPS_PER_BLOCK,
                       key=jax.random.key(1))
    epoch_fn = make_epoch_fn(cfg, spec, STEPS_PER_BLOCK, N_RAYS,
                             n_batch=1, use_mask=False)
    view_order = jnp.asarray(
        np.arange(STEPS_PER_BLOCK).reshape(-1, 1) % N_VIEWS, jnp.int32)
    return epoch_fn, state, arrays, view_order


def _fence(state, losses) -> float:
    """Force completion with a tiny device->host transfer.

    On the remote-TPU (axon) platform ``jax.block_until_ready`` returns
    before execution finishes, so timing must be fenced by materializing a
    value that depends on the full computation: the per-step losses and one
    parameter leaf from the final optimizer state.
    """
    tail = float(jnp.sum(losses))
    tail += float(jnp.sum(state["params"]["coarse"]["layers"][-1]["b"]))
    return tail


def main():
    epoch_fn, state, arrays, view_order = build_workload()

    # warmup / compile
    state, losses = epoch_fn(state, arrays, view_order, jax.random.key(10))
    _fence(state, losses)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, arrays, view_order, jax.random.key(20 + i))
        _fence(state, losses)
        times.append(time.perf_counter() - t0)

    best = min(times)
    rays_per_s = STEPS_PER_BLOCK * N_RAYS / best
    print(json.dumps({
        "metric": "train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s (fwd+bwd+adam, 192 samples/ray)",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
