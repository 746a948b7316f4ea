"""Single-chip stand-ins for the multi-chip scaling axis (VERDICT r3 next-#8).

Real multi-chip hardware is unavailable in this container, so this measures
what CAN be measured on one chip:

1. ``shard_map`` overhead: the chest-scale train step run plain vs. run
   inside a mesh-of-1 ``shard_map`` (identical math — the mesh-of-1 path
   is bit-identical by construction, parallel/step.py key handling).  Any
   delta is the cost of the shard_map program structure itself.
2. The collective-traffic budget: bytes/step of the dense gradient psum
   (hash table + MLP) vs. v5e ICI bandwidth — the analytic ceiling on
   data-parallel scaling efficiency.

Also validates that compiled-Mosaic Pallas kernels pass check_vma=True on
the real chip (the CPU test mesh can only exercise the interpreter).

Committed output: docs/scaling_standin_r4.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_RAYS, N_SAMPLES, STEPS = 1024, 192, 8
N_VIEWS, H, W = 50, 256, 256


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[-1].ravel()[:1])


def main():
    from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
    from neuralvolumetricreconstructionformedicalimages_tpu.config import (
        load_config, with_defaults)
    from neuralvolumetricreconstructionformedicalimages_tpu.parallel.mesh import (
        MeshSpec, make_mesh)
    from neuralvolumetricreconstructionformedicalimages_tpu.parallel.step import (
        _check_vma, make_sharded_epoch_fn)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
        build_model, init_state, make_epoch_fn)

    print(f"backend={jax.default_backend()}", flush=True)
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
    arrays = {
        "rays": G.pack_rays(ro, rd, near, far),
        "projs": jax.random.uniform(jax.random.key(0), (N_VIEWS, H, W)) * 0.1,
        "mask": jnp.ones((N_VIEWS, H, W), jnp.float32),
        "pools": jnp.broadcast_to(
            jnp.arange(H * W, dtype=jnp.int32), (N_VIEWS, H * W)),
        "pool_counts": jnp.full((N_VIEWS,), H * W, jnp.int32),
    }
    spec = build_model(cfg)
    view_order = jnp.asarray(
        np.arange(STEPS).reshape(-1, 1) % N_VIEWS, jnp.int32)

    def measure(epoch_fn, tag):
        state = init_state(cfg, spec, STEPS, jax.random.key(1))
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, arrays, view_order, jax.random.key(2))
        fence(losses)
        warm = time.perf_counter() - t0
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            state, losses = epoch_fn(state, arrays, view_order,
                                     jax.random.key(3 + i))
            fence(losses)
            fence(state["params"]["coarse"]["layers"][-1]["b"])
            ts.append(time.perf_counter() - t0)
        best = min(ts) / STEPS
        print(f"{tag}: {best*1e3:.2f} ms/step ({N_RAYS/best:,.0f} rays/s) "
              f"warm {warm:.1f}s", flush=True)
        return best

    plain_fn = make_epoch_fn(cfg, spec, STEPS, N_RAYS, n_batch=1,
                             use_mask=False)
    t_plain = measure(plain_fn, "plain step")

    mesh = make_mesh(MeshSpec(data=1, sample=1), devices=jax.devices()[:1])
    print(f"check_vma on this backend: {_check_vma(spec)}", flush=True)
    sharded_fn = make_sharded_epoch_fn(
        cfg, spec, mesh, STEPS, n_rays=N_RAYS, n_batch=1, use_mask=False)
    t_mesh = measure(sharded_fn, "mesh-of-1 shard_map step")

    ovh = (t_mesh - t_plain) * 1e3
    print(f"shard_map overhead: {ovh:+.2f} ms/step "
          f"({ovh / (t_plain * 10):+.1f}% of the plain step)", flush=True)

    # collective-traffic budget (analytic)
    params = init_state(cfg, spec, STEPS, jax.random.key(1))["params"]
    n_par = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(params))
    grad_mb = n_par * 4 / 2**20
    # v5e ICI: 1,600 Gbit/s visible per chip (2x ring links); all-reduce
    # moves ~2x the payload for large rings
    ici_GBps = 1600 / 8
    t_ar = 2 * grad_mb / 1024 / ici_GBps * 1e3
    print(f"dense grad psum payload: {grad_mb:.1f} MB/step "
          f"-> ~{t_ar:.2f} ms ring all-reduce at v5e ICI {ici_GBps:.0f} GB/s",
          flush=True)
    print(f"overlap budget: step compute {t_plain*1e3:.1f} ms vs all-reduce "
          f"{t_ar:.2f} ms -> DP scaling efficiency bound "
          f"{t_plain*1e3 / (t_plain*1e3 + t_ar) * 100:.1f}% worst-case "
          "(no overlap), ~100% with XLA's grad/collective overlap",
          flush=True)


if __name__ == "__main__":
    main()
