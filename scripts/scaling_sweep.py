"""Scaling sweep: sharded-step throughput vs device count.

Runs the production sharded epoch (``parallel.step.make_sharded_epoch_fn``)
over meshes of {1, 2, 4, 8} devices and reports rays/s and scaling
efficiency vs the 1-device run (BASELINE.md north star: >=85% efficiency
1 chip -> 1 host -> 2 hosts).

With one real TPU chip available, the default run uses the 8-virtual-CPU
mesh (``--platform cpu``): the numbers validate the *plumbing* — sharding,
psum'd exact global loss, key folding — and exercise the identical code
path a pod would run; absolute CPU rays/s are meaningless and efficiency
is bounded by host-core contention.  On a real multi-chip slice the same
script measures the real curve (``--platform tpu``).

Strong scaling: the GLOBAL batch (n_rays) is fixed; each device renders
n_rays / n_data rays.

Usage: python scripts/scaling_sweep.py [--platform cpu] [--out docs/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--n-rays", type=int, default=1024)
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--log2-table", type=int, default=15)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--backward", default="take",
                   help="encoder backward: 'take' (pure XLA — the right "
                        "choice on the CPU mesh, where the Pallas kernel "
                        "would run in interpret mode and measure the "
                        "interpreter, not the collective layer) | 'bucket'")
    p.add_argument("--out", default=None, help="optional markdown report path")
    args = p.parse_args()

    if args.platform == "cpu":
        # this container pins jax_platforms via sitecustomize; the env var
        # alone is ignored — override through the config API (conftest.py)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
    from neuralvolumetricreconstructionformedicalimages_tpu.config import (
        load_config, with_defaults)
    from neuralvolumetricreconstructionformedicalimages_tpu.parallel.mesh import (
        MeshSpec, make_mesh)
    from neuralvolumetricreconstructionformedicalimages_tpu.parallel.step import (
        make_sharded_epoch_fn)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
        build_model, init_state)

    n_dev_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev_avail]
    print(f"devices available: {n_dev_avail} ({jax.devices()[0].platform})",
          file=sys.stderr)

    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["render"]["n_samples"] = args.n_samples
    cfg["train"]["n_rays"] = args.n_rays
    cfg["encoder"]["log2_hashmap_size"] = args.log2_table
    cfg["encoder"]["backward"] = args.backward

    n_views, H, W = 8, 64, 64
    geo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(W, H), dDetector=(0.002, 0.002),
        nVoxel=(64, 64, 64), dVoxel=(0.004, 0.004, 0.004), mode="cone")
    near, far = G.get_near_far(geo)
    angles = np.linspace(0, np.pi, n_views, endpoint=False).astype(np.float32)
    ro, rd = G.rays_for_angles(geo, angles)
    arrays = {
        "rays": G.pack_rays(ro, rd, near, far),
        "projs": jax.random.uniform(jax.random.key(0), (n_views, H, W)) * 0.1,
        "mask": jnp.ones((n_views, H, W), jnp.float32),
        "pools": jnp.broadcast_to(
            jnp.arange(H * W, dtype=jnp.int32), (n_views, H * W)),
        "pool_counts": jnp.full((n_views,), H * W, jnp.int32),
    }
    spec = build_model(cfg)
    view_order = jnp.asarray(
        np.arange(args.steps).reshape(-1, 1) % n_views, jnp.int32)

    rows = []
    base_rate = None
    for n in sizes:
        mesh = make_mesh(MeshSpec(data=n, sample=1))
        state = init_state(cfg, spec, args.steps, jax.random.key(1))
        epoch_fn = make_sharded_epoch_fn(
            cfg, spec, mesh, args.steps,
            n_rays=args.n_rays, n_batch=1, use_mask=False)
        # compile + warmup (state is donated — rebuild per timed run)
        state, losses = epoch_fn(state, arrays, view_order, jax.random.key(2))
        jax.block_until_ready(losses)

        times = []
        for i in range(3):
            t0 = time.perf_counter()
            state, losses = epoch_fn(state, arrays, view_order,
                                     jax.random.key(3 + i))
            jax.block_until_ready((state, losses))
            times.append(time.perf_counter() - t0)
        rate = args.steps * args.n_rays / min(times)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        rows.append({"devices": n, "rays_per_s": round(rate, 1),
                     "efficiency_vs_1dev": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            f.write("# Scaling sweep — sharded train step\n\n")
            f.write(f"Platform: {args.platform} ({n_dev_avail} devices); "
                    f"global batch {args.n_rays} rays x {args.n_samples} "
                    f"samples; 2^{args.log2_table} table; "
                    f"backward={args.backward}; "
                    f"{args.steps}-step scanned epochs, best of 3.\n\n")
            f.write("| devices | rays/s | efficiency vs 1 dev |\n|---|---|---|\n")
            for r in rows:
                f.write(f"| {r['devices']} | {r['rays_per_s']:,} | "
                        f"{r['efficiency_vs_1dev']:.1%} |\n")
            if args.platform == "cpu":
                f.write("\nCPU-mesh numbers validate plumbing only; all "
                        "virtual devices share the same host cores, so "
                        "efficiency is bounded by core contention, not the "
                        "collective layer.\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
