"""Rays/s vs batch size on the real chip (VERDICT r3 next-#1a).

Measures the chest_50-scale full optimizer step (fwd+bwd+Adam, 192
samples/ray, 16x2^19x2 table) at n_rays in {1024, 2048, 4096, 8192} in two
harnesses:

- ``iso``: the isolated jitted step with a fixed ray batch (matches
  scripts/profile_step.py B4) — pure compute.
- ``epoch``: the scanned-epoch step exactly as bench.py times it
  (per-step gather_view_batch view sampling + PRNG + lax.scan) — what the
  driver's bench records.

The iso-vs-epoch delta at each batch explains the r3 bench(72.5ms) vs
profile(55.4ms) gap; the batch curve quantifies fixed-cost amortization
(rolled-table build + adjoint rolls + kernel table-shaped output are all
batch-independent).  ``--dtypes`` adds the bf16 rolled-table variant.

Self-terminating: deadline checked between dispatches only.
Results committed in docs/batch_scaling_r4.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_SAMPLES = 192
N_VIEWS, H, W = 50, 256, 256


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[-1].ravel()[:1])


def build(n_rays: int, table_dtype: str, steps: int):
    from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
    from neuralvolumetricreconstructionformedicalimages_tpu.config import (
        load_config, with_defaults)
    from neuralvolumetricreconstructionformedicalimages_tpu.losses import masked_mse
    from neuralvolumetricreconstructionformedicalimages_tpu.render import render_rays
    from neuralvolumetricreconstructionformedicalimages_tpu.train.optim import (
        make_optimizer)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
        build_model, init_state, make_epoch_fn)

    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["render"]["n_samples"] = N_SAMPLES
    cfg["train"]["n_rays"] = n_rays
    cfg["encoder"]["table_dtype"] = table_dtype

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
            jnp.arange(H * W, dtype=jnp.int32), (N_VIEWS, H * W)),
        "pool_counts": jnp.full((N_VIEWS,), H * W, jnp.int32),
    }

    spec = build_model(cfg)
    state = init_state(cfg, spec, steps_per_epoch=steps, key=jax.random.key(1))
    epoch_fn = make_epoch_fn(cfg, spec, steps, n_rays, n_batch=1, use_mask=False)
    view_order = jnp.asarray(
        np.arange(steps).reshape(-1, 1) % N_VIEWS, jnp.int32)

    # isolated step: fixed rays, scanned ``steps`` times with live leaves
    params = state["params"]
    opt = make_optimizer(cfg, steps)
    rays = arrays["rays"].reshape(-1, 8)[:n_rays]
    target = jax.random.uniform(jax.random.key(2), (n_rays,)) * 0.1

    def loss(p, r):
        out = render_rays(r, p["coarse"], spec, n_samples=N_SAMPLES,
                          perturb=False, key=None)
        return masked_mse(out["acc"], target, None)

    g = jax.grad(loss)

    def one(p_ost, r):
        p, ost = p_ost
        gr = g(p, r)
        upd, ost = opt.update(gr, ost, p)
        import optax
        return optax.apply_updates(p, upd), ost

    @jax.jit
    def iso_block(p, ost, r):
        def body(c, _):
            return one(c, r), None
        (p, ost), _ = jax.lax.scan(body, (p, ost), None, length=steps)
        return p, ost

    return epoch_fn, state, arrays, view_order, iso_block, params, rays


def child(n_rays: int, dtype: str, steps: int, deadline_s: float):
    """Measure ONE config in this (fresh) process; print a JSON line."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t_end = time.time() + deadline_s

    (epoch_fn, state, arrays, view_order, iso_block, params,
     rays) = build(n_rays, dtype, steps)
    # epoch_fn donates its state arg — keep copies for the iso run
    p, ost = jax.tree.map(jnp.copy, (state["params"], state["opt_state"]))

    # epoch-style (bench harness)
    st = state
    t0 = time.perf_counter()
    st, losses = epoch_fn(st, arrays, view_order, jax.random.key(3))
    fence(losses)
    warm = time.perf_counter() - t0
    ep = []
    for i in range(3):
        if time.time() > t_end:
            break
        t0 = time.perf_counter()
        st, losses = epoch_fn(st, arrays, view_order, jax.random.key(4 + i))
        fence(losses)
        fence(st["params"]["coarse"]["layers"][-1]["b"])
        ep.append(time.perf_counter() - t0)
    t_epoch = min(ep) / steps if ep else float("nan")

    # isolated step
    t0 = time.perf_counter()
    p2, ost2 = iso_block(p, ost, rays)
    fence(p2["coarse"]["layers"][-1]["b"])
    iso = []
    for i in range(3):
        if time.time() > t_end:
            break
        t0 = time.perf_counter()
        p2, ost2 = iso_block(p2, ost2, rays)
        fence(p2["coarse"]["layers"][-1]["b"])
        iso.append(time.perf_counter() - t0)
    t_iso = min(iso) / steps if iso else float("nan")

    rec = {
        "n_rays": n_rays, "table_dtype": dtype,
        "iso_ms": round(t_iso * 1e3, 2),
        "iso_rays_s": round(n_rays / t_iso, 0),
        "epoch_ms": round(t_epoch * 1e3, 2),
        "epoch_rays_s": round(n_rays / t_epoch, 0),
        "warm_s": round(warm, 1),
    }
    print("SWEEPREC " + json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,2048,4096,8192")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--deadline", type=float, default=1500.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--child", default=None, help="internal: 'n_rays,dtype'")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.child:
        n, d = args.child.split(",")
        child(int(n), d, args.steps, args.deadline)
        return

    # Parent: one FRESH subprocess per config — cross-config HBM allocator
    # state / fragmentation in a shared process skews measurements (first
    # in-process sweep measured 87 ms for a step that profiles at 55 ms).
    # Children are never killed (wedge policy); they self-terminate.
    import subprocess
    t_end = time.time() + args.deadline
    for dtype in args.dtypes.split(","):
        for n_rays in [int(b) for b in args.batches.split(",")]:
            remaining = t_end - time.time()
            if remaining < 60:
                print("[sweep] deadline — stopping", flush=True)
                return
            print(f"[sweep] {time.strftime('%H:%M:%S')} spawn n_rays={n_rays} "
                  f"table={dtype}", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", f"{n_rays},{dtype}",
                 "--steps", str(args.steps),
                 "--deadline", str(min(remaining - 30, 400.0))],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )


if __name__ == "__main__":
    main()
