"""Ablation profile of the chest_50-scale train step on the real chip.

Times each pipeline stage in isolation to locate the bottleneck:
  1. encoder forward (hash gather) only
  2. full field forward (encode + MLP)
  3. render forward (sampling + field + integration)
  4. loss fwd+bwd (adds the hash-table scatter-add backward)
  5. full optimizer step (adds dense Adam over the 16.8M-entry table)

Run:  python scripts/profile_step.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.config import load_config, with_defaults
from neuralvolumetricreconstructionformedicalimages_tpu.losses import masked_mse
from neuralvolumetricreconstructionformedicalimages_tpu.render import render_rays
from neuralvolumetricreconstructionformedicalimages_tpu.train.optim import make_optimizer
from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import build_model, init_state

N_RAYS, N_SAMPLES, REPS = 1024, 192, 20


def timed(name, fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])  # fence
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
        times.append(time.perf_counter() - t0)
    per_call = min(times) / REPS
    print(f"{name:34s} {per_call*1e3:8.3f} ms/step  "
          f"({N_RAYS/per_call:,.0f} rays/s)")
    return per_call


def main():
    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["render"]["n_samples"] = N_SAMPLES
    spec = build_model(cfg)
    state = init_state(cfg, spec, steps_per_epoch=50, key=jax.random.key(0))
    params = state["params"]["coarse"]
    opt = make_optimizer(cfg, 50)

    geo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(256, 256), dDetector=(0.002, 0.002),
        nVoxel=(128, 128, 128), dVoxel=(0.002, 0.002, 0.002), mode="cone",
    )
    near, far = G.get_near_far(geo)
    ro, rd = G.rays_for_angle(geo, 0.7)
    rays = G.pack_rays(ro, rd, near, far).reshape(-1, 8)[: N_RAYS]
    target = jax.random.uniform(jax.random.key(1), (N_RAYS,)) * 0.1

    pts = (rays[:, None, :3] + rays[:, None, 3:6]
           * jnp.linspace(near, far, N_SAMPLES)[None, :, None]).reshape(-1, 3)

    def rep(fn):
        """Repeat a traced fn REPS times with a data dependency chain."""
        def body(c, _):
            o = fn(c)
            # fold a scalar back in so scan iterations can't be collapsed
            return c + jax.tree_util.tree_leaves(o)[-1].ravel()[0] * 0.0, None

        @jax.jit
        def run(x):
            y, _ = jax.lax.scan(body, x, None, length=REPS)
            return y
        return run

    # 1. encoder only
    enc = spec.encoder
    timed("encoder fwd (gather)", rep(lambda p: enc.apply(params["encoder"], p, spec.bound)), pts)

    # 2. field forward
    timed("field fwd (encode+mlp)", rep(lambda p: spec.apply(params, p)), pts)

    # 3. render forward
    timed("render fwd", rep(lambda r: render_rays(
        r, params, spec, n_samples=N_SAMPLES, perturb=False, key=None)["acc"]), rays)

    # 4. loss fwd+bwd
    def loss(p, r):
        out = render_rays(r, p, spec, n_samples=N_SAMPLES, perturb=False, key=None)
        return masked_mse(out["acc"], target, None)

    g = jax.grad(loss)

    def gstep(r):
        gr = g(params, r)
        return gr

    timed("fwd+bwd (adds scatter-add)", rep(gstep), rays)

    # 5. full optimizer step
    def full(r):
        gr = g(params, r)
        upd, _ = opt.update({"coarse": gr}, state["opt_state"], {"coarse": params})
        return upd

    timed("full step (adds dense Adam)", rep(full), rays)


if __name__ == "__main__":
    main()
