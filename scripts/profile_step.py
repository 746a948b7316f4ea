"""Ablation profile of the chest_50-scale train step on the real chip.

Times each pipeline stage in isolation to locate the bottleneck.  The
round-3 breakdown targets the 141 ms/step (measured, round 2) vs ~45 ms
(projected, docs/microbench_r2.md §Conclusions-4) gap: every component of
the coherent-hash fast path is timed separately, plus the integrated
step and the frozen-eval path.

Run:  python scripts/profile_step.py            (on the chip)
      python scripts/profile_step.py --cpu      (debug on CPU)
Committed results: docs/profile_r3.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_RAYS, N_SAMPLES, REPS = 1024, 192, 20  # N_RAYS overridable via --rays


def timed(name, fn, *args, reps=REPS, n_rays=None):
    n_rays = n_rays or N_RAYS
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])  # fence
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
        times.append(time.perf_counter() - t0)
    per_call = min(times) / reps
    print(f"{name:40s} {per_call*1e3:9.3f} ms/step  "
          f"({n_rays/per_call:,.0f} rays/s)", flush=True)
    return per_call


def rep(fn, reps=REPS):
    """Repeat a traced fn ``reps`` times with a data dependency chain."""
    def body(c, _):
        o = fn(c)
        # Consume EVERY output leaf: using a single leaf lets XLA DCE the
        # rest of the computation (e.g. the whole table gradient when only
        # an MLP-bias grad leaf fed the chain — first r3 profile attempt).
        # Float sums * 0 are NOT constant-folded (NaN-safety), so the work
        # stays live at negligible reduction cost.
        z = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(o))
        return c + (z * 0).astype(c.dtype), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y
    return run


def rep2(fn, reps=REPS):
    """Like ``rep`` but with a second pytree passed as a jit ARGUMENT —
    closures over big arrays would embed them as compile-time constants
    and overflow the axon remote-compile request (HTTP 413)."""
    def body_of(aux):
        def body(c, _):
            o = fn(c, aux)
            z = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(o))
            return c + (z * 0).astype(c.dtype), None
        return body

    @jax.jit
    def run(x, aux):
        y, _ = jax.lax.scan(body_of(aux), x, None, length=reps)
        return y
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log2", type=int, default=19)
    ap.add_argument("--rays", type=int, default=None)
    ap.add_argument("--table-dtype", default="float32")
    args = ap.parse_args()
    global N_RAYS
    if args.rays:
        N_RAYS = args.rays
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
    from neuralvolumetricreconstructionformedicalimages_tpu.config import (
        load_config, with_defaults)
    from neuralvolumetricreconstructionformedicalimages_tpu.losses import masked_mse
    from neuralvolumetricreconstructionformedicalimages_tpu.ops.bucket_matmul import (
        bucket_grad_matmul)
    from neuralvolumetricreconstructionformedicalimages_tpu.ops.coherent_hash import (
        base_and_frac, build_rolled_table, coherent_encode,
        coherent_encode_prebuilt)
    from neuralvolumetricreconstructionformedicalimages_tpu.render import (
        render_image, render_rays)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.optim import (
        make_optimizer)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
        build_model, init_state)

    print(f"backend={jax.default_backend()} log2_hashmap_size={args.log2}",
          flush=True)
    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["render"]["n_samples"] = N_SAMPLES
    cfg["encoder"]["log2_hashmap_size"] = args.log2
    cfg["encoder"]["table_dtype"] = args.table_dtype
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
    enc = spec.encoder
    grid = enc.grid
    table = params["encoder"]["table"]
    bound = spec.bound - 1e-6
    x01 = jnp.clip((jnp.clip(pts, -bound, bound) + spec.bound)
                   / (2 * spec.bound), 0.0, 1.0)
    B = x01.shape[0]
    L, S, C = table.shape
    D = grid.input_dim
    print(f"points/step B={B:,}  table [L={L}, S={S:,}, C={C}]", flush=True)

    # ---- encoder components --------------------------------------------
    t_build = timed("A1 build_rolled_table f32",
                    rep(lambda t: build_rolled_table(t, grid)), table)
    timed("A1b build_rolled_table bf16",
          rep(lambda t: build_rolled_table(t, grid, jnp.bfloat16)), table)

    rolled = jax.jit(lambda t: build_rolled_table(t, grid))(table)

    t_gather = timed(
        "A2 prebuilt gather+lerp fwd",
        rep2(lambda x, r: coherent_encode_prebuilt(x, r, grid)), x01, rolled)

    base, frac = jax.jit(lambda x: base_and_frac(grid, x))(x01)
    g_out = jax.random.normal(jax.random.key(2), (B, L, C))

    def sort_fn(x):
        b, f = base_and_frac(grid, x)
        keys = b.T
        lanes = ([f[:, :, d].T for d in range(D)]
                 + [g_out[:, :, c].T for c in range(C)])
        return jax.lax.sort((keys, *lanes), dimension=-1, num_keys=1)[0]

    t_sort = timed("A3 lax.sort keys+5 lanes", rep(sort_fn), x01)

    sorted_all = jax.jit(sort_fn)(x01)
    sk = sorted_all
    sf = jnp.zeros((L, D, B), jnp.float32) + 0.3
    sg = jnp.ones((L, C, B), jnp.float32)

    t_kernel = timed(
        "A4 bucket kernel (+rearrange)",
        rep2(lambda k, aux: bucket_grad_matmul(
            k, aux[0], aux[1], table_size=S, input_dim=D)),
        sk, (sf, sg))

    from neuralvolumetricreconstructionformedicalimages_tpu.ops import coherent_hash as CH

    offs = CH.corner_offsets(grid)

    # (canonical-kernel A4b/A6b stages removed in r5 with the kernel;
    # measurements preserved in docs/profile_r3.md A4b)
    gr_in = jnp.zeros((L, C * (1 << D), S), jnp.float32)

    def adjoint_rolls(gr):
        grk = gr.reshape(L, C, 1 << D, S)
        acc = 0.0
        for k in range(1 << D):
            acc = acc + jnp.stack(
                [jnp.roll(grk[l, :, k, :], int(offs[l, k]), axis=-1)
                 for l in range(L)])
        return acc.transpose(0, 2, 1)

    t_rolls = timed("A5 adjoint corner rolls", rep(adjoint_rolls), gr_in)

    def enc_bwd(x, tab):
        return jax.grad(
            lambda t: jnp.sum(coherent_encode(x, t, grid) * 1e-3))(tab)

    t_enc = timed("A6 encoder fwd+bwd (integrated)", rep2(enc_bwd), x01, table)
    print(f"   [components A1+A2+A3+A4+A5 = "
          f"{(t_build+t_gather+t_sort+t_kernel+t_rolls)*1e3:.1f} ms]",
          flush=True)

    # ---- pipeline stages ------------------------------------------------
    timed("B1 field fwd (encode+mlp)",
          rep2(lambda p, prm: spec.apply(prm, p)), pts, params)
    timed("B2 render fwd", rep2(lambda r, prm: render_rays(
        r, prm, spec, n_samples=N_SAMPLES, perturb=False, key=None)["acc"]),
        rays, params)

    def loss(p, r):
        out = render_rays(r, p, spec, n_samples=N_SAMPLES, perturb=False, key=None)
        return masked_mse(out["acc"], target, None)

    g = jax.grad(loss)
    timed("B3 fwd+bwd", rep2(lambda r, prm: g(prm, r)), rays, params)

    def full(r, aux):
        prm, ost = aux
        gr = g(prm, r)
        upd, _ = opt.update({"coarse": gr}, ost, {"coarse": prm})
        return upd

    t_full = timed("B4 full step (adds dense Adam)", rep2(full), rays,
                   (params, state["opt_state"]))
    print(f"   [B4 -> {N_RAYS/t_full:,.0f} rays/s]", flush=True)

    # ---- frozen eval path (VERDICT r2 #4) -------------------------------
    frozen = spec.freeze(params)
    H = W = 256
    ro_f, rd_f = G.rays_for_angle(geo, 0.33)
    view_rays = G.pack_rays(ro_f, rd_f, near, far).reshape(-1, 8)
    t0 = time.perf_counter()
    acc = render_image(view_rays, frozen, spec, n_samples=N_SAMPLES, tile=4096)
    jax.device_get(acc[:1])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = render_image(view_rays, frozen, spec, n_samples=N_SAMPLES, tile=4096)
    jax.device_get(acc[:1])
    t2 = time.perf_counter() - t0
    print(f"C1 frozen full-view render ({H*W:,} rays): first {t1:.1f}s "
          f"(incl compile), steady {t2:.2f}s", flush=True)


if __name__ == "__main__":
    main()
