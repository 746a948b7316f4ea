"""Verify drive: fit the field to analytic ball-phantom projections on the TPU.

Exercises geometry, ray gen, hash encoder (Pallas bucket backward), MLP,
renderer, Beer-Lambert integration, autodiff, optax, eval query end-to-end.
Self-terminating: the step loop checks a wall-clock deadline BETWEEN scanned
dispatches (never interrupted mid-dispatch).
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.models import get_encoder, get_network
from neuralvolumetricreconstructionformedicalimages_tpu.render import render_rays, query_field

DEADLINE_S = float(sys.argv[1]) if len(sys.argv) > 1 else 420.0
t_end = time.time() + DEADLINE_S

print("devices:", jax.devices(), flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")

# 1. geometry: parallel-beam, 24x24 detector, 16 angles
geo = G.ConeGeometry(DSD=1.5, DSO=1.0, nDetector=(24, 24), dDetector=(0.025, 0.025),
                     nVoxel=(64, 64, 64), dVoxel=(0.004, 0.004, 0.004), mode="parallel")
near, far = G.get_near_far(geo)
angles = np.linspace(0, np.pi, 16, endpoint=False).astype(np.float32)
ro, rd = G.rays_for_angles(geo, angles)
rays = G.pack_rays(ro, rd, near, far).reshape(-1, 8)

# 2. GT: uniform ball radius r, chord length 2*sqrt(r^2 - b^2)
r = 0.1
o3, d3 = rays[:, :3], rays[:, 3:6]
d3n = d3 / jnp.linalg.norm(d3, axis=-1, keepdims=True)
b = jnp.linalg.norm(jnp.cross(o3, d3n), axis=-1)
gt = 2.0 * jnp.sqrt(jnp.clip(r * r - b * b, 0.0)).astype(jnp.float32)

# 3. model: 8-level 2^15 hash + MLP
enc = get_encoder("hashgrid", num_levels=8, log2_hashmap_size=15, backward="bucket")
spec = get_network("mlp")(encoder=enc, num_layers=4, hidden_dim=32, skips=(2,),
                          out_dim=1, last_activation="relu", bound=0.15)
params = spec.init(jax.random.key(0))
sched = optax.piecewise_constant_schedule(1e-2, {1500 * 1: 0.1, 2500 * 1: 0.3})
opt = optax.adam(sched)
opt_state = opt.init(params)

def loss_fn(p, rb, tb, key):
    out = render_rays(rb, p, spec, n_samples=96, n_fine=0, perturb=True,
                      raw_noise_std=0.0, key=key)
    return jnp.mean((out["acc"] - tb) ** 2)

def step(carry, key):
    p, s = carry
    k1, k2 = jax.random.split(key)
    idx = jax.random.choice(k1, rays.shape[0], (1024,), replace=False)
    l, g = jax.value_and_grad(loss_fn)(p, rays[idx], gt[idx], k2)
    up, s = opt.update(g, s, p)
    return (optax.apply_updates(p, up), s), l

@jax.jit
def block(p, s, key):
    (p, s), ls = jax.lax.scan(step, (p, s), jax.random.split(key, 100))
    return p, s, ls

done_steps = 0
for i in range(35):
    if time.time() > t_end:
        print("deadline reached between dispatches — stopping", flush=True)
        break
    t0 = time.perf_counter()
    params, opt_state, ls = block(params, opt_state, jax.random.key(100 + i))
    l_last = float(ls[-1])  # device->host fence
    done_steps += 100
    print(f"steps {done_steps}: loss {l_last:.3e} ({time.perf_counter()-t0:.1f}s)", flush=True)

# eval: proj PSNR over all rays + field values inside/outside ball
out = render_rays(rays, params, spec, n_samples=96, n_fine=0, perturb=False,
                  raw_noise_std=0.0, key=None)
mse = float(jnp.mean((out["acc"] - gt) ** 2))
psnr = -10.0 * np.log10(mse / float(jnp.max(gt) ** 2))
# dense 48^3 grid over the volume: mean density well inside vs well outside
ax = np.linspace(-0.12, 0.12, 48, dtype=np.float32)
gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
f = np.asarray(query_field(pts, params, spec, tile=36864))[:, 0]
rad = np.sqrt(gx**2 + gy**2 + gz**2).reshape(-1)
m_in = float(f[rad < 0.8 * r].mean())
m_out = float(np.abs(f[rad > 1.2 * r]).mean())
print(f"proj PSNR: {psnr:.1f} dB  mean sigma inside={m_in:.3f} outside={m_out:.3f}")
ok = psnr > 50.0 and m_in > 0.8 and m_out < 0.1
print("VERIFY", "PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
