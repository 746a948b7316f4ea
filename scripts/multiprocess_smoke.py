"""Two-process distributed smoke test of the multi-host bring-up path.

Exercises what the single-process suite cannot (VERDICT r2 missing #5 /
next #7): a real ``jax.distributed`` rendezvous via
``initialize_multihost`` (coordinator on localhost), a global mesh whose
``data`` axis spans BOTH processes (2 processes x 4 local CPU devices =
8 global devices), one sharded optimizer step through
``make_sharded_train_step``, and a cross-process consistency check — the
updated parameters must be bitwise identical on every process (grads are
psum'd over the full data axis; any divergence in the collective layer
shows up here).

Run:  python scripts/multiprocess_smoke.py
Exit 0 + "MULTIPROCESS SMOKE PASSED" on success.  Committed output:
docs/multiprocess_smoke.md.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("NVR_SMOKE_PORT", "43217"))
N_PROC = 2
LOCAL_DEVICES = 4

WORKER = r"""
import hashlib
import os
import sys

sys.path.insert(0, os.environ["NVR_REPO"])

# Per-process virtual CPU devices; MUST be set before the backend exists.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ["NVR_LOCAL_DEVICES"]
).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # env JAX_PLATFORMS is ignored here

from neuralvolumetricreconstructionformedicalimages_tpu.parallel.mesh import (
    initialize_multihost)

pid = int(os.environ["NVR_PROCESS_ID"])
nproc = int(os.environ["NVR_NUM_PROCESSES"])
initialize_multihost(
    coordinator_address=os.environ["NVR_COORDINATOR"],
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
n_global = len(jax.devices())
print(f"[proc {pid}] process_count={jax.process_count()} "
      f"global_devices={n_global} local={len(jax.local_devices())}",
      flush=True)

import jax.numpy as jnp
import numpy as np

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.config import with_defaults
from neuralvolumetricreconstructionformedicalimages_tpu.parallel import (
    MeshSpec, make_mesh, make_sharded_train_step)
from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
    build_model, init_state)

cfg = with_defaults({
    "exp": {"expname": "mp", "expdir": "/tmp", "datadir": ""},
    "network": {"net_type": "mlp", "num_layers": 3, "hidden_dim": 16,
                "skips": [1], "out_dim": 1, "last_activation": "sigmoid",
                "bound": 0.3},
    "encoder": {"encoding": "hashgrid", "input_dim": 3, "num_levels": 4,
                "level_dim": 2, "base_resolution": 4,
                "log2_hashmap_size": 8},
    "render": {"n_samples": 16, "n_fine": 0, "perturb": True,
               "raw_noise_std": 0.0},
    "train": {"epoch": 1, "n_batch": 1, "n_rays": 128, "lrate": 1e-3,
              "lrate_gamma": 0.1, "lrate_step": 100, "resume": False},
    "log": {"i_eval": 0, "i_save": 0},
})

geo = G.ConeGeometry(
    DSD=1.5, DSO=1.0, nDetector=(8, 8), dDetector=(0.01, 0.01),
    nVoxel=(8, 8, 8), dVoxel=(0.01, 0.01, 0.01), mode="cone",
)
angles = np.linspace(0, np.pi, 4, endpoint=False).astype(np.float32)
near, far = G.get_near_far(geo)
ro, rd = G.rays_for_angles(geo, angles)
arrays = {
    "rays": G.pack_rays(ro, rd, near, far),
    "projs": jax.random.uniform(jax.random.key(1), (4, 8, 8)) * 0.1,
    "mask": jnp.ones((4, 8, 8), jnp.float32),
    "pools": jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32), (4, 64)),
    "pool_counts": jnp.full((4,), 64, jnp.int32),
}

# data axis spans ALL global devices -> the psum crosses the process
# boundary (DCN analogue), which is the path under test.
mesh = make_mesh(MeshSpec(data=n_global, sample=1))
spec = build_model(cfg)
state = init_state(cfg, spec, steps_per_epoch=4, key=jax.random.key(0))
step_fn = make_sharded_train_step(
    cfg, spec, mesh, steps_per_epoch=4,
    n_rays=cfg["train"]["n_rays"], n_batch=1, use_mask=False)

views = jnp.zeros((1,), jnp.int32)
for i in range(2):
    state, loss = step_fn(state, arrays, views, jax.random.key(10 + i))

# Cross-process consistency: hash the (replicated) updated params.
leaves = jax.tree_util.tree_leaves(state["params"])
h = hashlib.sha256()
for leaf in leaves:
    h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
digest = h.hexdigest()
print(f"[proc {pid}] step=2 loss={float(loss):.6f} params_sha256={digest}",
      flush=True)
"""


def main() -> int:
    env_base = dict(
        os.environ,
        NVR_REPO=REPO,
        NVR_COORDINATOR=f"localhost:{PORT}",
        NVR_NUM_PROCESSES=str(N_PROC),
        NVR_LOCAL_DEVICES=str(LOCAL_DEVICES),
    )
    procs = []
    for pid in range(N_PROC):
        env = dict(env_base, NVR_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        print(f"--- proc {pid} (rc={p.returncode}) ---\n{out}")
        ok = ok and p.returncode == 0

    digests = []
    for out in outs:
        for line in out.splitlines():
            if "params_sha256=" in line:
                digests.append(line.rsplit("=", 1)[1].strip())
    ok = ok and len(digests) == N_PROC and len(set(digests)) == 1
    if ok:
        print(f"MULTIPROCESS SMOKE PASSED: {N_PROC} processes x "
              f"{LOCAL_DEVICES} devices, identical params "
              f"{digests[0][:16]}...")
        return 0
    print("MULTIPROCESS SMOKE FAILED")
    return 1


if __name__ == "__main__":
    sys.exit(main())
