"""Real-laminography-scale training smoke: 187 views x 1024^2 on one chip.

The workload `data/format_real.py` + `data/angles_real.npy` exist for
(the reference's real brain scan) needs rays for 187 x 1024^2 pixels —
6.3 GB HBM if precomputed (VERDICT r2 missing #6).  This smoke builds a
dataset at exactly that scale (synthetic projection content; the real
projections are not redistributable), relies on the automatic switch to
the on-the-fly ray mode, and runs a few chest-model-scale training steps
on the chip — proving the memory plan fits and measuring the step cost of
in-step ray regeneration.

Run:  python scripts/real_scale_smoke.py          (on the chip)
Committed output: docs/real_scale_smoke.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_VIEWS, H, W = 187, 1024, 1024
N_RAYS, N_SAMPLES, STEPS = 1024, 192, 4


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neuralvolumetricreconstructionformedicalimages_tpu.config import (
        load_config, with_defaults)
    from neuralvolumetricreconstructionformedicalimages_tpu.data.dataset import (
        make_dataset)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
        build_model, init_state, make_epoch_fn)

    print(f"backend={jax.default_backend()}", flush=True)
    angles = np.load("data/angles_real.npy").astype(np.float32)[:N_VIEWS]

    # Real-scan geometry shape: parallel beam, tilted axis (laminography),
    # 1024^2 detector — mirrors data/format_real.py's geometry dict.
    data = {
        "DSD": 1500.0, "DSO": 1000.0,
        "nDetector": [W, H], "dDetector": [0.5, 0.5],
        "nVoxel": [256, 256, 64], "dVoxel": [1.0, 1.0, 1.0],
        "offOrigin": [0, 0, 0], "offDetector": [0, 0],
        "accuracy": 0.5, "mode": "parallel", "filter": None,
        "totalAngle": 180, "startAngle": 0, "randomAngle": False,
        "numTrain": N_VIEWS, "numVal": 1, "convert": False,
        "rescale_slope": 1.0, "rescale_intercept": 0.0,
        "normalize": True, "noise": 0, "tilt_angle": 29.0,
        "train": {
            "angles": angles,
            # synthetic content; stays on host until device upload
            "projections": np.random.default_rng(0)
            .random((N_VIEWS, H, W), np.float32) * 0.1,
        },
    }
    t0 = time.time()
    dset = make_dataset(data, "train", n_rays=N_RAYS)
    print(f"dataset built in {time.time()-t0:.1f}s  ray_mode={dset.ray_mode} "
          f"(ray tensor would be "
          f"{N_VIEWS*H*W*8*4/2**30:.1f} GB)", flush=True)
    assert dset.ray_mode == "onthefly"

    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["render"]["n_samples"] = N_SAMPLES
    spec = build_model(cfg)
    state = init_state(cfg, spec, steps_per_epoch=STEPS, key=jax.random.key(1))
    epoch_fn = make_epoch_fn(cfg, spec, STEPS, N_RAYS, n_batch=1,
                             use_mask=False, geo=dset.geo,
                             near=dset.near, far=dset.far)
    arrays = dset.arrays()
    order = jnp.asarray(np.arange(STEPS).reshape(-1, 1) % N_VIEWS, jnp.int32)

    print("compiling + warmup...", flush=True)
    t0 = time.time()
    state, losses = epoch_fn(state, arrays, order, jax.random.key(2))
    tail = float(jnp.sum(losses))  # fence
    print(f"warmup {time.time()-t0:.1f}s loss={tail/STEPS:.4f}", flush=True)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, arrays, order, jax.random.key(3 + i))
        float(jnp.sum(losses))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"steady: {best/STEPS*1e3:.1f} ms/step "
          f"({STEPS*N_RAYS/best:,.0f} rays/s) at 187x1024^2 scale, "
          f"on-the-fly rays", flush=True)
    print("REAL-SCALE SMOKE PASSED", flush=True)


if __name__ == "__main__":
    main()
