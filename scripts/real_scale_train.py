"""Real-laminography-scale TRAINING run (VERDICT r3 next-#7).

Extends the memory smoke (scripts/real_scale_smoke.py) to an actual short
training run at the reference's real-scan shape: 187 views x 1024^2
complex-phase projections (data/format_real.py + data/angles_real.npy),
tilted-axis parallel geometry, `eval_mask` on — the `train.py:138-218`
eval_stepMASK path.

The measured brain projections are not redistributable, so the complex
stack is SYNTHESIZED: a lamino-chip phantom volume is forward-projected
through the exact tilted geometry on the chip, the line integrals become
the phase of a unit-amplitude complex field, and ``format_real_data``
(the production formatter) builds the dataset dict.  Everything downstream
— on-the-fly rays, beam mask from ``full_proj``, complex-aware metrics —
is the production path.

Committed artifacts: docs/real_scale_train_r4/ (metrics.jsonl, stats).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.config import (
    load_config, with_defaults)
from neuralvolumetricreconstructionformedicalimages_tpu.data.dataset import (
    make_dataset)
from neuralvolumetricreconstructionformedicalimages_tpu.data.format_real import (
    format_real_data)
from neuralvolumetricreconstructionformedicalimages_tpu.data.phantoms import (
    get_phantom)
from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import (
    project_angles)
from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import Trainer

N_VIEWS, H, W = 187, 1024, 1024
EPOCHS = int(os.environ.get("NVR_RS_EPOCHS", 12))
OUTDIR = "docs/real_scale_train_r4"
GEN_NPZ = "/tmp/nvr_realscale_gen.npz"


def gen_projections():
    """CPU subprocess: synthesize the projection stack.

    Projections are computed at 256^2 detector resolution on the HOST CPU
    and bilinearly upsampled to the real 1024^2: the projector program
    reproducibly crashes the axon remote worker (kernel fault, 3x
    observed — its only TPU execution path), and CPU generation is
    minutes.  The lo-res detector spans the same physical extent
    (1 mm x 1024 = 4 mm x 256), so upsampled pixels sit at geometrically
    consistent ray positions across views.  The training pipeline itself
    runs at the genuine 187 x 1024^2 scale — which is what this run
    demonstrates.
    """
    jax.config.update("jax_platforms", "cpu")
    angles_deg = np.rad2deg(
        np.load("data/angles_real.npy").astype(np.float64))[:N_VIEWS]
    vol = get_phantom("lamino_chip", (256, 256, 64)).astype(np.float32)
    lo = 256
    geo_lo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(lo, lo), dDetector=(0.004, 0.004),
        nVoxel=(256, 256, 64), dVoxel=(0.0015, 0.0015, 0.0015),
        mode="parallel", tilt_angle=29.0,
    )
    t0 = time.time()
    angles_rad = np.deg2rad(angles_deg).astype(np.float32)
    proj_lo = np.asarray(project_angles(jnp.asarray(vol), geo_lo,
                                        angles_rad, 320))
    from scipy.ndimage import zoom

    proj = zoom(proj_lo, (1, H / lo, W / lo), order=1).astype(np.float32)
    np.savez_compressed(GEN_NPZ, proj=proj, vol=vol, angles_deg=angles_deg)
    print(f"[gen] projected {proj_lo.shape} -> {proj.shape} in "
          f"{time.time()-t0:.1f}s range [{proj.min():.3f}, {proj.max():.3f}]",
          flush=True)


def main():
    if not os.path.exists(GEN_NPZ):
        import subprocess
        print("[main] generating projections in a CPU subprocess...", flush=True)
        subprocess.run([sys.executable, os.path.abspath(__file__), "--gen"],
                       check=True)
    d = np.load(GEN_NPZ)
    proj, vol, angles_deg = d["proj"], d["vol"], d["angles_deg"]
    print(f"backend={jax.default_backend()}  proj {proj.shape}", flush=True)

    # unit-amplitude complex field, phase = scaled line integral; beam
    # aperture: zero amplitude outside a circle -> ptycho mask.  Phase is
    # kept NON-NEGATIVE ([0, 2] rad, inside the principal branch): the
    # renderer's Beer-Lambert accumulation is >= 0, so negative targets
    # would be unfittable by construction.
    phase = proj / max(1e-6, proj.max()) * 2.0  # [0, 2] rad
    yy, xx = np.mgrid[0:H, 0:W]
    beam = (np.hypot(yy - H / 2, xx - W / 2) < 0.48 * H).astype(np.float32)
    cplx = (beam * np.exp(1j * phase)).astype(np.complex64)
    # undo the formatter's rot90 so its output matches our projector frame
    data = format_real_data(np.rot90(cplx, k=-1, axes=(1, 2)), angles_deg,
                            tilt_angle=29.0, n_slices=64)
    # recon grid at the phantom's shape (the formatter's [W, W, slices]
    # placeholder grid is for the real scan; here GT is known)
    data.update(nVoxel=[256, 256, 64], dVoxel=[1.5, 1.5, 1.5],
                offOrigin=[0, 0, 0], image=vol)

    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["exp"].update(expname="real_scale_train_r4", datadir="(in-memory)")
    cfg["train"].update(epoch=EPOCHS, resume=False, lrate=1e-3,
                        n_rays=int(os.environ.get("NVR_RS_RAYS", 1024)))
    cfg["log"].update(i_eval=EPOCHS, i_save=0, eval_mask=True)

    workdir = "logs/real_scale_train_r4"

    # in-memory dataset: route the Trainer's loader straight to the dict
    import neuralvolumetricreconstructionformedicalimages_tpu.train.trainer as T
    orig_load = T.load_dataset
    T.load_dataset = lambda path, split, n_rays, **kw: make_dataset(
        data, split, n_rays=n_rays, **kw)
    try:
        tr = Trainer(cfg, workdir=workdir)
    finally:
        T.load_dataset = orig_load
    print(f"ray_mode={tr.train_dset.ray_mode} use_mask={tr.use_mask} "
          f"steps/epoch={tr.steps_per_epoch}", flush=True)
    assert tr.train_dset.ray_mode == "onthefly"
    assert tr.use_mask, "beam mask must be active"

    t0 = time.time()
    tr.start()
    wall = time.time() - t0
    rate = EPOCHS * tr.steps_per_epoch * tr.n_rays / wall
    print(f"trained {EPOCHS} epochs in {wall:.0f}s (~{rate:,.0f} rays/s "
          "incl. compile + eval)", flush=True)

    os.makedirs(OUTDIR, exist_ok=True)
    shutil.copy(os.path.join(workdir, "metrics.jsonl"),
                os.path.join(OUTDIR, "metrics.jsonl"))
    evals = sorted(os.listdir(os.path.join(workdir, "eval")))
    if evals:
        src = os.path.join(workdir, "eval", evals[-1])
        for f in ("stats.txt", "proj_show_left_gt_right_pred.png",
                  "slice_show_row1_gt_row2_pred.png"):
            if os.path.exists(os.path.join(src, f)):
                shutil.copy(os.path.join(src, f), os.path.join(OUTDIR, f))
    print("REAL-SCALE TRAIN DONE", flush=True)


if __name__ == "__main__":
    if "--gen" in sys.argv:
        gen_projections()
    else:
        main()
