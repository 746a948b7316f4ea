"""Converged quality runs for the non-chest config classes (VERDICT r4 #4).

Round 4 proved the abdomen/foot/jaw envelopes *run* (40-epoch smokes,
docs/config_matrix_r4/); this trains each variant to convergence on a
SMOOTHED Shepp-Logan phantom — the realistic sharpness class
(docs/quality_attribution_r4.md: PSNR on binary-edge phantoms measures
sub-voxel sharpness, not fidelity; a 1-voxel blur of such a GT already
caps at ~22 dB).  Variants mirror the reference configs:

- abdomen: n_samples 576 (`/root/reference/config/abdomen_50.yaml:21`)
- foot:    n_samples 320, last_activation tanh (`config/foot_50.yaml`)
- jaw:     n_samples 320, beam mask + last_activation none
           (`config/jaw_50.yaml`, mask semantics train.py:60)

Each variant runs in its own subprocess (allocator hygiene, crash
isolation) through the production Trainer on the TPU, evals every few
epochs, and writes docs/config_matrix_r5/<name>.json + metrics.jsonl +
eval artifacts.  Self-terminating between epochs; children are never
killed.

Usage: python scripts/config_matrix_converge.py [--deadline SEC]
       python scripts/config_matrix_converge.py --child NAME DEADLINE
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTDIR = "docs/config_matrix_r5"

SCAN = dict(nVoxel=[128, 128, 128], dVoxel=[1.0, 1.0, 1.0],
            nDetector=[256, 256], dDetector=[1.0, 1.0],
            numTrain=50, numVal=10, mode="cone", totalAngle=180)

# epochs x 50 steps/epoch x 1024 rays; chest-smooth converged to 32.7 dB
# peak in ~20k steps (docs/quality_attribution_r4.md) — foot/jaw get the
# full 320-epoch schedule, abdomen (3x the points/step) a 240-epoch one.
VARIANTS = {
    "foot": dict(n_samples=320, last_activation="tanh", mask=False,
                 epochs=320),
    "jaw": dict(n_samples=320, last_activation="none", mask=True,
                epochs=320),
    "abdomen": dict(n_samples=576, last_activation="sigmoid", mask=False,
                    epochs=240),
}


def make_data(name: str, masked: bool) -> str:
    """Smoothed Shepp-Logan dataset at the variant's envelope.

    Runs in its OWN subprocess pinned to CPU (--gen): pinning
    jax_platforms inside the training child would leave the training
    itself on CPU.
    """
    path = f"data/{name}_smooth.pickle"
    if os.path.exists(path):
        return path
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
    from neuralvolumetricreconstructionformedicalimages_tpu.data import generate
    from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import (
        project_angles)

    data = generate(SCAN, phantom="shepp_logan", seed=7)
    img = gaussian_filter(np.asarray(data["image"], np.float32), 1.0)
    data["image"] = img
    geo = G.ConeGeometry.from_dict(data)
    for split in ("train", "val"):
        angles = np.asarray(data[split]["angles"], np.float32)
        data[split] = {
            "angles": data[split]["angles"],
            "projections": np.asarray(
                project_angles(jnp.asarray(img), geo, angles, 0)),
        }
    if masked:
        H, W = SCAN["nDetector"][1], SCAN["nDetector"][0]
        yy, xx = np.mgrid[0:H, 0:W]
        beam = (np.hypot(yy - H / 2, xx - W / 2) < 0.45 * H).astype(np.float32)
        data["full_proj"] = 0.05 * beam
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def child(name: str, deadline_s: float) -> None:
    v = VARIANTS[name]
    path = f"data/{name}_smooth.pickle"
    if not os.path.exists(path):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--gen", name],
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neuralvolumetricreconstructionformedicalimages_tpu.config import (
        load_config, with_defaults)
    from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
        Trainer)

    cfg = with_defaults(load_config("configs/chest_50.yaml"))
    cfg["exp"].update(expname=f"{name}_converge_r5", datadir=path)
    cfg["render"]["n_samples"] = v["n_samples"]
    cfg["network"]["last_activation"] = v["last_activation"]
    # StepLR decay x0.1 at ~70% of the schedule: the late-training
    # oscillation seen on foot (32.5 dB at epoch 240 -> 20.9 at 280 with
    # constant lr 1e-3) is exactly what the reference's decay suppresses.
    cfg["train"].update(epoch=v["epochs"], resume=False,
                        lrate_step=int(v["epochs"] * 50 * 0.7))
    cfg["log"].update(i_eval=40, i_save=0)
    workdir = f"logs/{name}_converge_r5"
    t0 = time.time()
    tr = Trainer(cfg, workdir=workdir)
    assert tr.use_mask == v["mask"], (tr.use_mask, v["mask"])
    tr.start(deadline=time.time() + deadline_s)
    metrics = tr.eval_step(tr.global_step, tr.last_epoch)
    wall = time.time() - t0
    rec = {
        "n_samples": v["n_samples"],
        "last_activation": v["last_activation"],
        "masked": v["mask"],
        "epochs_target": v["epochs"],
        "epochs_done": int(tr.last_epoch),
        "steps_done": int(tr.global_step),
        "wall_s": round(wall, 1),
        "rays_s": round(tr.global_step * tr.n_rays / max(wall, 1e-9), 0),
        **{k: round(float(x), 4) for k, x in metrics.items()},
    }
    os.makedirs(OUTDIR, exist_ok=True)
    with open(os.path.join(OUTDIR, f"{name}.json"), "w") as f:
        json.dump(rec, f, indent=1)
    for fn in ("metrics.jsonl",):
        src = os.path.join(workdir, fn)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(OUTDIR, f"metrics_{name}.jsonl"))
    # latest eval artifacts
    evald = os.path.join(workdir, "eval")
    if os.path.isdir(evald):
        epochs = sorted(os.listdir(evald))
        if epochs:
            for fn in os.listdir(os.path.join(evald, epochs[-1])):
                if fn.endswith((".png", ".txt")):
                    shutil.copy(os.path.join(evald, epochs[-1], fn),
                                os.path.join(OUTDIR, f"{name}_{fn}"))
    print("[converge] " + json.dumps({name: rec}), flush=True)


def main() -> None:
    if "--gen" in sys.argv:
        name = sys.argv[sys.argv.index("--gen") + 1]
        make_data(name, VARIANTS[name]["mask"])
        return
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], float(sys.argv[i + 2]))
        return
    deadline = 4800.0
    if "--deadline" in sys.argv:
        deadline = float(sys.argv[sys.argv.index("--deadline") + 1])
    t_end = time.time() + deadline
    os.makedirs(OUTDIR, exist_ok=True)
    import subprocess

    for name in VARIANTS:
        remaining = t_end - time.time()
        if remaining < 300:
            print(f"[converge] deadline — skipping {name}", flush=True)
            continue
        budget = min(remaining - 60, 2100.0)
        print(f"[converge] {time.strftime('%H:%M:%S')} spawn {name} "
              f"(budget {budget:.0f}s)", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name,
             str(budget)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )


if __name__ == "__main__":
    main()
