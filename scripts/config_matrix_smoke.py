"""On-chip smokes for the non-chest configs (VERDICT r3 next-#6).

The reference's abdomen/foot/jaw CT pickles are external downloads absent
from the snapshot (data/README.md), so each smoke trains on a generated
Shepp-Logan dataset at the SAME workload envelope as its reference config
(`/root/reference/config/abdomen_50.yaml:21` etc.):

- abdomen: n_samples 576 (590k point queries/step — the largest envelope)
- foot:    n_samples 320, last_activation tanh (the variant the reference
           sketches in network.py:27-28)
- jaw:     n_samples 320, beam MASK active (full_proj ptycho mask,
           train.py:60), last_activation none

Each runs a few tens of epochs through the production Trainer with evals,
then writes stats to docs/config_matrix_r4/.  Self-terminating between
epochs.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nvr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neuralvolumetricreconstructionformedicalimages_tpu.config import (
    load_config, with_defaults)
from neuralvolumetricreconstructionformedicalimages_tpu.data import generate
from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import Trainer

OUTDIR = "docs/config_matrix_r4"
DEADLINE_S = float(sys.argv[2]) if len(sys.argv) > 2 else 1200.0

SCAN = dict(nVoxel=[128, 128, 128], dVoxel=[1.0, 1.0, 1.0],
            nDetector=[256, 256], dDetector=[1.0, 1.0],
            numTrain=50, numVal=10, mode="cone", totalAngle=180)

VARIANTS = {
    "abdomen": dict(n_samples=576, last_activation="sigmoid", mask=False,
                    epochs=40),
    "foot": dict(n_samples=320, last_activation="tanh", mask=False,
                 epochs=40),
    "jaw": dict(n_samples=320, last_activation="none", mask=True,
                epochs=40),
}


def make_data(name: str, masked: bool) -> str:
    path = f"data/{name}_smoke.pickle"
    if os.path.exists(path):
        return path
    data = generate(SCAN, phantom="shepp_logan", seed=7)
    if masked:
        # synthetic circular beam: full_proj below threshold outside the
        # beam -> ptycho mask masks the corners (train.py:60 semantics)
        H, W = SCAN["nDetector"][1], SCAN["nDetector"][0]
        yy, xx = np.mgrid[0:H, 0:W]
        r = np.hypot(yy - H / 2, xx - W / 2)
        beam = (r < 0.45 * H).astype(np.float32)
        data["full_proj"] = 0.05 * beam  # 0.05 > thr inside, 0 outside
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    os.makedirs(OUTDIR, exist_ok=True)
    t_end = time.time() + DEADLINE_S
    results = {}
    for name, v in VARIANTS.items():
        if only and name != only:
            continue
        if time.time() > t_end - 120:
            print(f"[smoke] deadline — skipping {name}", flush=True)
            break
        path = make_data(name, v["mask"])
        cfg = with_defaults(load_config("configs/chest_50.yaml"))
        cfg["exp"].update(expname=f"{name}_smoke", datadir=path)
        cfg["render"]["n_samples"] = v["n_samples"]
        cfg["network"]["last_activation"] = v["last_activation"]
        cfg["train"].update(epoch=v["epochs"], resume=False)
        cfg["log"].update(i_eval=v["epochs"] // 2, i_save=0)
        workdir = f"logs/{name}_smoke"
        print(f"[smoke] {time.strftime('%H:%M:%S')} {name}: n_samples="
              f"{v['n_samples']} act={v['last_activation']} mask={v['mask']}",
              flush=True)
        t0 = time.time()
        tr = Trainer(cfg, workdir=workdir)
        assert tr.use_mask == v["mask"], (tr.use_mask, v["mask"])
        tr.start()
        metrics = tr.eval_step(tr.global_step, v["epochs"])
        wall = time.time() - t0
        rate = (v["epochs"] * tr.steps_per_epoch * tr.n_rays) / wall
        results[name] = {
            "n_samples": v["n_samples"],
            "last_activation": v["last_activation"],
            "masked": v["mask"],
            "epochs": v["epochs"],
            "wall_s": round(wall, 1),
            "approx_rays_s": round(rate, 0),
            **{k: round(float(x), 4) for k, x in metrics.items()},
        }
        print("[smoke] " + json.dumps({name: results[name]}), flush=True)
        with open(os.path.join(OUTDIR, f"{name}.json"), "w") as f:
            json.dump(results[name], f, indent=1)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
