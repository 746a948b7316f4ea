"""Smoothed (real-CT-like) chest phantom dataset.

The committed analytic phantom has binary edges: a 1.0-voxel Gaussian blur
of its own GT already scores 21.95 dB 3D PSNR (the observed training
plateau), while the same blur on a smooth volume scores 32+ dB — PSNR on
binary-edge phantoms measures sub-voxel sharpness, not reconstruction
fidelity (docs/quality_attribution_r4.md).  This generates the SAME
anatomy low-passed at sigma=1 voxel (the sharpness class of real CT
volumes, e.g. the NAF paper's scenes) and re-projects train+val with the
production projector — the realistic quality yardstick.
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from scipy.ndimage import gaussian_filter

import jax
if os.environ.get("NVR_GEN_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import project_angles

base = pickle.load(open("data/chest_phantom.pickle", "rb"))
img = gaussian_filter(np.asarray(base["image"], np.float32), 1.0)
geo = G.ConeGeometry.from_dict(base)
out = dict(base)
out["image"] = img
for split in ("train", "val"):
    angles = np.asarray(base[split]["angles"], np.float32)
    projs = np.asarray(project_angles(jnp.asarray(img), geo, angles, 0))
    out[split] = {"angles": base[split]["angles"], "projections": projs}
    print(split, projs.shape, "range", projs.min(), projs.max())
with open("data/chest_phantom_smooth.pickle", "wb") as f:
    pickle.dump(out, f)
print("wrote data/chest_phantom_smooth.pickle")
