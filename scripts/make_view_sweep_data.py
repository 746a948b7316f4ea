"""Generate 100/200-view variants of the bundled chest phantom.

Quality-attribution experiment (VERDICT r3 next-#3): same phantom volume,
same VAL split (so 3D/proj metrics are directly comparable across runs),
only the number of evenly-spaced training views changes.  Reuses the
committed ``data/chest_phantom.pickle``'s image + geometry verbatim and
re-projects the train split with the JAX projector (data/projector.py),
exactly as data/generate.py does (linspace over totalAngle, endpoint
dropped, noise 0 to match the original).

Outputs (NOT committed — 34 MB each, reproducible):
  data/chest_phantom_views100.pickle
  data/chest_phantom_views200.pickle
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get("NVR_GEN_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import (
    project_angles,
)

SRC = "data/chest_phantom.pickle"

with open(SRC, "rb") as f:
    base = pickle.load(f)

geo = G.ConeGeometry.from_dict(base)
img = np.asarray(base["image"], np.float32)
total = base["totalAngle"] / 180.0 * np.pi
start = base["startAngle"] / 180.0 * np.pi

for n_views in (100, 200):
    angles = (np.linspace(0, total, n_views + 1)[:-1] + start).astype(np.float32)
    projs = np.asarray(project_angles(img, geo, angles, 0))
    out = dict(base)
    out["numTrain"] = n_views
    out["train"] = {"angles": angles.astype(np.float64), "projections": projs}
    # val split copied verbatim from the source pickle
    path = f"data/chest_phantom_views{n_views}.pickle"
    with open(path, "wb") as f:
        pickle.dump(out, f)
    print(f"{path}: train {projs.shape}, val "
          f"{out['val']['projections'].shape} (copied)", flush=True)

# sanity: re-projecting the original 50 angles must reproduce the committed
# train projections bit-for-bit (same projector, same inputs)
angles50 = np.asarray(base["train"]["angles"], np.float32)
re50 = np.asarray(project_angles(img, geo, angles50, 0))
err = np.abs(re50 - np.asarray(base["train"]["projections"])).max()
print(f"reprojection check vs committed 50-view split: max |diff| = {err:.3e}")
assert err < 1e-4, "projector no longer reproduces the committed dataset"
