"""JAX forward projector: differentiable X-ray transform of a voxel volume.

TPU-native replacement for the external TIGRE CUDA projector used by the
reference's offline data generator (``/root/reference/dataGenerator/generateData.py:178``
calls ``tigre.Ax``).  Instead of a C++/CUDA ray-driven projector we express
the X-ray transform as (ray generation -> trilinear volume sampling ->
Beer-Lambert sum), all jit-compiled — the same math the renderer uses for
the neural field, applied to a dense voxel grid.  This keeps the synthetic
data generator and the reconstruction bit-consistent with each other: a
volume reconstructed by the model reprojects onto the data it was trained
on with no convention mismatch.

The voxel layout matches ``voxel_grid``/``get_voxels``
(``/root/reference/src/dataset/tigre.py:388-400``): ``volume[i, j, k]`` is
the attenuation at world position ``grid[i, j, k]``, axes (x, y, z), voxel
centers spanning ``+-(sVoxel/2 - dVoxel/2)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry as G


def trilinear_sample(volume: jax.Array, pts: jax.Array, geo: G.ConeGeometry) -> jax.Array:
    """Trilinearly sample ``volume`` [n1, n2, n3] at world points ``pts`` [..., 3].

    Points outside the volume sample zero (attenuation-free surroundings),
    implemented by clamping the 8 corner indices and zeroing the weight of
    out-of-range points.
    """
    n = jnp.asarray(geo.nVoxel, jnp.float32)
    d = jnp.asarray(geo.dVoxel, jnp.float32)
    half = (n * d) / 2.0 - d / 2.0  # first/last voxel center coordinate

    # continuous voxel-index coordinates: center i at world -half + i*d
    f = (pts + half) / d  # [..., 3]
    f0 = jnp.floor(f)
    frac = f - f0
    i0 = f0.astype(jnp.int32)

    # small tolerance so boundary voxel centers are not zeroed by fp rounding
    eps = 1e-4
    inside = jnp.all((f >= -eps) & (f <= n - 1.0 + eps), axis=-1)

    n_i = jnp.asarray(geo.nVoxel, jnp.int32)
    c0 = jnp.clip(i0, 0, n_i - 1)
    c1 = jnp.clip(i0 + 1, 0, n_i - 1)

    def gather(ix, iy, iz):
        return volume[ix, iy, iz]

    wx, wy, wz = frac[..., 0], frac[..., 1], frac[..., 2]
    v = (
        gather(c0[..., 0], c0[..., 1], c0[..., 2]) * (1 - wx) * (1 - wy) * (1 - wz)
        + gather(c1[..., 0], c0[..., 1], c0[..., 2]) * wx * (1 - wy) * (1 - wz)
        + gather(c0[..., 0], c1[..., 1], c0[..., 2]) * (1 - wx) * wy * (1 - wz)
        + gather(c0[..., 0], c0[..., 1], c1[..., 2]) * (1 - wx) * (1 - wy) * wz
        + gather(c1[..., 0], c1[..., 1], c0[..., 2]) * wx * wy * (1 - wz)
        + gather(c1[..., 0], c0[..., 1], c1[..., 2]) * wx * (1 - wy) * wz
        + gather(c0[..., 0], c1[..., 1], c1[..., 2]) * (1 - wx) * wy * wz
        + gather(c1[..., 0], c1[..., 1], c1[..., 2]) * wx * wy * wz
    )
    return jnp.where(inside, v, 0.0)


def _tpu_guard() -> None:
    """Refuse to dispatch the projector to a (remote) TPU by default.

    On this image's remote-TPU platform the projector program reproducibly
    KILLS the TPU worker process (kernel fault, 3x observed in round 4 at
    every detector size; repro: ``scripts/repro_projector_tpu_fault.py``;
    writeup: ``docs/projector_tpu_fault.md``).  A wedged worker takes the
    chip away from everything else for 10-45 min, so the TPU path is
    opt-in via ``NVR_PROJECTOR_ON_TPU=1`` — generation on the host CPU
    takes ~1-2 min at 187 x 1024^2 (``scripts/real_scale_train.py``) and
    is the supported path.
    """
    import os

    if os.environ.get("NVR_PROJECTOR_ON_TPU") == "1":
        return
    if jax.default_backend() not in ("cpu",):
        raise RuntimeError(
            "project_angles: refusing to run on the TPU backend — this "
            "program reproducibly crashes the remote TPU worker (see "
            "docs/projector_tpu_fault.md). Run it on CPU (e.g. "
            "jax.config.update('jax_platforms', 'cpu') in a generation "
            "subprocess, as scripts/real_scale_train.py does), or set "
            "NVR_PROJECTOR_ON_TPU=1 to override."
        )


@functools.partial(jax.jit, static_argnames=("geo", "n_samples"))
def _project_angles_impl(volume: jax.Array, geo: G.ConeGeometry,
                         angles: jax.Array, n_samples: int = 0) -> jax.Array:
    near, far = G.get_near_far(geo)
    if n_samples == 0:
        n_samples = 2 * int(np.max(geo.nVoxel))

    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z_vals = near * (1.0 - t) + far * t                     # [S]
    dt = (far - near) / (n_samples - 1)

    # Tile detector rows so the [rows, W, S, 3] point tensor stays <=128 MB
    # per tile (a full 1024^2 view at 512 samples is a 6.4 GB intermediate
    # and OOMs a 16 GB chip with its gather temporaries).  The row count is
    # padded UP to a multiple of the tile (strip rows discarded) rather
    # than requiring an exact divisor — a prime detector height would
    # otherwise degrade to H one-row map iterations (ADVICE r4 #5).
    W_det, H_det = geo.nDetector
    budget_rows = max(1, (1 << 27) // max(1, W_det * n_samples * 12))
    row_tile = min(H_det, budget_rows)
    n_tiles = -(-H_det // row_tile)
    pad_rows = n_tiles * row_tile - H_det

    def one_angle(angle):
        ro, rd = G.rays_for_angle(geo, angle)               # [H, W, 3]
        norm = jnp.linalg.norm(rd, axis=-1)                 # [H, W]
        ro_p = jnp.pad(ro, ((0, pad_rows), (0, 0), (0, 0)))
        rd_p = jnp.pad(rd, ((0, pad_rows), (0, 0), (0, 0)))

        def rows(args):
            ro_r, rd_r = args                               # [T, W, 3]
            pts = ro_r[..., None, :] + rd_r[..., None, :] * z_vals[:, None]
            return jnp.sum(trilinear_sample(volume, pts, geo), axis=-1)

        sig = jax.lax.map(
            rows,
            (ro_p.reshape(n_tiles, row_tile, W_det, 3),
             rd_p.reshape(n_tiles, row_tile, W_det, 3)),
        ).reshape(n_tiles * row_tile, W_det)[:H_det]
        return sig * dt * norm

    return jax.lax.map(one_angle, jnp.asarray(angles, jnp.float32))


def project_angles(volume: jax.Array, geo: G.ConeGeometry, angles: jax.Array,
                   n_samples: int = 0) -> jax.Array:
    """X-ray transform: projections [n_angles, H, W] of ``volume``.

    ``n_samples`` = samples per ray (0 -> one sample per voxel diagonal
    step, i.e. ~2x the max voxel count — conservative Nyquist for the
    line integral; the ``accuracy`` field of the reference geometry plays
    the same role in TIGRE).

    CPU-only by default on TPU platforms — see :func:`_tpu_guard`.
    """
    _tpu_guard()
    return _project_angles_impl(volume, geo, angles, n_samples)


def project_angles_parallel_cpu(volume, geo: G.ConeGeometry, angles,
                                n_samples: int = 0) -> "np.ndarray":
    """Fast HOST-CPU X-ray transform for PARALLEL-beam geometries.

    For a parallel beam the sample point of detector pixel (u, v) at
    depth step s is an AFFINE function of (v, u, s) — rays share one
    direction and origins vary linearly across the detector plane — so
    each view is one ``scipy.ndimage.affine_transform`` (C-speed
    trilinear resample) followed by a sum over the depth axis.  ~100x the
    throughput of the jitted XLA path on CPU (which executes the gather
    ~serially), and the supported generator at real-scan sizes given the
    TPU quarantine (docs/projector_tpu_fault.md).  Matches
    :func:`project_angles` to interpolation accuracy (see
    tests/test_data.py::test_parallel_cpu_projector_matches_jax).
    """
    from scipy.ndimage import affine_transform

    if geo.mode != "parallel":
        raise NotImplementedError("affine fast path requires parallel mode")
    if n_samples == 0:
        n_samples = 2 * int(np.max(geo.nVoxel))
    vol = np.asarray(volume, np.float32)
    near, far = G.get_near_far(geo)
    dt = (far - near) / (n_samples - 1)
    n = np.asarray(geo.nVoxel, np.float32)
    d = np.asarray(geo.dVoxel, np.float32)
    half = (n * d) / 2.0 - d / 2.0
    W_det, H_det = geo.nDetector

    out = np.empty((len(angles), H_det, W_det), np.float32)
    for i, ang in enumerate(np.asarray(angles, np.float32)):
        ro, rd = G.rays_for_angle(geo, float(ang))          # [H, W, 3]
        ro = np.asarray(ro, np.float64)
        rd0 = np.asarray(rd, np.float64)[0, 0]              # shared direction
        # world point of output sample (v, u, s):
        #   p = ro[0, 0] + dv*v + du*u + rd0*(near + dt*s)
        dv = ro[1, 0] - ro[0, 0] if H_det > 1 else np.zeros(3)
        du = ro[0, 1] - ro[0, 0] if W_det > 1 else np.zeros(3)
        base = ro[0, 0] + rd0 * float(near)
        # affine_transform: input_idx = M @ out_idx + offset, and the
        # sampling convention idx = (p + half) / d (see trilinear_sample)
        M = np.stack([dv, du, rd0 * float(dt)], axis=1) / d[:, None]
        off = (base + half) / d
        # chunk the depth axis: a full [H, W, S] f32 buffer at real-scan
        # sizes is ~1.3 GB; 64-sample slabs keep it ~270 MB.
        acc = np.zeros((H_det, W_det), np.float64)
        for s0 in range(0, n_samples, 64):
            ns = min(64, n_samples - s0)
            off_s = off + M[:, 2] * s0
            sampled = affine_transform(
                vol, M, offset=off_s, output_shape=(H_det, W_det, ns),
                order=1, mode="constant", cval=0.0)
            acc += sampled.sum(axis=-1, dtype=np.float64)
        out[i] = acc.astype(np.float32)
    return out * float(dt) * float(np.linalg.norm(rd0))
