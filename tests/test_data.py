"""Data-layer tests: projector vs analytic oracles, generator schema,
device-resident dataset sampling, noise model, real-data formatter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.data import (
    format_real_data,
    generate,
    make_dataset,
)
from neuralvolumetricreconstructionformedicalimages_tpu.data.dataset import (
    gather_view_batch,
)
from neuralvolumetricreconstructionformedicalimages_tpu.data.generate import add_ct_noise
from neuralvolumetricreconstructionformedicalimages_tpu.data.phantoms import get_phantom
from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import (
    project_angles,
    trilinear_sample,
)


GEO = G.ConeGeometry(
    DSD=1.5, DSO=1.0, nDetector=(24, 24), dDetector=(0.004, 0.004),
    nVoxel=(40, 40, 40), dVoxel=(0.002, 0.002, 0.002),
    mode="parallel", tilt_angle=0.0,
)


def test_trilinear_sample_exact_at_centers_and_outside():
    vol = jnp.asarray(np.random.default_rng(0).random(GEO.nVoxel), jnp.float32)
    grid = jnp.asarray(G.voxel_grid(GEO))
    # sampling exactly at voxel centers reproduces the volume
    got = trilinear_sample(vol, grid, GEO)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vol), atol=1e-5)
    # far outside -> 0
    far_pts = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -0.9, 0.3]], jnp.float32)
    np.testing.assert_allclose(np.asarray(trilinear_sample(vol, far_pts, GEO)), 0.0)


def test_projector_ball_chord():
    """Parallel projection of a uniform ball = chord length 2*sqrt(r^2-b^2)."""
    vol = jnp.asarray(get_phantom("ball", GEO.nVoxel))  # radius 0.6 in [-1,1] cube
    r_world = 0.6 * (GEO.nVoxel[0] * GEO.dVoxel[0] / 2)  # 0.6 * 0.04 = 0.024 m
    projs = np.asarray(project_angles(vol, GEO, jnp.asarray([0.0, 1.1]), n_samples=256))
    ro, rd = G.rays_for_angle(GEO, 0.0)
    b = np.linalg.norm(np.cross(np.asarray(ro), np.asarray(rd)), axis=-1)
    want = 2 * np.sqrt(np.maximum(r_world**2 - b**2, 0.0))
    # interior rays (not grazing) should match within voxelization error
    interior = b < 0.7 * r_world
    err = np.abs(projs[0] - want)[interior]
    assert err.max() < 0.15 * 2 * r_world
    # rotation invariance for a centered ball (limited by voxelization)
    np.testing.assert_allclose(projs[0], projs[1], atol=0.08 * 2 * r_world)


def test_generate_schema_matches_reference_format():
    scan = dict(nVoxel=[16, 16, 16], dVoxel=[2.0, 2.0, 2.0],
                nDetector=[12, 12], dDetector=[3.0, 3.0],
                numTrain=4, numVal=2, mode="parallel")
    data = generate(scan, phantom="cubes", seed=1)
    # keys the reference dataset reads (tigre.py:230-320)
    for k in ["DSD", "DSO", "nDetector", "dDetector", "nVoxel", "dVoxel",
              "offOrigin", "offDetector", "accuracy", "mode", "image",
              "numTrain", "numVal", "train", "val"]:
        assert k in data, k
    assert data["train"]["projections"].shape == (4, 12, 12)
    assert data["val"]["projections"].shape == (2, 12, 12)
    assert data["train"]["angles"].shape == (4,)
    assert data["image"].shape == (16, 16, 16)
    # evenly spaced train angles over totalAngle (generateData.py:174)
    want = np.linspace(0, np.pi, 5)[:-1]
    np.testing.assert_allclose(data["train"]["angles"], want, atol=1e-12)


def _integrate_along_rays(image, geo, rays, n_samples):
    """Independent line integral along *packed dataset rays* [N, 8]."""
    rays = np.asarray(rays).reshape(-1, 8)
    o, d = jnp.asarray(rays[:, :3]), jnp.asarray(rays[:, 3:6])
    near, far = rays[:, 6:7], rays[:, 7:8]
    t = np.linspace(0.0, 1.0, n_samples, dtype=np.float32)
    z = jnp.asarray(near * (1 - t) + far * t)               # [N, S]
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    sig = trilinear_sample(jnp.asarray(image), pts, geo)
    dt = jnp.asarray((far - near) / (n_samples - 1))
    return np.asarray(jnp.sum(sig, axis=-1) * dt[:, 0]
                      * jnp.linalg.norm(d, axis=-1))


def test_reference_convention_roundtrip():
    """A reference-format pickle round-trips: the stored GT volume,
    integrated along the *dataset's* packed rays, reproduces the stored
    projections (VERDICT r1 missing #3).

    The phantom is asymmetric (bright cube in the +z/+x octant) so any
    axis transpose or flip mismatch between the generator's projection
    layout (generateData.py:178 conventions) and the training-side ray
    layout (tigre.py:463-528) would show up as a gross error.
    """
    nv = (24, 24, 24)
    image = np.zeros(nv, np.float32)
    image[15:21, 9:15, 16:22] = 1.0  # +x, center-y, +z
    geo = G.ConeGeometry(DSD=1.5, DSO=1.0, nDetector=(20, 20),
                         dDetector=(0.003, 0.003), nVoxel=nv,
                         dVoxel=(0.002, 0.002, 0.002), mode="parallel")
    angles = np.asarray([0.0, 0.7, 2.1], np.float32)
    projs = np.asarray(project_angles(jnp.asarray(image), geo, angles,
                                      n_samples=256))
    data = dict(DSD=1500.0, DSO=1000.0, nDetector=[20, 20],
                dDetector=[3.0, 3.0], nVoxel=list(nv), dVoxel=[2.0, 2.0, 2.0],
                offOrigin=[0, 0, 0], offDetector=[0, 0], accuracy=0.5,
                mode="parallel", filter=None, numTrain=3, numVal=3,
                image=image,
                train={"angles": angles, "projections": projs},
                val={"angles": angles, "projections": projs})

    ds = make_dataset(data, "train", n_rays=16)
    # independent integrator, different sampling rate than the generator
    got = _integrate_along_rays(ds.image, ds.geo, ds.rays, n_samples=301)
    want = np.asarray(ds.projs).reshape(-1)
    scale = want.max()
    assert scale > 0
    err = np.abs(got - want) / scale
    assert err.max() < 0.05, f"max rel err {err.max():.3f}"


def test_tigre_axis_convention_chain_cancels():
    """The reference generator's transform chain — volume transposed to
    (z, y, x) with nVoxel[::-1] geometry (generateData.py:66-73), detector
    v-axis flipped on output (generateData.py:178) — cancels against a
    z-y-x-indexed projector, landing in exactly the layout our native
    projector emits.  Emulates TIGRE's volume indexing independently of
    ``trilinear_sample``'s (x, y, z) convention."""
    nv = (16, 20, 12)  # deliberately anisotropic: transposes can't hide
    rng = np.random.default_rng(3)
    image = (rng.random(nv) > 0.8).astype(np.float32)
    geo = G.ConeGeometry(DSD=1.5, DSO=1.0, nDetector=(14, 18),
                         dDetector=(0.003, 0.003), nVoxel=nv,
                         dVoxel=(0.002, 0.002, 0.002), mode="parallel")
    angles = np.asarray([0.4, 1.9], np.float32)
    native = np.asarray(project_angles(jnp.asarray(image), geo, angles,
                                       n_samples=200))

    # --- TIGRE-emulated chain -----------------------------------------
    vol_zyx = np.transpose(image, (2, 1, 0)).copy()  # generateData.py:178
    n_zyx = np.asarray(nv[::-1], np.float32)         # generateData.py:66
    d_zyx = np.asarray(geo.dVoxel[::-1], np.float32)
    half = n_zyx * d_zyx / 2.0 - d_zyx / 2.0

    def sample_zyx(pts):  # pts [..., 3] world (x, y, z)
        f = (np.stack([pts[..., 2], pts[..., 1], pts[..., 0]], -1) + half) / d_zyx
        i0 = np.floor(f).astype(np.int64)
        frac = f - i0
        inside = ((f >= -1e-4) & (f <= n_zyx - 1 + 1e-4)).all(-1)
        c0 = np.clip(i0, 0, n_zyx.astype(int) - 1)
        c1 = np.clip(i0 + 1, 0, n_zyx.astype(int) - 1)
        out = 0.0
        for bz in (0, 1):
            for by in (0, 1):
                for bx in (0, 1):
                    idx = np.where([bz, by, bx], c1, c0)
                    w = np.prod(np.where([bz, by, bx], frac, 1 - frac), -1)
                    out = out + vol_zyx[idx[..., 0], idx[..., 1], idx[..., 2]] * w
        return np.where(inside, out, 0.0)

    near, far = G.get_near_far(geo)
    t = np.linspace(0, 1, 200, dtype=np.float32)
    z = near * (1 - t) + far * t
    dt = (far - near) / 199
    emulated = []
    for a in angles:
        ro, rd = (np.asarray(x) for x in G.rays_for_angle(geo, float(a)))
        pts = ro[:, :, None, :] + rd[:, :, None, :] * z[:, None]
        acc = sample_zyx(pts).sum(-1) * dt * np.linalg.norm(rd, axis=-1)
        emulated.append(acc[::-1, :])   # TIGRE v-axis runs opposite ours...
    emulated = np.stack(emulated)[:, ::-1, :]  # ...and the reference flips it back
    np.testing.assert_allclose(emulated, native, atol=1e-4)


def test_dataset_sampling_valid_pixels_only():
    scan = dict(nVoxel=[16, 16, 16], dVoxel=[2.0, 2.0, 2.0],
                nDetector=[12, 12], dDetector=[3.0, 3.0],
                numTrain=4, numVal=2, mode="parallel")
    data = generate(scan, phantom="ball", seed=1)
    ds = make_dataset(data, "train", n_rays=64)
    projs = np.asarray(ds.projs)
    arrays = ds.arrays()
    for v in range(4):
        batch = gather_view_batch(arrays, jnp.asarray(v), jax.random.key(v), 64)
        flat = projs[v].reshape(-1)
        # every sampled pixel is valid (|proj| > 0, tigre.py:356)
        assert (np.abs(flat[np.asarray(batch["pix"])]) > 0).all()
        # returned projs/rays correspond to the sampled pixels
        np.testing.assert_allclose(
            np.asarray(batch["projs"]), flat[np.asarray(batch["pix"])])
    # rays layout: near/far in last two slots
    np.testing.assert_allclose(np.asarray(batch["rays"])[:, 6], ds.near, rtol=1e-6)


def test_dataset_mask_from_full_proj():
    scan = dict(nVoxel=[16, 16, 16], dVoxel=[2.0, 2.0, 2.0],
                nDetector=[12, 12], dDetector=[3.0, 3.0],
                numTrain=2, numVal=1, mode="parallel")
    data = generate(scan, phantom="ball", seed=1)
    # full_proj with a dark stripe below threshold
    fp = np.full((12, 12), 1.0, np.complex64)
    fp[:, :4] = 1e-4
    data["full_proj"] = np.stack([fp, fp])
    ds = make_dataset(data, "train", n_rays=16)
    mask = np.asarray(ds.mask)
    assert mask.shape == (2, 12, 12)
    assert mask[:, :, :3].mean() < 0.5 and mask[:, :, 6:].mean() == 1.0


def test_ct_noise_model():
    projs = np.full((2, 8, 8), 0.5, np.float32)
    noisy = add_ct_noise(projs, poisson=1e5, gaussian=(0.0, 10.0), seed=0)
    assert noisy.shape == projs.shape
    assert (noisy >= 0).all()
    # unbiased-ish around the clean value
    assert abs(noisy.mean() - 0.5) < 0.05
    # higher dose -> lower variance
    lo = add_ct_noise(projs, poisson=1e7, gaussian=(0.0, 0.0), seed=0)
    hi = add_ct_noise(projs, poisson=1e4, gaussian=(0.0, 0.0), seed=0)
    assert lo.std() < hi.std()


def test_format_real_data_schema():
    rng = np.random.default_rng(0)
    projections = (rng.random((5, 8, 10)) + 1j * rng.random((5, 8, 10))).astype(np.complex64)
    angles = np.linspace(0.72, 179.28, 5)
    data = format_real_data(projections, angles, tilt_angle=29.0, n_slices=7)
    # rot90 swaps H and W (format_data.py:7)
    assert data["train"]["projections"].shape == (5, 10, 8)
    assert data["nDetector"] == [8, 10]  # [W, H] after rot90
    assert data["mode"] == "parallel" and data["tilt_angle"] == 29.0
    np.testing.assert_allclose(data["train"]["angles"], np.deg2rad(angles))
    assert data["full_proj"].dtype == np.complex64
    # phase in [-pi, pi]
    assert np.abs(data["train"]["projections"]).max() <= np.pi + 1e-6
    # loadable by the dataset layer
    ds = make_dataset(data, "train", n_rays=8)
    assert ds.geo.mode == "parallel"
    b = gather_view_batch(ds.arrays(), jnp.asarray(0), jax.random.key(0), 8)
    assert b["rays"].shape == (8, 8)


class TestOnTheFlyRays:
    def test_gather_matches_precomputed(self):
        """Same key -> identical batch whether rays are device-resident or
        regenerated per sampled pixel (data/dataset.py ray_mode)."""
        import jax

        from neuralvolumetricreconstructionformedicalimages_tpu.data.dataset import (
            gather_view_batch, make_dataset)
        from neuralvolumetricreconstructionformedicalimages_tpu.data.generate import (
            generate)

        data = generate({"nDetector": [16, 16], "dDetector": [16.0, 16.0],
                         "nVoxel": [16, 16, 16], "dVoxel": [8.0, 8.0, 8.0],
                         "numTrain": 3, "numVal": 2}, phantom="ball", seed=0)
        pre = make_dataset(data, "train", n_rays=32, ray_mode="precomputed")
        otf = make_dataset(data, "train", n_rays=32, ray_mode="onthefly")
        assert otf.rays is None and "angles" in otf.arrays()

        key = jax.random.key(9)
        view = jnp.int32(1)
        b_pre = gather_view_batch(pre.arrays(), view, key, 32)
        b_otf = gather_view_batch(otf.arrays(), view, key, 32,
                                  geo=otf.geo, near=otf.near, far=otf.far)
        for k in ("rays", "projs", "mask", "pix"):
            np.testing.assert_allclose(
                np.asarray(b_pre[k]), np.asarray(b_otf[k]), atol=1e-5,
                err_msg=k)

        # eval path: on-demand full-view rays equal the precomputed ones
        np.testing.assert_allclose(
            np.asarray(otf.view_rays(2)), np.asarray(pre.view_rays(2)),
            atol=1e-6)

    def test_auto_threshold(self):
        from neuralvolumetricreconstructionformedicalimages_tpu.data import dataset as D

        assert 187 * 1024 * 1024 * 8 * 4 > D._RAY_TENSOR_BYTES_LIMIT  # brain real
        assert 50 * 256 * 256 * 8 * 4 < D._RAY_TENSOR_BYTES_LIMIT     # chest


def test_projector_tpu_guard(monkeypatch):
    """The projector must refuse TPU backends by default: the program
    reproducibly kills the remote TPU worker (docs/projector_tpu_fault.md);
    NVR_PROJECTOR_ON_TPU=1 overrides."""
    import pytest as _pytest

    from neuralvolumetricreconstructionformedicalimages_tpu.data import projector

    monkeypatch.setattr(projector.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("NVR_PROJECTOR_ON_TPU", raising=False)
    vol = jnp.zeros((4, 4, 4))
    with _pytest.raises(RuntimeError, match="projector_tpu_fault"):
        projector.project_angles(vol, GEO, jnp.asarray([0.0]), n_samples=8)
    monkeypatch.setenv("NVR_PROJECTOR_ON_TPU", "1")
    projector.project_angles(vol, GEO, jnp.asarray([0.0]), n_samples=8)


def test_projector_prime_detector_height():
    """A detector height with no divisor under the row budget must still
    tile (rows padded up, not degraded to one-row map iterations)."""
    import neuralvolumetricreconstructionformedicalimages_tpu.geometry as _G

    geo = _G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(16, 13), dDetector=(0.01, 0.01),
        nVoxel=(16, 16, 16), dVoxel=(0.008, 0.008, 0.008), mode="parallel")
    from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import (
        project_angles as pa)

    out = pa(jnp.ones((16, 16, 16)), geo, jnp.asarray([0.3]), n_samples=32)
    assert out.shape == (1, 13, 16)
    assert bool(jnp.isfinite(out).all())


def test_parallel_cpu_projector_matches_jax():
    """The affine fast-path CPU projector must match the jitted reference
    projector (tilted parallel geometry included)."""
    import neuralvolumetricreconstructionformedicalimages_tpu.geometry as _G
    from neuralvolumetricreconstructionformedicalimages_tpu.data.phantoms import (
        get_phantom)
    from neuralvolumetricreconstructionformedicalimages_tpu.data.projector import (
        project_angles, project_angles_parallel_cpu)

    geo = _G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(48, 40), dDetector=(0.01, 0.01),
        nVoxel=(64, 64, 64), dVoxel=(0.004, 0.004, 0.004),
        mode="parallel", tilt_angle=29.0)
    vol = np.asarray(get_phantom("ball", (64, 64, 64)), np.float32)
    angles = np.linspace(0.1, 3.0, 3).astype(np.float32)
    a = np.asarray(project_angles(jnp.asarray(vol), geo, angles, 160))
    b = project_angles_parallel_cpu(vol, geo, angles, 160)
    assert np.abs(a).max() > 0.01
    np.testing.assert_allclose(b, a, atol=0.02 * float(np.abs(a).max()))
