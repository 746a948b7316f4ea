"""Geometry golden-value tests.

The oracle below is an independent NumPy transcription of the documented
reference math (pose composition tigre.py:530-572, detector plane
tigre.py:428-429/486-487, near/far tigre.py:575-586) — sign/order errors
here silently destroy PSNR, so these are checked element-wise.
"""

import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G


def oracle_pose(DSO, angle, tilt_deg):
    phi1 = -np.pi / 2
    R1 = np.array([[1, 0, 0],
                   [0, np.cos(phi1), -np.sin(phi1)],
                   [0, np.sin(phi1), np.cos(phi1)]])
    phi2 = np.pi / 2
    R2 = np.array([[np.cos(phi2), -np.sin(phi2), 0],
                   [np.sin(phi2), np.cos(phi2), 0],
                   [0, 0, 1]])
    R3 = np.array([[np.cos(angle), -np.sin(angle), 0],
                   [np.sin(angle), np.cos(angle), 0],
                   [0, 0, 1]])
    t = np.radians(tilt_deg)
    R4 = np.array([[1, 0, 0],
                   [0, np.cos(t), np.sin(t)],
                   [0, -np.sin(t), np.cos(t)]])
    rot = R3 @ R2 @ R1 @ R4
    trans = np.array([DSO * np.cos(angle), DSO * np.sin(angle), DSO * np.tan(t)])
    T = np.eye(4)
    T[:3, :3] = rot
    T[:3, 3] = trans
    return T


GEO_PARALLEL = G.ConeGeometry(
    DSD=1.5, DSO=1.0, nDetector=(6, 4), dDetector=(0.002, 0.003),
    nVoxel=(32, 32, 16), dVoxel=(0.01, 0.01, 0.01),
    offOrigin=(0.0, 0.0, 0.0), offDetector=(0.001, -0.002),
    mode="parallel", tilt_angle=29.0,
)
GEO_CONE = G.ConeGeometry(
    DSD=1.5, DSO=1.0, nDetector=(6, 4), dDetector=(0.002, 0.003),
    nVoxel=(32, 32, 16), dVoxel=(0.01, 0.01, 0.01),
    offOrigin=(0.0, 0.0, 0.0), offDetector=(0.001, -0.002),
    mode="cone", tilt_angle=0.0,
)


@pytest.mark.parametrize("angle", [0.0, 0.3, 1.7, 3.9])
@pytest.mark.parametrize("tilt", [0.0, 29.0, -12.5])
def test_pose_matches_oracle(angle, tilt):
    got = np.asarray(G.angle_to_pose(1.0, angle, tilt))
    want = oracle_pose(1.0, angle, tilt)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pose_rotation_orthonormal():
    pose = np.asarray(G.angle_to_pose(2.0, 0.77, 29.0))
    R = pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_detector_uv_opencv_convention():
    u, v = G.detector_uv(GEO_PARALLEL)
    u, v = np.asarray(u), np.asarray(v)
    W, H = GEO_PARALLEL.nDetector
    assert u.shape == (H, W) and v.shape == (H, W)
    # pixel (r, c): u = (c + .5 - W/2)*du + offu ; v = (r + .5 - H/2)*dv + offv
    r, c = 1, 4
    assert np.isclose(u[r, c], (c + 0.5 - W / 2) * 0.002 + 0.001)
    assert np.isclose(v[r, c], (r + 0.5 - H / 2) * 0.003 - 0.002)
    # u constant along rows' first axis, v along columns
    assert np.allclose(u[0], u[-1]) and np.allclose(v[:, 0], v[:, -1])


def test_parallel_rays_match_oracle():
    angle = 0.9
    ro, rd = G.rays_for_angle(GEO_PARALLEL, angle)
    ro, rd = np.asarray(ro), np.asarray(rd)
    pose = oracle_pose(1.0, angle, 29.0)
    u, v = np.asarray(G.detector_uv(GEO_PARALLEL)[0]), np.asarray(G.detector_uv(GEO_PARALLEL)[1])
    want_d = (pose[:3, :3] @ np.array([0.0, 0.0, 1.0]))[None, None]
    np.testing.assert_allclose(rd, np.broadcast_to(want_d, rd.shape), atol=1e-6)
    plane = np.stack([u, v, np.zeros_like(u)], -1)
    want_o = np.einsum("ij,hwj->hwi", pose[:3, :3], plane) + pose[:3, 3]
    np.testing.assert_allclose(ro, want_o, atol=1e-6)
    # parallel dirs are unit-norm (rotation of e_z)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, atol=1e-6)


def test_cone_rays_match_oracle():
    angle = 2.1
    ro, rd = G.rays_for_angle(GEO_CONE, angle)
    ro, rd = np.asarray(ro), np.asarray(rd)
    pose = oracle_pose(1.0, angle, 0.0)
    u, v = np.asarray(G.detector_uv(GEO_CONE)[0]), np.asarray(G.detector_uv(GEO_CONE)[1])
    dirs = np.stack([u / 1.5, v / 1.5, np.ones_like(u)], -1)
    want_d = np.einsum("ij,hwj->hwi", pose[:3, :3], dirs)
    np.testing.assert_allclose(rd, want_d, atol=1e-6)
    np.testing.assert_allclose(ro, np.broadcast_to(pose[:3, 3], ro.shape), atol=1e-6)


def test_near_far():
    near, far = G.get_near_far(GEO_PARALLEL)
    s = np.asarray(GEO_PARALLEL.sVoxel)
    dist_max = np.max([
        np.hypot(sx * s[0] / 2, sy * s[1] / 2) for sx in (-1, 1) for sy in (-1, 1)
    ])
    assert np.isclose(near, max(0, 1.0 - dist_max - 0.005))
    assert np.isclose(far, min(2.0, 1.0 + dist_max + 0.005))


def test_voxel_grid_centers():
    grid = G.voxel_grid(GEO_PARALLEL)
    n1, n2, n3 = GEO_PARALLEL.nVoxel
    assert grid.shape == (n1, n2, n3, 3)
    s = np.asarray(GEO_PARALLEL.sVoxel) / 2 - np.asarray(GEO_PARALLEL.dVoxel) / 2
    np.testing.assert_allclose(grid[0, 0, 0], [-s[0], -s[1], -s[2]], atol=1e-7)
    np.testing.assert_allclose(grid[-1, -1, -1], [s[0], s[1], s[2]], atol=1e-7)
    # uniform spacing = dVoxel
    np.testing.assert_allclose(
        grid[1, 0, 0, 0] - grid[0, 0, 0, 0], GEO_PARALLEL.dVoxel[0], rtol=1e-5
    )


def test_from_dict_mm_to_m():
    geo = G.ConeGeometry.from_dict({
        "DSD": 1500.0, "DSO": 1000.0,
        "nDetector": [6, 4], "dDetector": [2.0, 3.0],
        "nVoxel": [32, 32, 16], "dVoxel": [10.0, 10.0, 10.0],
        "offOrigin": [0, 0, 0], "offDetector": [1.0, -2.0],
        "accuracy": 0.5, "mode": "parallel", "filter": None, "tilt_angle": 29,
    })
    assert geo.DSD == 1.5 and geo.DSO == 1.0
    assert geo.dDetector == (0.002, 0.003)
    assert geo.tilt_angle == 29.0
    # tilt_angle default
    geo2 = G.ConeGeometry.from_dict({
        "DSD": 1500.0, "DSO": 1000.0, "nDetector": [6, 4], "dDetector": [2, 3],
        "nVoxel": [32, 32, 16], "dVoxel": [10, 10, 10],
        "offOrigin": [0, 0, 0], "offDetector": [0, 0],
        "accuracy": 0.5, "mode": "cone", "filter": None,
    })
    assert geo2.tilt_angle == 0.0


def test_pack_rays_layout():
    ro, rd = G.rays_for_angle(GEO_PARALLEL, 0.0)
    rays = np.asarray(G.pack_rays(ro, rd, 0.7, 1.3))
    assert rays.shape[-1] == 8
    np.testing.assert_allclose(rays[..., 6], 0.7)
    np.testing.assert_allclose(rays[..., 7], 1.3)


class TestRaysForPixels:
    """On-the-fly per-pixel rays must equal the full-view bundle restricted
    to those pixels (both scanner modes, with tilt)."""

    @pytest.mark.parametrize("mode,tilt", [("cone", 0.0), ("parallel", 30.0)])
    def test_matches_full_view(self, mode, tilt):
        import jax.numpy as jnp

        geo = G.ConeGeometry(
            DSD=1.5, DSO=1.0, nDetector=(7, 5), dDetector=(0.01, 0.012),
            nVoxel=(8, 8, 8), dVoxel=(0.01, 0.01, 0.01), mode=mode,
            tilt_angle=tilt, offDetector=(0.003, -0.002),
        )
        angle = 0.77
        ro_full, rd_full = G.rays_for_angle(geo, angle)
        rng = np.random.default_rng(5)
        W = geo.nDetector[0]
        flat = rng.integers(0, ro_full.shape[0] * W, 13).astype(np.int32)
        rows, cols = flat // W, flat % W
        ro, rd = G.rays_for_pixels(geo, angle, jnp.asarray(rows), jnp.asarray(cols))
        np.testing.assert_allclose(
            np.asarray(ro), np.asarray(ro_full)[rows, cols], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rd), np.asarray(rd_full)[rows, cols], atol=1e-6)


def test_near_far_tilted_bounds_in_plane_variant():
    """3D-corner near/far must be at least as wide as the in-plane bound
    and strictly wider when the volume has z extent."""
    geo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(8, 8), dDetector=(0.01, 0.01),
        nVoxel=(16, 16, 32), dVoxel=(0.01, 0.01, 0.01), mode="parallel",
        tilt_angle=29.0,
    )
    n0, f0 = G.get_near_far(geo)
    n1, f1 = G.get_near_far_tilted(geo)
    assert n1 < n0 and f1 > f0
    assert 0.0 <= n1 < f1 <= 2 * geo.DSO
