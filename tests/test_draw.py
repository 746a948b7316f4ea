"""3D debug-viz geometry tests (reference C14, draw_util.py:4-173).

The line/point math must match the reference's open3d LineSets; rendering
is smoke-tested headlessly.
"""

import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu.utils import draw


def test_plot_rays_corner_frustum():
    W, H = 4, 3
    ro = np.zeros((W, H, 3))
    rd = np.ones((W, H, 3))
    rd[0, 0] = [1, 0, 0]
    ls = draw.plot_rays(rd, ro, ray_length=2.0)
    assert ls.points.shape == (8, 3)
    assert ls.lines.shape == (8, 2)
    # first endpoint = origin + dir * length for corner (0, 0)
    np.testing.assert_allclose(ls.points[4], [2.0, 0.0, 0.0])


def test_plot_camera_pose_axes_transform():
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    ls = draw.plot_camera_pose(pose)
    # cam set first (4 points), then world set (4 points)
    assert ls.points.shape == (8, 3)
    # camera origin column transformed by pose translation
    np.testing.assert_allclose(ls.points[0], [1.0, 2.0, 3.0])
    # world origin untouched
    np.testing.assert_allclose(ls.points[4], [0.0, 0.0, 0.0])
    # axis colors RGB per line
    np.testing.assert_allclose(ls.colors[:3], np.eye(3))


def test_plot_cube_bbox_extents():
    center = np.array([1.0, -1.0, 0.5])
    size = np.array([2.0, 4.0, 6.0])
    ls = draw.plot_cube(center, size)
    # 8 bbox corners + 4 frame points
    assert ls.points.shape == (12, 3)
    bbox_pts = ls.points[:8]
    np.testing.assert_allclose(bbox_pts.min(axis=0), center - size / 2)
    np.testing.assert_allclose(bbox_pts.max(axis=0), center + size / 2)
    assert ls.lines.shape == (15, 2)  # 12 bbox edges + 3 axes


def test_lineset_add_offsets_indices():
    a = draw.plot_cube(np.zeros(3), np.ones(3))
    b = draw.plot_camera_pose(np.eye(4))
    combined = a + b
    assert combined.points.shape[0] == a.points.shape[0] + b.points.shape[0]
    assert combined.lines[-1].max() >= a.points.shape[0]
    # segments() resolves to finite coordinates
    assert np.isfinite(combined.segments()).all()


def test_draw_scene_and_scan_geometry(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    geo = G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(8, 8), dDetector=(0.01, 0.01),
        nVoxel=(8, 8, 8), dVoxel=(0.01, 0.01, 0.01), mode="cone",
    )
    out = tmp_path / "scene.png"
    fig = draw.plot_scan_geometry(geo, angles=[0.0, np.pi / 2], path=str(out))
    plt.close(fig)
    assert out.exists() and out.stat().st_size > 0


def test_sampling_debug_plots(tmp_path):
    """manual_vmap + the sampled-point/mask scatter plots (util.py:206-304)."""
    import numpy as np

    from neuralvolumetricreconstructionformedicalimages_tpu.utils.draw import (
        manual_vmap, visualize_after_mask, visualize_sampled_points)

    out = manual_vmap(lambda x: x * 2, np.arange(6).reshape(3, 2))
    np.testing.assert_array_equal(out, np.arange(6).reshape(3, 2) * 2)

    rng = np.random.default_rng(0)
    mask = (rng.random((32, 32)) > 0.3).astype(np.float32)
    coords = rng.integers(0, 32, (50, 2))
    mvals = mask[coords[:, 0], coords[:, 1]]
    p1 = visualize_sampled_points(mask, coords, mvals, 7, outdir=str(tmp_path))
    p2 = visualize_after_mask(mask, coords, mvals, 7, outdir=str(tmp_path))
    import os
    assert os.path.exists(p1) and os.path.exists(p2)
