"""Renderer tests: sampling, integration, inverse-CDF, end-to-end rays."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu.ops.integration import raw2outputs
from neuralvolumetricreconstructionformedicalimages_tpu.ops.sampling import (
    sample_pdf,
    stratified_z_vals,
)
from neuralvolumetricreconstructionformedicalimages_tpu.render import (
    render_image,
    render_rays,
    query_field,
)


@dataclasses.dataclass(frozen=True)
class ConstField:
    """Stub density field: sigma = value everywhere."""

    value: float = 2.0
    bound: float = 0.5
    out_dim: int = 1

    def apply(self, params, x):
        return jnp.full(x.shape[:-1] + (self.out_dim,), self.value, x.dtype)


def test_stratified_deterministic():
    near = jnp.full((5, 1), 1.0)
    far = jnp.full((5, 1), 3.0)
    z = np.asarray(stratified_z_vals(near, far, 9, perturb=False))
    np.testing.assert_allclose(z[0], np.linspace(1, 3, 9), atol=1e-6)
    assert z.shape == (5, 9)


def test_stratified_perturbed_within_bins():
    near = jnp.full((64, 1), 1.0)
    far = jnp.full((64, 1), 3.0)
    z0 = np.asarray(stratified_z_vals(near, far, 16, perturb=False))
    z = np.asarray(stratified_z_vals(near, far, 16, perturb=True, key=jax.random.key(0)))
    mids = 0.5 * (z0[:, 1:] + z0[:, :-1])
    lower = np.concatenate([z0[:, :1], mids], -1)
    upper = np.concatenate([mids, z0[:, -1:]], -1)
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
    assert (np.diff(z, axis=-1) > -1e-6).all()  # still sorted


def test_raw2outputs_closed_form():
    """Constant sigma, uniform z: acc = sigma * (sum of dists) * |d|."""
    n_rays, n_samples = 4, 17
    z = jnp.broadcast_to(jnp.linspace(1.0, 3.0, n_samples), (n_rays, n_samples))
    sigma = 2.5
    raw = jnp.full((n_rays, n_samples, 1), sigma)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]]), (n_rays, 1))  # |d| = 2
    acc, weights = raw2outputs(raw, z, d)
    dt = 2.0 / (n_samples - 1)
    want = sigma * (dt * (n_samples - 1) + 1e-10) * 2.0
    np.testing.assert_allclose(np.asarray(acc), want, rtol=1e-5)
    # constant sigma -> delta-weights are eps except first element
    assert np.asarray(weights).max() == 1.0


def test_raw2outputs_two_channel_weights():
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 4), (2, 4))
    raw = jnp.stack([
        jnp.ones((2, 4)),
        jnp.asarray([[1.0, 2.0, 3.0, 4.0], [4.0, 3.0, 2.0, 1.0]]),
    ], -1)
    _, w = raw2outputs(raw, z, jnp.ones((2, 3)))
    np.testing.assert_allclose(np.asarray(w), np.asarray(raw[..., 1]) / 4.0, atol=1e-6)


def test_sample_pdf_deterministic_uniform_weights():
    """Uniform weights -> det samples are evenly spaced over the bins."""
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (3, 5))
    weights = jnp.ones((3, 4))
    s = np.asarray(sample_pdf(bins, weights, 9, det=True))
    assert s.shape == (3, 9)
    np.testing.assert_allclose(s[0], np.linspace(0, 1, 9), atol=1e-3)


def test_sample_pdf_concentrates_mass():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (1, 5))
    weights = jnp.asarray([[0.0, 0.0, 100.0, 0.0]])  # mass in [0.5, 0.75]
    s = np.asarray(sample_pdf(bins, weights, 64, det=False, key=jax.random.key(0)))
    frac_inside = ((s >= 0.5) & (s <= 0.75)).mean()
    assert frac_inside > 0.95


def test_render_rays_constant_field():
    field = ConstField(value=2.0, bound=0.5)
    n = 8
    rays = np.zeros((n, 8), np.float32)
    rays[:, :3] = [0, 0, -1.0]   # origin outside volume on z axis
    rays[:, 5] = 1.0             # dir +z, |d|=1
    rays[:, 6] = 0.5             # near
    rays[:, 7] = 1.5             # far
    out = render_rays(jnp.asarray(rays), {}, field, n_samples=128, perturb=False)
    # path length = far-near = 1.0, sigma = 2 -> acc ~ 2.0
    np.testing.assert_allclose(np.asarray(out["acc"]), 2.0, rtol=2e-2)
    assert out["pts"].shape == (n, 128, 3)
    # pts clamped to bound - 1e-6
    assert np.abs(np.asarray(out["pts"])).max() <= 0.5


def test_render_rays_fine_pass_shapes():
    field = ConstField()
    rays = np.zeros((4, 8), np.float32)
    rays[:, 5] = 1.0
    rays[:, 6], rays[:, 7] = 0.5, 1.5
    out = render_rays(
        jnp.asarray(rays), {}, field, n_samples=16, n_fine=8,
        perturb=False, params_fine={},
    )
    assert out["acc"].shape == (4,)
    assert out["pts"].shape == (4, 24, 3)
    assert "acc0" in out and out["acc0"].shape == (4,)
    assert out["weights0"].shape == (4, 16)


def test_render_image_matches_render_rays_and_pads():
    field = ConstField()
    n = 100  # not a multiple of tile
    rays = np.zeros((n, 8), np.float32)
    rays[:, 5] = 1.0
    rays[:, 6], rays[:, 7] = 0.5, 1.5
    acc_tiled = np.asarray(render_image(jnp.asarray(rays), {}, field, n_samples=32, tile=16))
    acc_full = np.asarray(
        render_rays(jnp.asarray(rays), {}, field, n_samples=32, perturb=False)["acc"]
    )
    assert acc_tiled.shape == (n,)
    np.testing.assert_allclose(acc_tiled, acc_full, atol=1e-5)


def test_query_field_tiling():
    field = ConstField(value=3.0)
    pts = jnp.zeros((7, 11, 3))
    out = np.asarray(query_field(pts, {}, field, tile=32))
    assert out.shape == (7, 11, 1)
    np.testing.assert_allclose(out, 3.0)
