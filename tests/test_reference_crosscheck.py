"""Numerical cross-checks against the ACTUAL reference implementation.

Every other parity test in this suite compares against oracles
*transcribed* from the reference; these import the reference's own torch
code (CPU) from ``/root/reference`` and assert allclose — the BASELINE.md
"forward projections + pixel gradients vs reference NAF" axis
(VERDICT r3 missing #2).

The CUDA hash extension cannot run here, so the shared-weight model paths
use the frequency and identity encoders; geometry, integration, sampling,
losses and metrics are checked directly.  Absent reference deps
(open3d, torchvision, skimage) are stubbed in ``sys.modules``; reference
modules load by file path so no package ``__init__`` pulls in the CUDA
extension.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from neuralvolumetricreconstructionformedicalimages_tpu import geometry as G
from neuralvolumetricreconstructionformedicalimages_tpu import losses as L
from neuralvolumetricreconstructionformedicalimages_tpu import metrics as M
from neuralvolumetricreconstructionformedicalimages_tpu.models.density_field import (
    DensityFieldSpec,
)
from neuralvolumetricreconstructionformedicalimages_tpu.models.encoders import (
    FreqEncoderSpec,
    IdentityEncoderSpec,
)
from neuralvolumetricreconstructionformedicalimages_tpu.ops.integration import (
    raw2outputs,
)
from neuralvolumetricreconstructionformedicalimages_tpu.ops.sampling import sample_pdf
from neuralvolumetricreconstructionformedicalimages_tpu.render import render_rays

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)


def _stub_module(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference modules loaded from /root/reference (torch CPU)."""
    _stub_module("open3d")
    _stub_module("torchvision")
    sk = _stub_module("skimage")
    sk.metrics = _stub_module(
        "skimage.metrics", structural_similarity=lambda *a, **k: 0.0)
    if REF not in sys.path:
        sys.path.insert(0, REF)  # resolves `from src.loss import ...`
    ns = types.SimpleNamespace(
        network=_load("ref_network", "src/network/network.py"),
        freq=_load("ref_freq", "src/encoder/freqencoder.py"),
        render=_load("ref_render", "src/render/render.py"),
        tigre=_load("ref_tigre", "src/dataset/tigre.py"),
        loss=_load("ref_loss", "src/loss/loss.py"),
        util=_load("ref_util", "src/utils/util.py"),
    )
    return ns


# ---------------------------------------------------------------------------
# Geometry (tigre.py:402-610)
# ---------------------------------------------------------------------------

def _ref_geo(ref, mode="cone", tilt=0.0):
    data = {
        "DSD": 1500.0, "DSO": 1000.0,
        "nDetector": [12, 10], "dDetector": [2.0, 2.0],
        "nVoxel": [16, 16, 16], "dVoxel": [2.0, 2.0, 2.0],
        "offOrigin": [0, 0, 0], "offDetector": [0, 0],
        "accuracy": 0.5, "mode": mode, "filter": None,
        "tilt_angle": tilt,
    }
    return ref.tigre.ConeGeometry(data)


def _our_geo(mode="cone", tilt=0.0):
    return G.ConeGeometry(
        DSD=1.5, DSO=1.0, nDetector=(12, 10), dDetector=(0.002, 0.002),
        nVoxel=(16, 16, 16), dVoxel=(0.002, 0.002, 0.002), mode=mode,
        tilt_angle=tilt,
    )


class _DatasetShim:
    """Exposes the two unbound TIGREDataset methods under test without
    constructing the dataset (its __init__ needs a pickle on disk)."""

    def __init__(self, ref):
        self.angle2pose = lambda DSO, a, t: ref.tigre.TIGREDataset.angle2pose(
            self, DSO, a, t)
        self.get_rays = lambda angles, geo, device: ref.tigre.TIGREDataset.get_rays(
            self, angles, geo, device)
        self.get_near_far = lambda geo: ref.tigre.TIGREDataset.get_near_far(
            self, geo)


@pytest.mark.parametrize("tilt", [0.0, 29.0])
def test_angle2pose_matches_reference(ref, tilt):
    shim = _DatasetShim(ref)
    for angle in [0.0, 0.7, 2.3, np.pi]:
        ours = np.asarray(G.angle_to_pose(1.0, angle, tilt))
        theirs = shim.angle2pose(1.0, angle, tilt)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,tilt", [("cone", 0.0), ("parallel", 0.0),
                                       ("parallel", 29.0)])
def test_get_rays_matches_reference(ref, mode, tilt):
    shim = _DatasetShim(ref)
    angles = np.array([0.0, 0.9, 2.1], np.float32)
    theirs = shim.get_rays(angles, _ref_geo(ref, mode, tilt), "cpu").numpy()
    ro, rd = G.rays_for_angles(_our_geo(mode, tilt), angles)
    ours = np.concatenate([np.asarray(ro), np.asarray(rd)], axis=-1)
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-6)


def test_get_near_far_matches_reference(ref):
    shim = _DatasetShim(ref)
    near_t, far_t = shim.get_near_far(_ref_geo(ref))
    near_o, far_o = G.get_near_far(_our_geo())
    np.testing.assert_allclose([near_o, far_o], [near_t, far_t], rtol=1e-6)


# ---------------------------------------------------------------------------
# Integration + hierarchical sampling (render.py:178-246)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("out_dim", [1, 2])
def test_raw2outputs_matches_reference(ref, out_dim):
    rng = np.random.default_rng(0)
    raw = rng.uniform(0, 1, (6, 16, out_dim)).astype(np.float32)
    z = np.sort(rng.uniform(0.8, 1.2, (6, 16)).astype(np.float32), axis=-1)
    rd = rng.normal(size=(6, 3)).astype(np.float32)
    acc_t, w_t = ref.render.raw2outputs(
        torch.from_numpy(raw), torch.from_numpy(z), torch.from_numpy(rd))
    acc_o, w_o = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(acc_o), acc_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w_o), w_t.numpy(), rtol=1e-5, atol=1e-7)


def test_sample_pdf_matches_reference(ref):
    rng = np.random.default_rng(1)
    bins = np.sort(rng.uniform(0.8, 1.2, (4, 15)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (4, 14)).astype(np.float32)
    theirs = ref.render.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), 8, det=True).numpy()
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 8,
                                 det=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Shared-weight model forward + projection + pixel gradients
# ---------------------------------------------------------------------------

class _IdentityTorchEncoder(torch.nn.Module):
    """output_dim-carrying identity encoder (the reference factory's
    ``encoding: "None"`` lambda lacks .output_dim, src/encoder/__init__.py:11-12)."""

    output_dim = 3

    def forward(self, x, bound):
        return x


def _build_pair(ref, encoder_kind: str, seed=0):
    """Reference DensityNetwork + our DensityFieldSpec with IDENTICAL weights."""
    if encoder_kind == "freq":
        enc_t = ref.freq.FreqEncoder(input_dim=3, max_freq_log2=5, N_freqs=6)
        enc_o = FreqEncoderSpec(input_dim=3, max_freq_log2=5.0, n_freqs=6)
    else:
        enc_t = _IdentityTorchEncoder()
        enc_o = IdentityEncoderSpec(input_dim=3)
    torch.manual_seed(seed)
    net_t = ref.network.DensityNetwork(
        enc_t, bound=0.3, num_layers=4, hidden_dim=32, skips=[2], out_dim=1,
        last_activation="sigmoid")
    spec_o = DensityFieldSpec(
        encoder=enc_o, bound=0.3, num_layers=4, hidden_dim=32, skips=(2,),
        out_dim=1, last_activation="sigmoid")
    layers = [
        {"w": jnp.asarray(lin.weight.detach().numpy().T),
         "b": jnp.asarray(lin.bias.detach().numpy())}
        for lin in net_t.layers
    ]
    params_o = {"encoder": {}, "layers": layers}
    return net_t, spec_o, params_o


@pytest.mark.parametrize("encoder_kind", ["freq", "identity"])
def test_density_network_forward_matches_reference(ref, encoder_kind):
    net_t, spec_o, params_o = _build_pair(ref, encoder_kind)
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.29, 0.29, (257, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = net_t(torch.from_numpy(x)).numpy()
    out_o = np.asarray(spec_o.apply(params_o, jnp.asarray(x)))
    np.testing.assert_allclose(out_o, out_t, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("encoder_kind", ["freq", "identity"])
def test_projection_and_pixel_gradients_match_reference(ref, encoder_kind):
    """Full forward projections AND the parameter gradients of the pixel
    MSE loss agree between the reference render pipeline (render.py:31-146)
    and ours, with identical weights and identical rays — the BASELINE.md
    allclose axis."""
    net_t, spec_o, params_o = _build_pair(ref, encoder_kind)

    shim = _DatasetShim(ref)
    angles = np.array([0.4, 1.9], np.float32)
    geo_t = _ref_geo(ref, "cone")
    rays_t = shim.get_rays(angles, geo_t, "cpu")           # [n, H, W, 6]
    near, far = shim.get_near_far(geo_t)
    n_rays = 64
    rays_flat = rays_t.reshape(-1, 6)
    sel = np.random.default_rng(3).choice(rays_flat.shape[0], n_rays,
                                          replace=False)
    rays8_t = torch.cat([
        rays_flat[sel],
        torch.full((n_rays, 1), float(near)),
        torch.full((n_rays, 1), float(far))], dim=-1)

    target = torch.from_numpy(
        np.random.default_rng(4).uniform(0, 0.1, n_rays).astype(np.float32))

    out_t = ref.render.render(rays8_t, net_t, None, n_samples=32, n_fine=0,
                              perturb=False, netchunk=4096, raw_noise_std=0.0)
    loss_t = torch.mean((out_t["acc"] - target) ** 2)
    loss_t.backward()

    rays8_o = jnp.asarray(rays8_t.detach().numpy())

    def loss_fn(p):
        out = render_rays(rays8_o, p, spec_o, n_samples=32, n_fine=0,
                          perturb=False, raw_noise_std=0.0, key=None)
        return jnp.mean((out["acc"] - jnp.asarray(target.numpy())) ** 2), out

    (loss_o, out_o), grads_o = jax.value_and_grad(loss_fn, has_aux=True)(params_o)

    # forward projections
    np.testing.assert_allclose(np.asarray(out_o["acc"]),
                               out_t["acc"].detach().numpy(),
                               rtol=5e-5, atol=5e-7)
    # TV-on-points term (render.py:129-131)
    np.testing.assert_allclose(float(out_o["tv_loss"]),
                               float(out_t["tv_loss"]), rtol=5e-5)
    np.testing.assert_allclose(float(loss_o), float(loss_t.detach()), rtol=5e-5)

    # pixel-loss parameter gradients, layer by layer
    for i, lin in enumerate(net_t.layers):
        np.testing.assert_allclose(
            np.asarray(grads_o["layers"][i]["w"]),
            lin.weight.grad.numpy().T, rtol=5e-4, atol=1e-7,
            err_msg=f"layer {i} weight grad")
        np.testing.assert_allclose(
            np.asarray(grads_o["layers"][i]["b"]),
            lin.bias.grad.numpy(), rtol=5e-4, atol=1e-7,
            err_msg=f"layer {i} bias grad")


# ---------------------------------------------------------------------------
# Losses + metrics (loss.py, util.py)
# ---------------------------------------------------------------------------

def test_losses_match_reference(ref):
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (128,)).astype(np.float32)
    y = rng.uniform(0, 1, (128,)).astype(np.float32)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    xo, yo = jnp.asarray(x), jnp.asarray(y)

    lt = ref.loss.calc_mse_loss({"loss": torch.zeros(())}, xt, yt)
    lo = L.calc_mse_loss({"loss": jnp.zeros(())}, xo, yo)
    np.testing.assert_allclose(float(lo["loss"]), float(lt["loss"]), rtol=1e-6)

    lt = ref.loss.calc_huber_loss({"loss": torch.zeros(())}, xt, yt, delta=0.1)
    lo = L.calc_huber_loss({"loss": jnp.zeros(())}, xo, yo, delta=0.1)
    np.testing.assert_allclose(float(lo["loss"]), float(lt["loss"]), rtol=1e-6)

    lt = ref.loss.calc_l1_loss({"loss": torch.zeros(())}, xt, yt)
    lo = L.calc_l1_loss({"loss": jnp.zeros(())}, xo, yo)
    np.testing.assert_allclose(float(lo["loss"]), float(lt["loss"]), rtol=1e-6)

    # complex phase-only loss
    zc = (rng.normal(size=32) + 1j * rng.normal(size=32)).astype(np.complex64)
    wc = (rng.normal(size=32) + 1j * rng.normal(size=32)).astype(np.complex64)
    lt = ref.loss.calc_phase_only_loss(
        {"loss": torch.zeros(())}, torch.from_numpy(zc), torch.from_numpy(wc))
    lo = L.calc_phase_only_loss(
        {"loss": jnp.zeros(())}, jnp.asarray(zc), jnp.asarray(wc))
    np.testing.assert_allclose(float(lo["loss"]), float(lt["loss"]), rtol=1e-5)

    # TV-on-points regularizer (render.py:16-28; ours is the dict-mutating
    # equivalent loss.py:10-24 with weight folded in)
    pts = rng.normal(size=(16, 8, 3)).astype(np.float32)
    tv_t = ref.render.compute_tv_regularization(torch.from_numpy(pts))
    tv_o = L.compute_tv_regularization({"loss": jnp.zeros(())},
                                       jnp.asarray(pts), 1.0)["loss"]
    np.testing.assert_allclose(float(tv_o), float(tv_t), rtol=1e-5)


def test_metrics_match_reference(ref):
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, (24, 24)).astype(np.float32)
    y = rng.uniform(0, 1, (24, 24)).astype(np.float32)

    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    np.testing.assert_allclose(
        M.get_mse(x, y), float(ref.util.get_mse(xt, yt)), rtol=1e-6)
    np.testing.assert_allclose(
        M.get_psnr(x, y), float(ref.util.get_psnr(xt, yt)), rtol=1e-5)

    # complex-aware mse (util.py:18-26)
    zc = (x + 1j * y).astype(np.complex64)
    wc = (y + 1j * x).astype(np.complex64)
    np.testing.assert_allclose(
        M.get_mse(zc, wc),
        float(ref.util.get_mse(torch.from_numpy(zc), torch.from_numpy(wc))),
        rtol=1e-5)

    v1 = rng.uniform(0, 1, (10, 10, 10)).astype(np.float32)
    v2 = rng.uniform(0, 1, (10, 10, 10)).astype(np.float32)
    np.testing.assert_allclose(
        M.get_psnr_3d(v1, v2), float(ref.util.get_psnr_3d(v1, v2)), rtol=1e-5)

    # ptycho beam mask (util.py:196-205)
    hr = rng.uniform(0, 0.02, (16, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(M.get_ptycho_mask(hr, 0.007), np.float32),
        ref.util.get_ptycho_mask(torch.from_numpy(hr), 0.007).numpy().astype(
            np.float32))
