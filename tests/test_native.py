"""Native C++ data engine: equivalence with the NumPy reference paths.

The native library (ctypes over g++-built .so) must be bit-identical to
the Python implementations of the ptycho mask (util.py:196-205 semantics)
and valid-pixel pool construction (tigre.py:354-361 made static-shaped).
"""

import numpy as np
import pytest

from neuralvolumetricreconstructionformedicalimages_tpu import native
from neuralvolumetricreconstructionformedicalimages_tpu.metrics import get_ptycho_mask


needs_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


@needs_native
def test_native_builds():
    assert native.available()


@needs_native
@pytest.mark.parametrize("shape", [(1, 16, 16), (3, 64, 48), (2, 33, 129)])
def test_ptycho_mask_matches_numpy(shape, rng):
    hr = rng.normal(size=shape) * 0.01
    got = native.ptycho_mask_batch(hr, 0.007)
    want = np.stack([
        get_ptycho_mask(hr[i], 0.007).astype(np.float32)
        for i in range(shape[0])
    ])
    np.testing.assert_array_equal(got, want)


@needs_native
def test_ptycho_mask_complex_input(rng):
    hr = (rng.normal(size=(2, 32, 32)) + 1j * rng.normal(size=(2, 32, 32))) * 0.004
    got = native.ptycho_mask_batch(hr, 0.007)
    want = np.stack([
        get_ptycho_mask(hr[i], 0.007).astype(np.float32) for i in range(2)
    ])
    np.testing.assert_array_equal(got, want)


@needs_native
def test_build_pools_matches_numpy(rng):
    projs = rng.normal(size=(5, 24, 24)).astype(np.float32)
    projs[np.abs(projs) < 0.8] = 0.0
    pools_n, counts_n = native.build_pools(projs)
    pools_p, counts_p = native._build_pools_numpy(projs)
    np.testing.assert_array_equal(counts_n, counts_p)
    np.testing.assert_array_equal(pools_n, pools_p)


@needs_native
def test_build_pools_all_invalid_view(rng):
    projs = rng.normal(size=(3, 8, 8)).astype(np.float32)
    projs[1] = 0.0  # whole view invalid -> full-pixel fallback
    pools_n, counts_n = native.build_pools(projs)
    pools_p, counts_p = native._build_pools_numpy(projs)
    np.testing.assert_array_equal(counts_n, counts_p)
    np.testing.assert_array_equal(pools_n, pools_p)
    assert counts_n[1] == 64


def test_numpy_fallback_env(monkeypatch, rng):
    """NVR_DISABLE_NATIVE forces the NumPy path through the public API."""
    import importlib

    monkeypatch.setenv("NVR_DISABLE_NATIVE", "1")
    mod = importlib.reload(native)
    try:
        assert not mod.available()
        projs = rng.normal(size=(2, 8, 8)).astype(np.float32)
        pools, counts = mod.build_pools(projs)
        assert pools.shape[0] == 2 and counts.shape == (2,)
        mask = mod.ptycho_mask_batch(projs * 0.001, 0.007)
        assert mask.shape == projs.shape
    finally:
        monkeypatch.delenv("NVR_DISABLE_NATIVE")
        importlib.reload(mod)
