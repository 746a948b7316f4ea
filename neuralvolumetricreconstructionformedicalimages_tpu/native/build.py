"""Build the native data engine (g++ -> shared library, loaded via ctypes).

pybind11 is not available in this image, so the library exposes a plain C
ABI (see src/data_engine.cpp) and Python binds it with ctypes.  Built
lazily on first import; rebuilt when the source is newer than the cached
.so.  Any failure leaves the package fully functional on the NumPy
fallback paths.
"""

from __future__ import annotations

import os
import os.path as osp
import subprocess
import sys
import tempfile

_SRC = osp.join(osp.dirname(osp.abspath(__file__)), "src", "data_engine.cpp")


def _cache_dir() -> str:
    base = os.environ.get("NVR_NATIVE_CACHE") or osp.join(
        tempfile.gettempdir(), f"nvr_native_{os.getuid()}")
    os.makedirs(base, exist_ok=True)
    return base


def lib_path() -> str:
    return osp.join(_cache_dir(), "libnvr_data_engine.so")


def build(force: bool = False) -> str:
    """Compile the shared library if stale; returns its path."""
    out = lib_path()
    if (not force and osp.exists(out)
            and os.stat(out).st_mtime >= os.stat(_SRC).st_mtime):
        return out
    flags = ["-O3", "-shared", "-fPIC", "-std=c++17", "-Wall"]
    # OpenMP when available (parallel over views); fall back silently.
    for extra in (["-fopenmp"], []):
        cmd = ["g++", *flags, *extra, _SRC, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            return out
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            err = e
    raise RuntimeError(
        f"native build failed: {getattr(err, 'stderr', err)}"
    )


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
