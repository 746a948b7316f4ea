"""TPU compute ops: hash encoding (jnp reference + Pallas kernel), sampling,
line integration, SSIM."""

from .hash_encoding import HashGridSpec, hash_encode, hash_grid_indices  # noqa: F401
from .sampling import stratified_z_vals, sample_pdf  # noqa: F401
from .integration import raw2outputs  # noqa: F401
