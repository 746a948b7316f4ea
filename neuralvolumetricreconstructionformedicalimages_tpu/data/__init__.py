"""Data subsystem: pickle ingestion, device-resident sampling, JAX forward
projector, analytic phantoms, synthetic generator, real-data formatter."""

from .dataset import ProjectionDataset, load_dataset, load_pickle, make_dataset  # noqa: F401
from .projector import project_angles, trilinear_sample  # noqa: F401
from .phantoms import PHANTOMS, get_phantom  # noqa: F401
from .generate import add_ct_noise, generate  # noqa: F401
from .format_real import format_real_data  # noqa: F401
