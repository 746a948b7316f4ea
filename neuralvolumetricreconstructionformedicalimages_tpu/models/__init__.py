"""Model layer: density field = encoder + skip-connection MLP, as pure
functions over parameter pytrees (no module framework — everything is
jit/vmap/shard_map friendly by construction)."""

from .encoders import (  # noqa: F401
    EncoderSpec,
    FreqEncoderSpec,
    HashEncoderSpec,
    IdentityEncoderSpec,
    get_encoder,
)
from .density_field import DensityFieldSpec, get_network  # noqa: F401
