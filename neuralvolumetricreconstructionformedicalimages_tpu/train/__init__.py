"""Training subsystem: functional optax/scan core + orchestrator + CLI."""

from .trainer import (  # noqa: F401
    Trainer,
    build_model,
    init_state,
    make_epoch_fn,
    make_lr_schedule,
    make_optimizer,
)
