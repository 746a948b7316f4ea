"""Optimizer + LR schedule factories (shared by the single-device trainer
and the sharded multi-chip step).

Parity with the reference optimizer setup
(``/root/reference/src/trainer.py:54-58``): Adam(0.9, 0.999) with a
per-epoch StepLR ``gamma^floor(epoch / lrate_step)`` decay, expressed here
as an optax schedule in optimizer-step units.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import optax


def make_lr_schedule(cfg: Dict[str, Any], steps_per_epoch: int):
    """StepLR-per-epoch (src/trainer.py:57-58) in optimizer-step units:
    lr(step) = lrate * gamma ^ floor(epoch(step) / lrate_step)."""
    lrate = float(cfg["train"]["lrate"])
    gamma = float(cfg["train"]["lrate_gamma"])
    lrate_step = int(cfg["train"]["lrate_step"])

    def schedule(step):
        epoch = step // steps_per_epoch
        return lrate * gamma ** jnp.floor(epoch / lrate_step)

    return schedule


def make_optimizer(cfg: Dict[str, Any], steps_per_epoch: int):
    return optax.adam(
        learning_rate=make_lr_schedule(cfg, steps_per_epoch),
        b1=0.9, b2=0.999,
    )
