"""YAML config system with recursive ``inherit_from`` deep-merge.

Capability parity with the reference config loader
(``/root/reference/src/config/configloading.py:4-48``): a config file may
name a parent via ``inherit_from``; parents load first and children
deep-merge on top.  The schema mirrors the reference
(``/root/reference/config/chest_50.yaml``): sections ``exp``, ``network``,
``encoder``, ``render``, ``train``, ``log`` — plus a new TPU-only
``parallel`` section (mesh shape, sharding axes, precision policy).
"""

from __future__ import annotations

import copy
import os.path as osp
from typing import Any, Dict, Optional

import yaml

# Defaults for the new TPU-only knobs so every reference-shaped config
# runs unmodified.
_TPU_DEFAULTS: Dict[str, Dict[str, Any]] = {
    "parallel": {
        "mesh": None,          # e.g. {"data": 4, "sample": 2}; None = single device
        # MXU input dtype for the MLP matmuls (f32 accumulate); see
        # models/density_field.py.  Params and optimizer state stay f32.
        "compute_dtype": "float32",
        # dtype of the rolled gather table; see models/encoders.py.
        "table_dtype": "float32",
    },
    "encoder": {
        "hash_variant": "coherent",  # "coherent" (TPU-fast) | "xor" (reference-exact)
        "fast": True,                # rolled-gather + Pallas bucket-matmul path
        "backward": "bucket",        # "bucket" (Pallas) | "take" (pure-XLA fallback)
    },
    "train": {
        "seed": 42,
        "shuffle_views": False,  # reference DataLoader iterates views in order
        "loss": "mse",           # see losses.get_loss_fn (e.g. "huber", "mse+tv")
        # "auto" | "precomputed" | "onthefly": device-resident [N,H,W,8]
        # ray tensor vs per-step regeneration (data/dataset.py)
        "ray_mode": "auto",
    },
    "log": {
        "eval_mask": False,      # eval_stepMASK variant (train.py:138-218)
    },
}


def update_recursive(dict1: Dict[str, Any], dict2: Dict[str, Any]) -> None:
    """Deep-merge ``dict2`` into ``dict1`` in place (dict2 wins on leaves)."""
    for k, v in dict2.items():
        if isinstance(v, dict):
            if not isinstance(dict1.get(k), dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config, resolving the ``inherit_from`` chain recursively.

    Relative ``inherit_from`` paths resolve against the child config's
    directory first, then against the working directory.
    """
    with open(path, "r") as f:
        cfg_special = yaml.load(f, Loader=yaml.Loader) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        parent = inherit_from
        if not osp.isabs(parent):
            cand = osp.join(osp.dirname(osp.abspath(path)), parent)
            parent = cand if osp.exists(cand) else parent
        cfg = load_config(parent, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.load(f, Loader=yaml.Loader) or {}
    else:
        cfg = {}

    update_recursive(cfg, cfg_special)
    cfg.pop("inherit_from", None)
    return cfg


def with_defaults(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Return a copy of ``cfg`` with TPU-framework defaults filled in."""
    out = copy.deepcopy(_TPU_DEFAULTS)
    update_recursive(out, cfg)
    return out
