"""Training CLI: ``nvr-train --config configs/<name>.yaml``.

Entry-point parity with the reference (``/root/reference/train.py:19-28,292-293``):
one ``--config`` flag, YAML with recursive ``inherit_from``, then the
trainer main loop.
"""

from __future__ import annotations

import argparse

from ..config import load_config
from .trainer import Trainer


def config_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="./configs/chest_50.yaml",
                        help="configs file path")
    parser.add_argument("--workdir", default=None,
                        help="override experiment directory")
    return parser


def main(argv=None):
    args = config_parser().parse_args(argv)
    cfg = load_config(args.config)
    trainer = Trainer(cfg, workdir=args.workdir)
    print(f"[Start] exp: {cfg['exp']['expname']}, net: Basic network")
    trainer.start()


if __name__ == "__main__":
    main()
