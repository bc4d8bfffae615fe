"""Train entry point: python -m custom_d_fine_tpu.cli.train [config] [k=v ...]

Parity: reference `make train` -> python -m src.dl.train (hydra CLI). Hydra's
`key=value` overrides are supported via utils/config.py. DDP/torchrun process
management is unnecessary — GSPMD data parallelism uses every local device in
one process (reference Makefile:11-20).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, help="path to config.yaml")
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    args = parser.parse_args(argv)

    from ..utils.config import load_config
    from ..train.trainer import Trainer

    cfg = load_config(args.config, args.overrides)
    trainer = Trainer(cfg)

    # reference train.py:668-677: an interrupt or crash mid-training still
    # falls through to best-model evaluation of whatever was saved so far.
    # A real crash must still fail the process (exit 1) after the fallback
    # eval, so `make main`/automation can't mistake a garbage run for success.
    history = []
    crashed = None
    try:
        history = trainer.train()
    except KeyboardInterrupt:
        print("Interrupted by user — evaluating best checkpoint so far")
    except Exception as e:
        print(f"Training failed ({e!r}) — evaluating best checkpoint so far")
        crashed = e

    # final: reload best weights, extended eval on val+test (reference
    # train.py:678-745)
    try:
        trainer.load_checkpoint("model")
    except Exception as e:
        print(f"best-checkpoint reload skipped: {e}")
    for split in ("val", "test"):
        if trainer.loader.datasets.get(split) is None:
            continue
        m = trainer.evaluate(split, extended=True)
        trainer._log_metrics({f"{split}_{k}": v for k, v in m.items()
                              if not isinstance(v, dict)})
        if getattr(trainer, "_last_validator", None) is not None:
            trainer._last_validator.save_plots(trainer.path_to_save / f"plots_{split}")
    if crashed is not None:
        raise SystemExit(1)
    return history


if __name__ == "__main__":
    main()
