"""Command-line entry point.

Parity target: main.py:33-106 + ccsd/src/parsers/parser.py:14-71.
Usage:  python -m ccsd_tpu.cli --type train --config community_small [--seed 42]
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ccsd_tpu",
        description="TPU-native score-based diffusion for graphs and "
        "rank-2 combinatorial complexes",
    )
    p.add_argument("--type", type=str, required=True,
                   choices=["train", "sample"], help="experiment type")
    p.add_argument("--config", type=str, required=True,
                   help="config name (config/<name>.yaml)")
    p.add_argument("--folder", type=str, default="./",
                   help="root folder for config/data/checkpoints")
    p.add_argument("--comment", type=str, default="", help="run comment")
    p.add_argument("--seed", type=int, default=42, help="random seed")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint name to resume training from")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host mode: call jax.distributed.initialize "
                   "before anything else (coordinator/process topology from "
                   "CCSD_COORDINATOR / CCSD_NUM_PROCESSES / CCSD_PROCESS_ID, "
                   "or JAX auto-detection on managed TPU pods)")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    from ccsd_tpu.parallel.multihost import initialize, should_initialize

    if args.distributed or should_initialize():
        initialize()
    from ccsd_tpu.experiment import run_experiment

    run_experiment(
        experiment_type=args.type,
        config_name=args.config,
        folder=args.folder,
        comment=args.comment,
        seed=args.seed,
        resume=args.resume,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
