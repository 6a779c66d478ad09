#!/usr/bin/env python
"""From-scratch train + sample + eval for one config (VERDICT r3 next #7:
complete the sweep so every tractable config family has a trained-by-us row
next to its shipped checkpoint).

Usage:
  python tools/from_scratch.py grid_small [--scan] [--epochs N]
  python tools/from_scratch.py qm9 --no-scan --nspdk

Prints one JSON line and appends to logs_sample/from_scratch.jsonl.
Reference counterpart: main.py --type train (trains then chains into
sampling, main.py:80-85) at each config's shipped epoch budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--scan", action=argparse.BooleanOptionalAction,
                   default=True, help="scanned (on-device) epoch loop")
    p.add_argument("--nspdk", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="train.remat: rematerialized forwards (HBM relief "
                        "for grid_small_CC's 693 MB rank-2 batches)")
    p.add_argument("--divide-batch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--test-eval-max", type=int, default=None)
    p.add_argument("--epochs-per-call", type=int, default=500,
                   help="scanned-trainer chunk size; small chunks keep "
                        "single device executions short (the axon tunnel "
                        "kills workers on very long calls)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--score-dtype", type=str, default=None,
                   help="sample.score_dtype override (f32 pins the "
                        "conservative path on configs where the bf16 "
                        "default has no quality clearance yet)")
    args = p.parse_args()

    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.training.trainer import get_trainer_from_config
    from ccsd_tpu.utils.config import get_config

    cfg = get_config(args.config, seed=args.seed, folder="./")
    if args.epochs:
        cfg.train.num_epochs = args.epochs
    if args.remat:
        cfg.train.remat = True
    if args.divide_batch:
        cfg.sample.divide_batch = args.divide_batch
    if args.batch_size:
        cfg.data.batch_size = args.batch_size
    if args.test_eval_max:
        cfg.train.test_eval_max = args.test_eval_max
    t0 = time.perf_counter()
    trainer = get_trainer_from_config(cfg)
    ckpt = (trainer.train_scanned(epochs_per_call=args.epochs_per_call)
            if args.scan else trainer.train())
    t_train = time.perf_counter() - t0

    cfg.ckpt = ckpt + "_final"
    if args.nspdk:
        cfg.sample.nspdk = True
    if args.score_dtype:
        cfg.sample.score_dtype = args.score_dtype
    t0 = time.perf_counter()
    sampler = get_sampler_from_config(cfg)
    out = sampler.sample()
    t_sample = time.perf_counter() - t0

    rec = {
        "config": args.config,
        "epochs": int(cfg.train.num_epochs),
        "train_s": round(t_train, 1),
        "sample_s": round(t_sample, 1),
    }
    for k in ("mmd", "cc_mmd", "metrics"):
        if isinstance(out, dict) and k in out:
            rec[k] = out[k]
    line = json.dumps(rec, default=float)
    print("FROM_SCRATCH " + line)
    os.makedirs("logs_sample", exist_ok=True)
    with open("logs_sample/from_scratch.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
