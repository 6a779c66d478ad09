#!/usr/bin/env python
"""QM9 full-protocol runs: two-stage vs dense-K, 10k samples, full metrics.

Round-3 verdict item #1/#3: the one BASELINE table that compares the
two-stage open-universe factorization against the reference's dense-K
ccsd_qm9_CC.pth at the reference's own protocol (sample_qm9_CC.yaml:
n_samples=10000, Reverse+Langevin snr 0.2, seed 42 — reference
sampler.py:1061-1477), with the complete molecule metric surface
(validity±correction / unique@10k / novelty / IntDiv / Filters /
logP/weight / SNN/Frag/Scaf / NSPDK) AND the lifted-CC MMDs
(hodge + rank0/1/2).

Legs:
  python tools/qm9_protocol.py dense               # shipped ckpt, MolSampler
  python tools/qm9_protocol.py train --epochs 5000 # two-stage TPU training
  python tools/qm9_protocol.py two_stage --ckpt <name>_final
Results are printed as one JSON line and appended to logs_sample/qm9_protocol.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dump(tag, payload):
    rec = {"leg": tag, **payload}
    line = json.dumps(rec, default=float)
    print(line)
    os.makedirs("logs_sample", exist_ok=True)
    with open("logs_sample/qm9_protocol.jsonl", "a") as f:
        f.write(line + "\n")


def leg_dense(args):
    from ccsd_tpu.sampling.mol_sampler import MolSampler
    from ccsd_tpu.utils.config import get_config

    cfg = get_config("sample_qm9_CC", seed=42, folder="./")
    cfg.sample.nspdk = True
    cfg.sample.seed = 42
    if args.n_samples:
        cfg.sample.n_samples = args.n_samples
    sampler = MolSampler(cfg, log=False)
    sampler.is_cc = True
    out = sampler.sample()
    _dump("dense", {"metrics": out["metrics"],
                    "sampling_time_s": out["sampling_time"],
                    "n_samples": cfg.sample.n_samples})


def leg_train(args):
    from ccsd_tpu.training.trainer import get_trainer_from_config
    from ccsd_tpu.utils.config import get_config

    cfg = get_config("qm9_CC_two_stage", seed=42, folder="./")
    cfg.train.num_epochs = args.epochs
    cfg.train.print_interval = max(1, args.epochs // 20)
    if args.minibatch:
        cfg.train.minibatch = args.minibatch
        cfg.train.name = f"mb{args.minibatch}"
    t0 = time.perf_counter()
    trainer = get_trainer_from_config(cfg, log=True)
    name = trainer.train()
    _dump("train", {"ckpt": name + "_final", "epochs": args.epochs,
                    "wall_s": round(time.perf_counter() - t0, 1)})


def leg_two_stage(args):
    from ccsd_tpu.sampling.two_stage_sampler import TwoStageSampler
    from ccsd_tpu.utils.config import get_config

    cfg = get_config("qm9_CC_two_stage", seed=42, folder="./")
    cfg.ckpt = args.ckpt
    cfg.sample.n_samples = args.n_samples or 10000
    cfg.sample.divide_batch = args.divide
    cfg.sample.nspdk = True
    cfg.sample.seed = 42
    if args.use_ema:
        cfg.sample.use_ema = True
    out = TwoStageSampler(cfg, log=False).sample()
    _dump("two_stage_ema" if args.use_ema else "two_stage", out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("leg", choices=["dense", "train", "two_stage"])
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--n-samples", type=int, default=None)
    p.add_argument("--divide", type=int, default=4)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--minibatch", type=int, default=None)
    args = p.parse_args()
    {"dense": leg_dense, "train": leg_train,
     "two_stage": leg_two_stage}[args.leg](args)


if __name__ == "__main__":
    main()
