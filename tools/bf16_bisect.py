#!/usr/bin/env python
"""bf16 score-network clearance bisect (round-4 verdict weak #2 / next #5).

For one config + shipped checkpoint, sample with score_dtype in {f32, bf16}
across several seeds IN ONE PROCESS (the second seed of each dtype reuses
the jit cache — only the dtype flip recompiles) and print the MMD table.
A config earns a BF16_SCORE_CLEARED entry only if bf16 MMDs are within
noise of f32 across all seeds.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/bf16_bisect.py \
      --config enzymes_small_CC --ckpt ccsd_enzymes_small_CC \
      --seeds 42 7 [--max-samples N] [--divide-batch D]

Appends one JSON line per (dtype, seed) to logs_sample/bf16_bisect.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import yaml

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--folder", default="/root/repo")
    p.add_argument("--ref-config-dir", default="/root/reference/config")
    p.add_argument("--seeds", type=int, nargs="+", default=[42, 7])
    p.add_argument("--dtypes", nargs="+", default=["f32", "bf16"])
    p.add_argument("--rng", nargs="+", default=["threefry"],
                   help="sample.rng axis (threefry / rbg) — clears the "
                        "round-3 parked bf16+rbg composition")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--divide-batch", type=int, default=None)
    args = p.parse_args()

    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.utils.config import AttrDict

    raw = yaml.safe_load(open(
        os.path.join(args.ref_config_dir, f"{args.config}.yaml")))
    rows = []
    for sd in args.dtypes:
      for rng in args.rng:
        for seed in args.seeds:
            cfg = AttrDict(json.loads(json.dumps(raw)))
            cfg.folder = args.folder
            cfg.data.dir = os.path.join(args.folder, "data")
            cfg.ckpt = args.ckpt
            cfg.config_name = args.config
            cfg.sample.score_dtype = sd
            cfg.sample.rng = rng
            cfg.sample.seed = seed
            if args.max_samples:
                cfg.sample.max_samples = args.max_samples
            if args.divide_batch:
                cfg.sample.divide_batch = args.divide_batch
            t0 = time.perf_counter()
            out = get_sampler_from_config(cfg, log=False).sample()
            rec = {
                "config": args.config, "ckpt": args.ckpt,
                "score_dtype": sd, "rng": rng, "seed": seed,
                "wall_s": round(time.perf_counter() - t0, 1),
                "mmd": out.get("mmd"), "cc_mmd": out.get("cc_mmd"),
            }
            rows.append(rec)
            line = json.dumps(rec, default=float)
            print("BISECT " + line, flush=True)
            os.makedirs(os.path.join(args.folder, "logs_sample"),
                        exist_ok=True)
            with open(os.path.join(args.folder, "logs_sample",
                                   "bf16_bisect.jsonl"), "a") as f:
                f.write(line + "\n")
    print(json.dumps(rows, indent=2, default=float))


if __name__ == "__main__":
    main()
