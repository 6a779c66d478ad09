#!/usr/bin/env python
"""Quality sweep: sample from the reference's shipped checkpoints through
ccsd_tpu (converted weights + scanned samplers) and evaluate MMD.

Produces the quality-parity table recorded in BASELINE.md.  Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/quality_sweep.py \
      --folder <workdir with data/ and checkpoints/ links> [--only name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (config_name, ckpt_subdir, ckpt_name, is_cc)
SWEEP = [
    ("community_small", "community_small", "gdss_community_small", False),
    ("ego_small", "ego_small", "gdss_ego_small", False),
    ("enzymes_small", "ENZYMES_small", "gdss_enzymes_small_retrained", False),
    ("community_small_CC", "community_small_CC", "ccsd_community_small_CC", True),
    ("community_small_Base_CC", "community_small_CC",
     "ccsd_community_small_Base_CC", True),
    ("enzymes_small_CC", "ENZYMES_small_CC", "ccsd_enzymes_small_CC", True),
    ("enzymes_small_Base_CC", "ENZYMES_small_CC",
     "ccsd_enzymes_small_Base_CC", True),
    # ego_small_CC (E=153, K=12444) is excluded from the default sweep: the
    # dense Hodge V-matmul alone is ~7e13 FLOPs per model call at batch 128.
]


def main():
    import yaml

    from ccsd_tpu.sampling.sampler import Sampler
    from ccsd_tpu.utils.config import AttrDict

    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, required=True)
    p.add_argument("--only", nargs="*", default=None)
    p.add_argument("--ref-config-dir", type=str,
                   default="/root/reference/config")
    p.add_argument("--out", type=str, default="quality_sweep.json")
    p.add_argument("--dtype", type=str, default=None,
                   help="override sample.dtype (bf16|f32)")
    p.add_argument("--score-dtype", type=str, default=None,
                   help="override sample.score_dtype (bf16 score networks, "
                        "f32 carry — the selective-precision fast path)")
    p.add_argument("--rng", type=str, default=None,
                   help="override sample.rng (rbg|threefry)")
    p.add_argument("--seed", type=int, default=None,
                   help="override sample.seed")
    p.add_argument("--fast", action="store_true",
                   help="enable sample.fast (profile-tuned bf16 lowerings)")
    p.add_argument("--mesh", type=str, default=None,
                   help="sample.mesh, e.g. 'data=4' or 'data=4,edge=2'")
    args = p.parse_args()

    results = {}
    for config_name, subdir, ckpt, is_cc in SWEEP:
        if args.only and config_name not in args.only:
            continue
        pth = os.path.join(args.folder, "checkpoints", subdir, f"{ckpt}.pth")
        if not os.path.exists(pth):
            print(f"[skip] {config_name}: no checkpoint {pth}")
            continue
        raw = yaml.safe_load(open(
            os.path.join(args.ref_config_dir, f"{config_name}.yaml")))
        cfg = AttrDict(raw)
        cfg.folder = args.folder
        cfg.data.dir = os.path.join(args.folder, "data")
        cfg.ckpt = ckpt
        cfg.config_name = config_name
        if args.dtype:
            cfg.sample.dtype = args.dtype
        if args.score_dtype:
            cfg.sample.score_dtype = args.score_dtype
        if args.rng:
            cfg.sample.rng = args.rng
        if args.seed is not None:
            cfg.sample.seed = args.seed
        if args.fast:
            cfg.sample.fast = True
        if args.mesh:
            cfg.sample.mesh = AttrDict({
                k: int(v) for k, v in
                (kv.split("=") for kv in args.mesh.split(","))
            })
        print(f"=== {config_name} ({ckpt}) ===", flush=True)
        try:
            sampler = Sampler(cfg, log=True)
            out = sampler.sample()
            results[config_name] = {
                "mmd": out.get("mmd"),
                "cc_mmd": out.get("cc_mmd"),
                "sampling_time_s": round(out["sampling_time"], 1),
            }
        except Exception as e:
            print(f"[fail] {config_name}: {type(e).__name__}: {e}")
            results[config_name] = {"error": f"{type(e).__name__}: {e}"}
        with open(os.path.join(args.folder, args.out), "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
