#!/usr/bin/env python
"""Quality sweep: sample from the reference's shipped checkpoints through
ccsd_tpu (converted weights + scanned samplers) and evaluate MMD / molecule
metrics.

Every checkpoint directory under /root/reference/checkpoints is a row here
(round-4 verdict next #2: each shipped .pth is a free parity oracle).
gdss_zinc250k is data-blocked (.MISSING_LARGE_BLOBS: the 250k-molecule raw
csv was never shipped) and is emitted as an explicit "blocked" row rather
than silently skipped.

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

# Row schema:
#   row       unique result key (the checkpoint name)
#   config    reference YAML to drive sampling with, or None -> use the train
#             config embedded in the .pth itself (GDSS full-size ENZYMES has
#             no YAML in the reference config/ dir)
#   subdir    checkpoints/<subdir>/<row>.pth
#   is_cc     3-model CC path vs 2-model graph path
#   mol       molecule sampler (validity/unique/novelty/... instead of MMD)
#   overrides applied onto cfg.sample (e.g. reduced-count caps for configs
#             whose dense FLOPs are impractical at full protocol size)
SWEEP = [
    dict(row="gdss_community_small", config="community_small",
         subdir="community_small", is_cc=False),
    dict(row="gdss_ego_small", config="ego_small", subdir="ego_small",
         is_cc=False),
    dict(row="gdss_ego_small_retrained", config="ego_small",
         subdir="ego_small", is_cc=False),
    dict(row="gdss_enzymes_small_retrained", config="enzymes_small",
         subdir="ENZYMES_small", is_cc=False),
    # full-size graph configs (N=125 / N=361): plain dense-graph sampling,
    # config embedded in the checkpoint (ENZYMES) or grid.yaml
    dict(row="gdss_enzymes", config=None, subdir="ENZYMES", is_cc=False,
         donor="enzymes_small"),
    dict(row="gdss_grid", config="grid", subdir="grid", is_cc=False),
    dict(row="ccsd_community_small_CC", config="community_small_CC",
         subdir="community_small_CC", is_cc=True),
    dict(row="ccsd_community_small_Base_CC", config="community_small_Base_CC",
         subdir="community_small_CC", is_cc=True),
    dict(row="ccsd_enzymes_small_CC", config="enzymes_small_CC",
         subdir="ENZYMES_small_CC", is_cc=True),
    dict(row="ccsd_enzymes_small_Base_CC", config="enzymes_small_Base_CC",
         subdir="ENZYMES_small_CC", is_cc=True),
    # grid_small_CC: E=1176, K=18,424 — B=4 via divide_batch (HBM), no gifs
    dict(row="ccsd_grid_small_CC", config="grid_small_CC",
         subdir="grid_small_CC", is_cc=True,
         overrides={"divide_batch": 2}),
    # ego_small_CC: K=12,444 — the dense Hodge V-matmul is ~5.5e11 FLOPs
    # per sample per model call; full protocol (|test| samples) is hours on
    # one chip, so default to a REDUCED 8-sample row (honest caveat in
    # BASELINE.md) at B=4
    dict(row="ccsd_ego_small_CC", config="ego_small_CC",
         subdir="ego_small_CC", is_cc=True,
         overrides={"divide_batch": 32, "max_samples": 8}),
    dict(row="ccsd_ego_small_CC_v2", config="ego_small_CC",
         subdir="ego_small_CC", is_cc=True,
         overrides={"divide_batch": 32, "max_samples": 8}),
    # molecule checkpoints (QM9): MOSES-key metric surface + NSPDK
    dict(row="gdss_qm9", config="qm9", subdir="QM9", is_cc=False, mol=True),
    dict(row="gdss_qm9_retrained", config="qm9", subdir="QM9", is_cc=False,
         mol=True),
    dict(row="ccsd_qm9_CC", config="qm9_CC", subdir="QM9", is_cc=True,
         mol=True),
    dict(row="ccsd_qm9_Base_CC", config="qm9_Base_CC", subdir="QM9",
         is_cc=True, mol=True),
]

BLOCKED = {
    "gdss_zinc250k": (
        "data-blocked: zinc250k raw csv + valid_idx are in the reference's "
        ".MISSING_LARGE_BLOBS manifest and were never shipped; sampling "
        "needs the 38-atom kekulized dataset for priors + the train/test "
        "SMILES splits for metrics (pipeline-at-scale proof at ZINC shapes: "
        "BASELINE.md 'ZINC shapes')"
    ),
}


def _cfg_for(entry, args):
    import yaml

    from ccsd_tpu.training.checkpoint import load_torch_reference_ckpt
    from ccsd_tpu.utils.config import AttrDict

    if entry["config"] is not None:
        raw = yaml.safe_load(open(
            os.path.join(args.ref_config_dir, f"{entry['config']}.yaml")))
        cfg = AttrDict(raw)
    else:
        # no reference YAML (full-size ENZYMES): the .pth embeds its full
        # train config (data/sde/model/train/sampler/sample sections)
        pth = os.path.join(args.folder, "checkpoints", entry["subdir"],
                           f"{entry['row']}.pth")
        ck = load_torch_reference_ckpt(pth, is_cc=entry["is_cc"])
        cfg = AttrDict(dict(ck["model_config"]))
        cfg.is_cc = entry["is_cc"]
        # GDSS-era embedded configs lack the CC-era data fields (node/edge
        # label ranges, d_min/d_max for the lifted-CC eval) — fill missing
        # keys from a same-family donor YAML
        if entry.get("donor"):
            donor = AttrDict(yaml.safe_load(open(os.path.join(
                args.ref_config_dir, f"{entry['donor']}.yaml"))))
            for k, v in donor.data.items():
                if k not in cfg.data:
                    cfg.data[k] = v
    cfg.folder = args.folder
    cfg.data.dir = os.path.join(args.folder, "data")
    cfg.ckpt = entry["row"]
    cfg.config_name = entry.get("config") or entry["row"]
    for k, v in (entry.get("overrides") or {}).items():
        cfg.sample[k] = v
    return cfg


def main():
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
    p.add_argument("--n-samples", type=int, default=None,
                   help="override sample.n_samples (molecule rows)")
    p.add_argument("--max-samples", type=int, default=None,
                   help="override sample.max_samples (generic rows)")
    args = p.parse_args()

    from ccsd_tpu.sampling.sampler import get_sampler_from_config
    from ccsd_tpu.utils.config import AttrDict

    results = {}
    for name, reason in BLOCKED.items():
        if not args.only or name in args.only:
            results[name] = {"blocked": reason}
    for entry in SWEEP:
        row = entry["row"]
        if args.only and row not in args.only:
            continue
        pth = os.path.join(args.folder, "checkpoints", entry["subdir"],
                           f"{row}.pth")
        if not os.path.exists(pth):
            print(f"[skip] {row}: no checkpoint {pth}")
            continue
        cfg = _cfg_for(entry, args)
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
        if args.n_samples is not None:
            cfg.sample.n_samples = args.n_samples
        if args.max_samples is not None:
            cfg.sample.max_samples = args.max_samples
        if args.mesh:
            cfg.sample.mesh = AttrDict({
                k: int(v) for k, v in
                (kv.split("=") for kv in args.mesh.split(","))
            })
        print(f"=== {row} ({cfg.config_name}) ===", flush=True)
        try:
            sampler = get_sampler_from_config(cfg, log=True)
            out = sampler.sample()
            rec = {"sampling_time_s": round(out["sampling_time"], 1)}
            for k in ("mmd", "cc_mmd"):
                if out.get(k) is not None:
                    rec[k] = out[k]
            for k in ("metrics", "mol_metrics"):
                if isinstance(out.get(k), dict):
                    rec["mol_metrics"] = out[k]
            for k in ("n_samples", "max_samples"):
                if cfg.sample.get(k):
                    rec[k] = int(cfg.sample[k])
            results[row] = rec
        except Exception as e:
            print(f"[fail] {row}: {type(e).__name__}: {e}")
            results[row] = {"error": f"{type(e).__name__}: {e}"}
        with open(os.path.join(args.folder, args.out), "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
