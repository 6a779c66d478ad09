#!/usr/bin/env python
"""Derive (d_min, d_max) from a pickled CC dataset.

Parity: /root/reference/scripts/run_calculate_D.py:22-75.
Usage: python scripts/run_calculate_D.py --file data/community_small_CC.pkl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsd_tpu.data.loader import load_dataset


def calculate_D(ccs):
    sizes = [
        len(cell)
        for cc in ccs
        for cell in cc.cells.hyperedge_dict.get(2, {})
    ]
    if not sizes:
        raise ValueError("dataset has no rank-2 cells")
    return min(sizes), max(sizes)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--file", type=str, required=True,
                   help="path to the .pkl dataset (without or with extension)")
    p.add_argument("--folder", type=str, default="./")
    args = p.parse_args()
    path = os.path.join(args.folder, args.file)
    data_dir, fname = os.path.split(path)
    fname = fname[:-4] if fname.endswith(".pkl") else fname
    ccs = load_dataset(data_dir, fname)
    d_min, d_max = calculate_D(ccs)
    print(f"d_min: {d_min}, d_max: {d_max}")
