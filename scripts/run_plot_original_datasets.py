#!/usr/bin/env python
"""Plot grids of the original datasets (graphs or CCs).

Parity: /root/reference/scripts/run_plot_original_datasets.py.
Usage: python scripts/run_plot_original_datasets.py --dataset community_small
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ccsd_tpu.data.complex import CombinatorialComplex
    from ccsd_tpu.data.loader import load_dataset
    from ccsd_tpu.utils.plot import plot_cc_list, plot_graphs_list

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--folder", type=str, default="./")
    p.add_argument("--out", type=str, default="plots")
    args = p.parse_args()

    objs = load_dataset(os.path.join(args.folder, "data"), args.dataset)
    out_dir = os.path.join(args.folder, args.out)
    if objs and isinstance(objs[0], CombinatorialComplex):
        path = plot_cc_list(objs, title=args.dataset, save_dir=out_dir)
    else:
        path = plot_graphs_list(objs, title=args.dataset, save_dir=out_dir)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
