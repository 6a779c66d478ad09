#!/usr/bin/env python
"""Build a QM9-format kekulized npz from the shipped qm9_test_nx.pkl.

The reference repo ships valid_idx_qm9.json + qm9_test_nx.pkl but the raw
qm9.csv / qm9_kekulized.npz blobs are .MISSING_LARGE_BLOBS — so the 13,082
test molecules (atom symbols + kekulized bond orders as nx graphs) are the
only molecule-level QM9 data available.  The derivation itself lives in
ccsd_tpu.data.mol_loader.derive_qm9 (and runs automatically on first use of
a missing qm9_kekulized.npz); this tool is the explicit CLI for it.

Usage:  python tools/make_qm9_derived.py --out <dir>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccsd_tpu.data.mol_loader import derive_qm9  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-nx", default=None)
    p.add_argument("--out", required=True, help="output data dir")
    p.add_argument("--test-frac", type=float, default=0.1)
    args = p.parse_args()
    npz = derive_qm9(args.out, test_nx_path=args.test_nx,
                     test_frac=args.test_frac)
    import numpy as np

    n = np.load(npz)["arr_0"].shape[0]
    n_test = int(args.test_frac * n)
    print(f"wrote {n} molecules ({n - n_test} train / {n_test} test) "
          f"to {args.out}")


if __name__ == "__main__":
    main()
