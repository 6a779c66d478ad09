#!/usr/bin/env python
"""Parameter counts for every configured model family.

Parity: /root/reference/scripts/run_calculate_model_parameters.py:19-109.
Usage: python scripts/run_calculate_model_parameters.py [--configs a b c]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ccsd_tpu.models.registry import load_model, load_model_params
    from ccsd_tpu.utils.config import get_config
    from ccsd_tpu.utils.models_utils import count_params

    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=[
        "community_small", "community_small_CC", "ego_small", "ego_small_CC",
        "enzymes_small", "enzymes_small_CC", "qm9", "qm9_CC",
    ])
    p.add_argument("--folder", type=str, default="./")
    args = p.parse_args()

    for name in args.configs:
        try:
            config = get_config(name, 42, args.folder)
        except FileNotFoundError:
            print(f"{name}: config not found")
            continue
        defs = load_model_params(config, is_cc=bool(config.get("is_cc", False)))
        total = 0
        parts = []
        for label, d in zip(("x", "adj", "rank2"), defs):
            model = load_model(d)
            n = count_params(model.init(jax.random.PRNGKey(0)))
            parts.append(f"{label}={n:,}")
            total += n
        print(f"{name}: {' '.join(parts)} total={total:,}")


if __name__ == "__main__":
    main()
