#!/usr/bin/env bash
# Canned demonstration run (parity with the reference's demonstration.sh):
# generate the community_small CC dataset, train briefly, then sample.
set -euo pipefail
FOLDER="${1:-.}"

python -m ccsd_tpu.data.generators --dataset community_small --is_cc --folder "$FOLDER"
python -m ccsd_tpu.cli --type train --config community_small_CC --folder "$FOLDER" --seed 42
