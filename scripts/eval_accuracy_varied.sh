#!/bin/bash
# Round-5 evaluation protocol: VAL-matrix sweep (checkpoint selection) +
# TEST-matrix sweep (headline numbers) over a varied40k run's checkpoints.
#
# The val sequence (outdoor_synth3, config/synth_val.yml) SELECTS the
# checkpoint; the test sequence (outdoor_synth1, config/synth_testing.yml)
# is only read at the selected checkpoint for the headline table — the
# round-4 protocol selected on the test sequence itself, which flatters
# the headline when checkpoints swing (VERDICT round 4, missing #3).
# Mirrors the reference's val/test separation (reference
# utils/dataloader.py:62-72 vs config/testing.yml).
#
# Usage: scripts/eval_accuracy_varied.sh <model_dir> [out_prefix]
set -eu
MODEL_DIR=${1:?model dir}
PREFIX=${2:-$MODEL_DIR}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

run_eval() {
    local config=$1 out=$2
    DVS_DATA_ROOT=$REPO/experiments/synth_varied_layout \
    PYTHONUNBUFFERED=1 \
    python test.py -m "$MODEL_DIR" -o "$out" \
        --flownet_path "$REPO/EVFlowNet" \
        --test-config "$config"
}

echo "=== val matrix (checkpoint selection) ==="
run_eval config/synth_val.yml "${PREFIX}_val"
python scripts/aee_table.py "${PREFIX}_val" --median

echo "=== test matrix (headline) ==="
run_eval config/synth_testing.yml "${PREFIX}_eval"
python scripts/aee_table.py "${PREFIX}_eval" --median
