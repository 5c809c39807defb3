#!/bin/bash
# Build the round-4 spatially-VARYING synthetic dataset + preprocessed
# shards consumed by scripts/run_accuracy_varied.sh.  Everything here is
# host-side NumPy (no jax), safe to run while a TPU job holds the tunnel.
#
# Chain (same as the round-3 protocol, ACCURACY.md "Protocol"):
#   make_synthetic_mvsec --motion varied   raw sequences + exact GT + info
#   sequence2samples                       slice to per-frame-pair elements
#   prepare_batches -s 16384               augment + encode -> shards
#
# Usage: scripts/prep_accuracy_varied.sh [out_root]
set -eu
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
ROOT=${1:-$REPO/experiments/synth_varied_layout}
SHARDS=${SHARDS:-$REPO/experiments/synth_varied_shards}
SIZE=${SIZE:-16384}

export JAX_PLATFORMS=cpu   # belt; these scripts never touch jax anyway

if [ ! -f "$ROOT/info/synth.hdf5" ]; then
    python scripts/make_synthetic_mvsec.py "$ROOT" \
        --motion varied --speed 0.35 --train-secs 60 --eval-secs 12
fi

if [ ! -d "$ROOT/training/synth/outdoor_synth2" ]; then
    DVS_DATA_ROOT=$ROOT python scripts/sequence2samples.py \
        config/synth_train_datasets.yml
fi

# the facade mirrors the reference's hardcoded MVSEC split (train =
# <data_path>/outdoor_day2, val = outdoor_day1); alias the synthetic
# train sequence and the round-5 validation sequence into it
ln -sfn "$ROOT/training/synth/outdoor_synth2" \
    "$ROOT/training/synth/outdoor_day2"
if [ -d "$ROOT/training/synth/outdoor_synth3" ]; then
    ln -sfn "$ROOT/training/synth/outdoor_synth3" \
        "$ROOT/training/synth/outdoor_day1"
fi

DVS_DATA_PATH=$ROOT/training/synth python scripts/prepare_batches.py \
    -o "$SHARDS" -s "$SIZE" --samples-per-file 1024
echo "=== prep complete: $SHARDS ==="
