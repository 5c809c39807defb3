#!/bin/bash
# Round-4 accuracy run: spatially-VARYING synthetic MVSEC (rotation +
# zoom + parallax camera, scripts/make_synthetic_mvsec.py --motion
# varied), 40k steps on 16384 preprocessed samples.  Same protocol as
# scripts/run_accuracy_slow.sh (round 3) with the v2 dataset; resumable
# across the environment's upload-leak restarts.
#
# Usage: scripts/run_accuracy_varied.sh <model_dir> [extra train args...]
set -u
MODEL_DIR=${1:?model dir}
shift
STEPS=${STEPS:-40000}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p "$MODEL_DIR"

# SKIP_VALIDATION=0 runs the in-train validation pass on the
# outdoor_synth3 val split every -vp steps (round-5 protocol: the val
# sequence also drives checkpoint SELECTION via config/synth_val.yml);
# default 1 preserves the round-3/4 command exactly.
SKIP_VAL_FLAG=()
if [ "${SKIP_VALIDATION:-1}" -eq 1 ]; then
    SKIP_VAL_FLAG=(--skip-validation)
fi

run_once() {
    DVS_DATA_PATH=$REPO/experiments/synth_varied_layout/training/synth \
    PYTHONUNBUFFERED=1 \
    python train_flownet.py \
        -m "$MODEL_DIR" \
        --flownet_path "$REPO/EVFlowNet" \
        --preprocessed-dataset-path "$REPO/experiments/synth_varied_shards" \
        -bs 8 -mbs 8 \
        -ne "$STEPS" \
        -lr 1e-3 --half_life 20000 --num-warmup-steps 200 \
        --checkpointing_interval 2000 --permanent_interval 10000 \
        --num_checkpoints 3 \
        "${SKIP_VAL_FLAG[@]}" \
        --allow-arguments-change --allow-obsolete-code \
        "$@" &
    TRAIN_PID=$!
    while kill -0 "$TRAIN_PID" 2>/dev/null; do
        echo "$(date +%s) $(ps -o rss= -p $TRAIN_PID 2>/dev/null)" \
            >> "$MODEL_DIR/rss.log"
        sleep 15
    done
    wait "$TRAIN_PID"
    return $?
}

for attempt in $(seq 1 ${MAX_RESTARTS:-20}); do
    echo "=== attempt $attempt $(date) ==="
    run_once "$@"
    rc=$?
    echo "=== exited rc=$rc ==="
    if [ "$rc" -eq 0 ]; then
        echo "=== training complete ==="
        exit 0
    fi
    sleep 5
done
echo "=== gave up after restarts ==="
exit 1
