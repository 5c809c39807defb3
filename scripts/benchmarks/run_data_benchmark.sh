#!/usr/bin/env bash
# Data-pipeline benchmark matrix: raw vs preprocessed vs quantized loaders
# across cache modes (reference scripts/benchmarks/run_data_benchmark.sh).
#
# Usage: run_data_benchmark.sh [PREPROCESSED_DIR] [QUANTIZED_DIR] [CACHE_DIR]
set -euo pipefail

REPO_DIR="$(cd "$(dirname "$0")/../.." && pwd)"
PREP_DIR="${1:-}"
QUANT_DIR="${2:-}"
CACHE_DIR="${3:-/tmp/dvs_cache}"
PY=python3

cd "$REPO_DIR"

echo "== raw loader =="
$PY scripts/profile_dataset.py --num-iters 200 --start 20

if [ -n "$PREP_DIR" ]; then
  echo "== preprocessed, no cache =="
  $PY scripts/profile_dataset.py --num-iters 200 --start 20 \
      --preprocessed-dataset-path "$PREP_DIR"
  echo "== preprocessed, cache (process-only-once) =="
  $PY scripts/profile_dataset.py --num-iters 200 --start 20 \
      --preprocessed-dataset-path "$PREP_DIR" \
      --cache-dir "$CACHE_DIR" --cache-size 5 --process-only-once
  echo "== preprocessed, cache (non-blocking) =="
  $PY scripts/profile_dataset.py --num-iters 200 --start 20 \
      --preprocessed-dataset-path "$PREP_DIR" \
      --cache-dir "$CACHE_DIR" --cache-size 5
fi

if [ -n "$QUANT_DIR" ]; then
  echo "== quantized, no cache =="
  $PY scripts/profile_dataset.py --num-iters 200 --start 20 \
      --preprocessed-dataset-path "$QUANT_DIR" --ev_images
fi
