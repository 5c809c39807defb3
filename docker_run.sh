#!/usr/bin/env bash
# Run training inside the TPU image with the standard data mounts.
set -euo pipefail
docker run --rm -it \
    --privileged \
    --net=host \
    -v /data/training:/data/training \
    -v /data/raw:/data/raw \
    -v "${MODELS_DIR:-$PWD/models}":/models \
    -e INSIDE_DOCKER=1 \
    dvs_of_tpu "$@"
