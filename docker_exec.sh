#!/usr/bin/env bash
# Open a shell in the running training container.
set -euo pipefail
CONTAINER="$(docker ps -q --filter ancestor=dvs_of_tpu | head -n1)"
docker exec -it "${CONTAINER}" bash
