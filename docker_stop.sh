#!/usr/bin/env bash
set -euo pipefail
docker ps -q --filter ancestor=dvs_of_tpu | xargs -r docker stop
