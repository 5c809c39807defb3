#!/usr/bin/env bash
set -euo pipefail
docker build -t dvs_of_tpu -f Dockerfile .
