#!/usr/bin/env bash
# CI = docker build: image builds only when the test suite is green.
set -euo pipefail
docker build -t dvs_of_tpu_test -f Dockerfile_test .
