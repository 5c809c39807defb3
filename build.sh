#!/usr/bin/env bash
# Build the native C++ kernels in place.
set -euo pipefail
cd "$(dirname "$0")"
python3 -c "from dvs_of_training_framework_tpu import native; \
lib = native._load(); \
assert lib is not None, 'native build failed'; \
print('native kernels built:', native._LIB_PATH)"
