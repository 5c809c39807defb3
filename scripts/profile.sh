#!/usr/bin/env bash
# cProfile a framework entry point and print the hottest functions.
# Usage: scripts/profile.sh train_flownet.py -m /tmp/model ...
set -euo pipefail
TARGET="$1"; shift
OUT="$(mktemp /tmp/dvs_profile_XXXX.pstats)"
python3 -m cProfile -o "$OUT" "$TARGET" "$@" || true
python3 - "$OUT" <<'EOF'
import pstats, sys
stats = pstats.Stats(sys.argv[1])
stats.sort_stats('cumulative').print_stats(40)
EOF
echo "profile data: $OUT"
