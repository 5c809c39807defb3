#!/usr/bin/env python3
"""Dump the optimized HLO of the staged train step (BENCH_MODE config).

The chrome-trace profile names kernels by HLO instruction (copy.469,
concatenate.53, convert_reduce_fusion.20, ...) but drops shapes; this
compiles the same step profile_step_trace.py runs and writes the
optimized module text so those names can be mapped to shapes/operands.

Usage: BENCH_MODE=recipe python scripts/benchmarks/dump_step_hlo.py OUT.txt
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'scripts'))

from profile_step_trace import build_step  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else '/tmp/step_hlo.txt'
    train_step, state, staged = build_step()
    # .lower on the jitted step preserves donate_argnums — re-jitting
    # __wrapped__ would drop aliasing and renumber the copy.N kernels
    # this dump exists to map
    compiled = train_step.lower(state, staged).compile()
    text = compiled.as_text()
    Path(out_path).write_text(text)
    print(f'wrote {len(text)} bytes to {out_path}')


if __name__ == '__main__':
    main()
