#!/usr/bin/env python3
"""A/B the recipe step: split-decoder convs vs the fused concat.

PERFORMANCE.md lever 3: the decoder's concat widths (386/194/66 with
base_channels=64) are lane-pad-hostile — the +2 upsampled-flow channels
push every stage off the 128-lane tile, inflating the decoder
activations and dW reductions.  ``split_decoder=True`` gives the flow
input its own bias-free conv summed into the stage output (identical
function and parameter count; see EVFlowNet/net.py Predictor), so the
concats land at 384/192/64.  Both variants in ONE process (tunnel
cross-process variance rule).

Usage: python scripts/benchmarks/ab_decoder_split.py [iters]
"""
import sys

from step_harness import measure_step


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for split in [False, True, False, True]:
        dt, loss = measure_step(iters=iters,
                                model_kwargs={'split_decoder': split})
        print(f'recipe split_decoder={str(split):5s}: {dt * 1e3:7.2f} '
              f'ms/step ({1 / dt:5.1f} b/s)  loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
