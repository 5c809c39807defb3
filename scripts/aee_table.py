#!/usr/bin/env python3
"""Render an ACCURACY.md-style AEE table from test.py eval pickles.

Usage: python scripts/aee_table.py <eval_dir> [eval_dir ...]

Each ``step_N.pkl`` written by test.py holds a list of namespaces with
``step`` (frame step), ``mAEE`` and ``mpAEE``; this prints one markdown
row per checkpoint: ``| step N | AEE (%<3px) | ... |`` ordered by frame
step — the exact layout used in ACCURACY.md.
"""
import pickle
import re
import sys
from pathlib import Path


def rows(eval_dir: Path):
    for f in sorted(eval_dir.glob('step_*.pkl'),
                    key=lambda p: int(re.findall(r'\d+', p.stem)[0])):
        n = int(re.findall(r'\d+', f.stem)[0])
        results = pickle.load(open(f, 'rb'))
        by_fs = {r.step: r for r in results}
        cells = ' | '.join(
            f'{by_fs[fs].mAEE:.3f} ({100 * by_fs[fs].mpAEE:.1f})'
            for fs in sorted(by_fs))
        yield f'| step {n} | {cells} |'


def main():
    for d in sys.argv[1:]:
        print(f'### {d}')
        for row in rows(Path(d)):
            print(row)


if __name__ == '__main__':
    main()
