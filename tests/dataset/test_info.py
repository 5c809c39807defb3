"""The committed MVSEC info artifact must carry the reference's exact
sequence start times: they seed every time-range slice
(scripts/sequence2samples.py) and absolute eval window
(test.py), so a differing value silently shifts all windows.
``data/info/mvsec.hdf5`` is the reference repository's committed data
artifact (reference data/info/mvsec.hdf5, consumed at its
scripts/sequence2samples.py:73-75 and test.py:157).
"""
from pathlib import Path

import pytest

from dvs_of_training_framework_tpu.data.dataset import read_info

REPO = Path(__file__).resolve().parents[2]

# spot anchors from the reference artifact
REFERENCE_START_TIMES = {
    'outdoor_day1': 1506117897.1859045,
    'outdoor_day2': 1506119776.35389,
    'indoor_flying1': 1504645177.4228582,
    'outdoor_night1': 1504915781.1431518,
}


def test_mvsec_info_matches_reference_artifact():
    info = read_info(REPO / 'data' / 'info' / 'mvsec.hdf5')
    assert len(info) == 10
    for name, start in REFERENCE_START_TIMES.items():
        assert info[name] == pytest.approx(start, abs=0), name
