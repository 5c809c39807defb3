"""TensorBoard event codec: round-trip, manual flush, fix_events repair."""
from pathlib import Path
import sys

import pytest

from dvs_of_training_framework_tpu.utils.tb import (SummaryWriter,
                                                    read_events)

sys.path.append(str(Path(__file__).resolve().parents[2]))


def test_scalar_roundtrip(tmp_path):
    w = SummaryWriter(tmp_path)
    w.add_scalar('Train/loss', 0.5, 10)
    w.add_scalar('Train/loss', 0.25, 20)
    w.add_scalar('General/lr', 1e-3, 20)
    w.close()
    files = list(tmp_path.glob('events.out.tfevents.*'))
    assert len(files) == 1
    events = read_events(files[0])
    scalars = [(e['step'], e['scalars']) for e in events if e['scalars']]
    assert scalars == [(10, {'Train/loss': pytest.approx(0.5)}),
                       (20, {'Train/loss': pytest.approx(0.25)}),
                       (20, {'General/lr': pytest.approx(1e-3)})]


def test_manual_flush_only(tmp_path):
    w = SummaryWriter(tmp_path)
    w.add_scalar('x', 1.0, 1)
    files = list(tmp_path.glob('events.out.tfevents.*'))
    # nothing on disk before flush
    assert not files or files[0].stat().st_size == 0
    w.flush()
    files = list(tmp_path.glob('events.out.tfevents.*'))
    assert files and files[0].stat().st_size > 0
    w.close()


def test_official_proto_can_parse_our_records(tmp_path):
    """Cross-check the wire format against tensorboard's Event proto."""
    event_pb2 = pytest.importorskip('tensorboard.compat.proto.event_pb2')
    from dvs_of_training_framework_tpu.utils.tb import read_records
    w = SummaryWriter(tmp_path)
    w.add_scalar('parity/check', 3.5, 7)
    w.close()
    f = next(iter(tmp_path.glob('events.out.tfevents.*')))
    events = []
    for rec in read_records(f):
        e = event_pb2.Event()
        e.ParseFromString(rec)
        events.append(e)
    assert events[0].file_version == 'brain.Event:2'
    scalar = events[1]
    assert scalar.step == 7
    value = scalar.summary.value[0]
    assert value.tag == 'parity/check'
    assert value.simple_value == pytest.approx(3.5)


def test_fix_events_drops_restart_overlap(tmp_path):
    from scripts.fix_events import fix_file
    w = SummaryWriter(tmp_path)
    for step in (10, 20, 30, 40):
        w.add_scalar('loss', float(step), step)
    # simulated restart from step 20: steps 30/40 are stale
    for step in (20, 30, 50):
        w.add_scalar('loss', float(step) + 0.5, step)
    w.close()
    f = next(iter(tmp_path.glob('events.out.tfevents.*')))
    fix_file(f)
    events = [e for e in read_events(f) if e['scalars']]
    steps = [e['step'] for e in events]
    values = [e['scalars']['loss'] for e in events]
    assert steps == [10, 20, 30, 50]
    # the post-restart values win for replayed steps
    assert values == [pytest.approx(10.0), pytest.approx(20.5),
                      pytest.approx(30.5), pytest.approx(50.5)]
