"""End-to-end CLI integration: train_flownet.py main() with resume.

Exercises the full composition root — arg parsing, provenance write/check,
model init, optimizer/schedule, loaders over the fixture data, hooks,
checkpointing — and verifies that a second invocation resumes from the
checkpoint (step, samples_passed) instead of restarting.
"""
import os
from pathlib import Path

import pytest

from tests.helpers import data_path

REPO = Path(__file__).resolve().parents[2]


@pytest.fixture
def mvsec_layout(tmp_path):
    """Fixture data arranged as the expected MVSEC split directories."""
    root = tmp_path / 'mvsec'
    root.mkdir()
    (root / 'outdoor_day2').symlink_to(data_path)
    (root / 'outdoor_day1').symlink_to(data_path)
    return root


def run_cli(tmp_path, mvsec_layout, extra=()):
    import train_flownet
    model_dir = tmp_path / 'model'
    argv = ['-m', str(model_dir),
            '--flownet_path', str(REPO / 'DummyFlowNet'),
            '-d', 'cpu',
            '-bs', '2', '-mbs', '2',
            '-ne', '2',
            '--num_workers', '0',
            '--height', '64', '--width', '64',
            '-cl', '1',
            '--optimizer', 'ADAM',
            '--checkpointing_interval', '1',
            '--permanent_interval', '1',
            '-vp', '1',
            '--event-capacity', '4096',
            ] + list(extra)
    os.environ['DVS_DATA_PATH'] = str(mvsec_layout)
    try:
        train_flownet.main(argv)
    finally:
        os.environ.pop('DVS_DATA_PATH', None)
    return model_dir


def test_train_cli_end_to_end(tmp_path, mvsec_layout):
    model_dir = run_cli(tmp_path, mvsec_layout)
    # provenance file written
    assert (model_dir / 'parameters').is_file()
    # checkpoints exist, including the final step
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    steps = ser.list_known_steps()
    assert 2 in steps
    # logs flushed
    assert any((model_dir / 'log').glob('events.out.tfevents.*'))
    # checkpoint carries samples_passed
    state = ser.read_state_dict(2)
    assert int(state['samples_passed']) == 4


def test_train_cli_resumes(tmp_path, mvsec_layout):
    run_cli(tmp_path, mvsec_layout)
    # second run with a higher step budget resumes from step 2
    model_dir = run_cli(tmp_path, mvsec_layout, extra=[])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    state = ser.read_state_dict(max(ser.list_known_steps()))
    # resumed run loaded step 2 and had nothing left to do:
    # samples_passed unchanged
    assert int(state['samples_passed']) == 4


def test_train_cli_mesh(tmp_path, mvsec_layout):
    """Data-parallel CLI training over a 2-device mesh."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--mesh', 'data:2'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()


def test_train_cli_mesh_event_axis(tmp_path, mvsec_layout):
    """CLI training over a 2-D data x event mesh (event-axis sharding)."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--mesh', 'data:2,event:2'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()


def test_train_cli_mesh_ev_images(tmp_path, mvsec_layout):
    """--mesh x --ev_images (round-4 lift): dense event-image batches
    shard on the sample axis through the CLI composition root."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--mesh', 'data:2', '--ev_images'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()


def test_train_cli_mesh_dynamic_sample_length(tmp_path, mvsec_layout):
    """--mesh x --dynamic-sample-length (round-4 lift): the uniform-slot
    layout happens BEFORE the shard split so per-shard timestamp counts
    stay static."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--mesh', 'data:2',
                               '--dynamic-sample-length',
                               '--min-sequence-length', '1',
                               '--max-sequence-length', '3'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()


def test_train_cli_dynamic_sample_length(tmp_path, mvsec_layout):
    """--dynamic-sample-length trains end-to-end (uniform-slot layout
    through train(), validate() and the hooks)."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--dynamic-sample-length',
                               '--min-sequence-length', '1',
                               '--max-sequence-length', '3'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()


def test_train_cli_guards_argument_change(tmp_path, mvsec_layout):
    run_cli(tmp_path, mvsec_layout)
    with pytest.raises(AssertionError, match='argument'):
        run_cli(tmp_path, mvsec_layout, extra=['-lr', '0.9'])
    # explicit override allows it
    run_cli(tmp_path, mvsec_layout,
            extra=['-lr', '0.9', '--allow-arguments-change'])


def test_train_cli_auto_event_capacity(tmp_path, mvsec_layout):
    """--event-capacity auto: sized from the preprocessed stream, recorded
    as a concrete value in provenance, and stable across a resume that
    passes 'auto' again."""
    import yaml

    from tests.dataset.test_preprocessed import write_shards
    shards, _ = write_shards(tmp_path, samples_per_file=4, num_files=2)
    extra = ['--preprocessed-dataset-path', str(shards),
             '--event-capacity', 'auto']
    model_dir = run_cli(tmp_path, mvsec_layout, extra=extra)
    from dvs_of_training_framework_tpu.data.preprocessed import \
        max_batch_events
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    assert 2 in Serializer(model_dir).list_known_steps()
    recorded = yaml.safe_load((model_dir / 'parameters').read_text())
    cap = recorded['arguments']['event_capacity']
    worst = max_batch_events(shards, 2)
    assert isinstance(cap, int) and worst <= cap < worst + 1024
    # resume with 'auto' resolves to the same value: provenance gate holds
    run_cli(tmp_path, mvsec_layout, extra=extra)

def test_train_cli_validation_window_opt_in(tmp_path, mvsec_layout):
    """--validation-window K runs the windowed validation path end-to-end
    (explicit opt-in; the default stays per-batch, see PERFORMANCE.md
    'Windowed validation: measured closure')."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--validation-window', '2',
                               '--device-queue-window', '2'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    assert 2 in Serializer(model_dir).list_known_steps()


def test_train_cli_pooled_event_wire(tmp_path, mvsec_layout):
    """--wire-events pooled trains end-to-end through the device queue
    (window event pool on the wire) and checkpoints normally."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--wire-events', 'pooled',
                               '--device-queue-window', '2'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()
    state = ser.read_state_dict(2)
    assert int(state['samples_passed']) == 4


def test_train_cli_pooled_wire_mesh(tmp_path, mvsec_layout):
    """--wire-events pooled x --mesh (round-4 lift): the window event
    pool is built per shard cell and sharded over the mesh's leading
    axes by the mesh place_window."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--wire-events', 'pooled',
                               '--device-queue-window', '2',
                               '--mesh', 'data:2'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()
    state = ser.read_state_dict(2)
    assert int(state['samples_passed']) == 4


def test_train_cli_u16_timestamp_wire(tmp_path, mvsec_layout):
    """--wire-timestamps u16 trains end-to-end through the device queue
    (quantized event-timestamp uploads) and checkpoints normally."""
    model_dir = run_cli(tmp_path, mvsec_layout,
                        extra=['--wire-timestamps', 'u16',
                               '--device-queue-window', '2'])
    from dvs_of_training_framework_tpu.training.serializer import Serializer
    ser = Serializer(model_dir)
    assert 2 in ser.list_known_steps()
    state = ser.read_state_dict(2)
    assert int(state['samples_passed']) == 4
