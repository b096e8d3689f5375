"""Dependency-free tfevents writer (utils/tensorboard.py).

Stands in for the reference's TensorboardX scalars + histograms
(/root/reference/main.py:315-327).  The reader verifies TFRecord crc32c
framing, so a round-trip exercises the full encode path bit-for-bit.
"""

import glob
import os

import numpy as np
import pytest

from flownet2_tpu.utils.tensorboard import (SummaryWriter, crc32c,
                                            masked_crc32c, read_events)


def test_crc32c_known_vectors():
    # RFC 3720 B.4 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # mask is the TFRecord rotate+offset
    assert masked_crc32c(b"123456789") == (
        (((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def test_scalar_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, step=1)
    w.add_scalars({"loss": 0.25, "epe": 3.0}, step=2)
    w.close()
    events = read_events(w.path)
    # first record is the brain.Event:2 version stamp
    assert events[0] == (0, {})
    assert events[1][0] == 1 and events[1][1]["loss"] == pytest.approx(1.5)
    step, vals = events[2]
    assert step == 2
    assert vals["loss"] == pytest.approx(0.25)
    assert vals["epe"] == pytest.approx(3.0)


def test_histogram_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    values = rng.randn(1000).astype(np.float32)
    w = SummaryWriter(str(tmp_path))
    w.add_histogram("params/conv1/kernel", values, step=7)
    w.close()
    step, vals = read_events(w.path)[1]
    h = vals["params/conv1/kernel"]
    assert step == 7
    assert h["num"] == pytest.approx(1000)
    assert h["min"] == pytest.approx(values.min(), abs=1e-6)
    assert h["max"] == pytest.approx(values.max(), abs=1e-6)
    assert h["sum"] == pytest.approx(float(values.sum()), rel=1e-5)
    assert sum(h["bucket"]) == pytest.approx(1000)
    assert len(h["bucket_limit"]) == len(h["bucket"]) == 30


def test_filename_convention(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.close()
    found = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert found == [w.path]


def test_tensorboard_package_can_read(tmp_path):
    """If a real tensorboard is importable, cross-validate the encoding."""
    tbrecord = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("x", 2.0, step=3)
    w.close()
    loader = tbrecord.EventFileLoader(w.path)
    got = [e for e in loader.Load() if e.step == 3 and e.summary.value]
    assert len(got) == 1
    v = got[0].summary.value[0]
    assert v.tag == "x"
    # tensorboard's data_compat upgrades simple_value to a DT_FLOAT tensor
    val = v.simple_value or v.tensor.float_val[0]
    assert val == pytest.approx(2.0)
